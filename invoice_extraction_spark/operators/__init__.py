"""Spark DataFrame operators: the engine's public dataflow surface.

One import gets a user everything the reference pipeline did plus the
training-data-pipeline extras::

    from invoice_extraction_spark.operators import (
        extract_pages, validate_sellers, pseudo_labels,   # extraction
        dedup_exact, dedup_near, dedup_incremental,       # dedup
        brute_force_topk, lsh_topk, ivf_topk,             # similarity
        categorize_errors, save_error_report,             # error analytics
        hash_quota_sample, hash_split,                    # sampling
    )
"""

from .dedup import (  # noqa: F401
    band_index,
    cross_doc_contamination,
    dedup_exact,
    dedup_incremental,
    dedup_near,
    lsh_band_stats,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
)
from .errors import (  # noqa: F401
    categorize_errors,
    confidence_vs_errors,
    error_distribution,
    error_severity_rollup,
    field_success_summary,
    save_error_report,
)
from .extract import extract_pages, pseudo_labels, salted_repartition  # noqa: F401
from .fuzzy import fuzzy_join, validate_sellers  # noqa: F401
from .multimodal import extract_features, frame_sample, media_stats  # noqa: F401
from .sampling import hash_quota_sample, hash_split  # noqa: F401
from .similarity import (  # noqa: F401
    brute_force_topk,
    embedding_topk_pairs,
    fit_ivf_centroids,
    ivf_topk,
    lsh_topk,
    pairwise_topk_per_label,
)
