"""Spark DataFrame operators: the engine's public dataflow surface.

One import gets a user everything the reference pipeline did plus the
training-data-pipeline extras::

    from invoice_extraction_spark.operators import (
        extract_pages, validate_sellers, pseudo_labels,   # extraction
        dedup_exact, dedup_near, dedup_incremental,       # dedup
        brute_force_topk, lsh_topk, ivf_topk,             # similarity
        categorize_errors, save_error_report,             # error analytics
        hash_quota_sample, hash_split, mixture_sample,    # sampling / mixture
        fit_unigram_lm, lm_quality,                       # LM quality scoring
        pack_documents, pack_stats,                       # sequence packing
        decontaminate, benchmark_contamination,           # eval decontamination
        dedup_lines, line_frequencies,                    # C4 line dedup
        extract_block_features, path_nb_score,            # block classifier
        distinct_sketches, merge_distinct_estimate,       # sketch rollups
        pq_encode, pq_topk, fit_pq_codebooks,             # product quantization
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
from .blocks import (  # noqa: F401
    extract_block_features,
    fit_path_nb_weights,
    hashed_path_features,
    path_nb_score,
)
from .decontam import (  # noqa: F401
    benchmark_contamination,
    benchmark_ngram_index,
    decontaminate,
)
from .extract import extract_pages, pseudo_labels, salted_repartition  # noqa: F401
from .fuzzy import fuzzy_join, validate_sellers  # noqa: F401
from .line_dedup import dedup_lines, line_frequencies  # noqa: F401
from .lm_score import fit_unigram_lm, lm_quality, lm_quality_buckets  # noqa: F401
from .multimodal import extract_features, frame_sample, media_stats  # noqa: F401
from .packing import pack_documents, pack_stats, packing_summary  # noqa: F401
from .pq import (  # noqa: F401
    fit_pq_codebooks,
    ivf_pq_index,
    ivf_pq_topk,
    pq_adc_distance,
    pq_encode,
    pq_topk,
)
from .sampling import hash_quota_sample, hash_split, mixture_sample  # noqa: F401
from .range_join import interval_join  # noqa: F401
from .sketches import (  # noqa: F401
    distinct_sketches,
    merge_distinct_estimate,
    merge_quantile_estimate,
    quantile_sketches,
)
from .skew import key_skew_report, salted_join  # noqa: F401
from .zorder import z_value, zorder_layout  # noqa: F401
from .similarity import (  # noqa: F401
    brute_force_topk,
    embedding_topk_pairs,
    fit_ivf_centroids,
    ivf_topk,
    lsh_topk,
    pairwise_topk_per_label,
)
