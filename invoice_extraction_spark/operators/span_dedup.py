"""Exact substring (span) deduplication — the Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better") family:
remove every VERBATIM repeated span of >= L tokens from the corpus while
keeping exactly one canonical occurrence.

Where the siblings stop short: ``line_dedup`` removes repeated LINES
(chrome at line granularity), ``cross_doc_contamination`` only SCORES
n-gram overlap. This operator rewrites text at token-span granularity —
the published remedy for train-set memorization inflation, which line
boundaries miss (boilerplate glued into paragraphs, quoted passages,
templated sentences).

Physical plan at 10^12 documents:
  1. roll L-token gram occurrences (id, pos, md5(gram))   -- map-side;
     O(total tokens) rows, but each is (long, int, 32-char hash) — the
     text itself NEVER enters this shuffle
  2. groupBy gram hash -> occurrence count + canonical     -- ONE shuffle
     occurrence (lexicographic min of a zero-padded        of hash keys
     "id:pos" key — portable to ANSI SQL for the oracle)
  3. join occurrences back, drop the canonical one         -- hash equi-
     -> per-occurrence cut intervals [pos, pos+L)          join, hash keys
  4. per-doc interval list -> cut tokens via ONE Arrow     -- the single
     kernel pass (merge intervals, drop covered tokens)    text shuffle (a
                                                           rewrite op's floor,
                                                           same as line_dedup)

Canonical-occurrence choice is the smallest (id, pos) — deterministic,
partition-independent, and exactly replicable in the DuckDB twin
(tests/test_span_dedup.py asserts hash parity for the intervals AND the
rewritten corpus). Overlapping duplicated grams union into one cut span;
a doc holding the canonical occurrence keeps it verbatim.

Tuning at scale: L is the memorization threshold (Lee et al. use 50 BPE
tokens; pass ``l`` accordingly for your tokenizer). ``min_count=2``
dedups any repeat, including within-document; raise it to only strip
heavily-templated spans. The hot-gram frame (step 2 output) is the
persistable artifact — an incremental pipeline unions new batches' gram
occurrences against it exactly like the LSH band index.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.parallelism import ensure_min_parallelism

DEFAULT_SPAN_TOKENS = 20


def _ckey(id_col, pos_col):
    """Zero-padded 'id:pos' — lexicographic min == numeric (id, pos) min,
    and identical in Spark and ANSI SQL (the oracle uses printf). 15
    digits covers 10^15 ids/positions; wider ids would break the
    padding-order equivalence silently, hence the margin."""
    return F.format_string("%015d:%015d", F.col(id_col), F.col(pos_col))


def gram_occurrences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    l: int = DEFAULT_SPAN_TOKENS,
) -> DataFrame:
    """(id, pos, gh) for every L-token gram occurrence (pos is 1-based).
    Docs shorter than L tokens contribute nothing — they cannot contain a
    span of length L. Column-only: concat_ws over a slice is a light
    per-element HOF (no hash loops inside the lambda; md5 runs post-
    explode in codegen)."""
    df = ensure_min_parallelism(df)
    toks = F.split(F.col(text_col), " ")
    n_grams = F.size(toks) - (l - 1)
    grams = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, l)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col).alias("id"), F.posexplode(grams).alias("p0", "g"))
        .select(
            "id",
            (F.col("p0") + 1).alias("pos"),  # posexplode is 0-based
            F.md5("g").alias("gh"),
        )
    )


def hot_grams(
    occ: DataFrame,
    min_count: int = 2,
) -> DataFrame:
    """(gh, n_occurrences, canonical 'id:pos' key) for grams occurring at
    least ``min_count`` times corpus-wide — the persistable duplicate-span
    index. One shuffle of hash keys."""
    return (
        occ.groupBy("gh")
        .agg(
            F.count("*").alias("n_occ"),
            F.min(_ckey("id", "pos")).alias("canon"),
        )
        .filter(F.col("n_occ") >= min_count)
    )


def duplicate_span_intervals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    l: int = DEFAULT_SPAN_TOKENS,
    min_count: int = 2,
    hot: DataFrame | None = None,
    occ: DataFrame | None = None,
) -> DataFrame:
    """Cut list: (id, start, end) token intervals ([start, end), 1-based)
    covering every NON-canonical occurrence of a duplicated L-gram. Pass a
    precomputed ``occ``/``hot`` to share passes with stats or an index."""
    occ = occ if occ is not None else gram_occurrences(df, text_col, id_col, l)
    hot = hot if hot is not None else hot_grams(occ, min_count)
    return (
        occ.join(hot, "gh")
        .filter(_ckey("id", "pos") != F.col("canon"))
        .select(
            "id",
            F.col("pos").alias("start"),
            (F.col("pos") + l).alias("end"),
        )
    )


_CUT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("n_tokens_removed", T.IntegerType()),
    ]
)


def _cut_spans_kernel(texts: pd.Series, spans: pd.Series) -> pd.DataFrame:
    """Merge a doc's cut intervals and drop the covered tokens — one linear
    pass per doc (Arrow batch; the per-row loop is why this is a kernel,
    not an interpreted HOF)."""
    out_t, out_n = [], []
    for text, iv in zip(texts, spans):
        if text is None:
            out_t.append(None)
            out_n.append(None)
            continue
        if iv is None or len(iv) == 0:
            out_t.append(text)
            out_n.append(0)
            continue
        toks = text.split(" ")
        merged: list[list[int]] = []
        for s, e in sorted((int(x["start"]), int(x["end"])) for x in iv):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        covered = set()
        for s, e in merged:
            covered.update(range(s, e))
        kept = [t for i, t in enumerate(toks, start=1) if i not in covered]
        out_t.append(" ".join(kept))
        out_n.append(len(toks) - len(kept))
    return pd.DataFrame({"text": out_t, "n_tokens_removed": out_n})


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    l: int = DEFAULT_SPAN_TOKENS,
    min_count: int = 2,
    intervals: DataFrame | None = None,
) -> DataFrame:
    """Rewrite ``text_col`` with every non-canonical duplicated span cut
    out; adds ``n_tokens_removed``. All other columns pass through. The
    interval list joins to the documents keyed by id — the one text
    shuffle a rewrite op cannot avoid."""
    iv = (
        intervals
        if intervals is not None
        else duplicate_span_intervals(df, text_col, id_col, l, min_count)
    )
    # collision-safe internal names: a caller's table may itself be keyed
    # "id" (or carry "_spans"), and an ambiguous join/drop would corrupt it
    per_doc = iv.groupBy(F.col("id").alias("_sd_id")).agg(
        F.collect_list(F.struct("start", "end")).alias("_sd_spans")
    )
    joined = ensure_min_parallelism(df).join(
        per_doc, F.col(id_col) == F.col("_sd_id"), "left"
    ).drop("_sd_id")
    cut = F.pandas_udf(_cut_spans_kernel, _CUT_SCHEMA)(
        F.col(text_col), F.col("_sd_spans")
    )
    return (
        joined.withColumn("_sd_cut", cut)
        .withColumn(text_col, F.col("_sd_cut.text"))
        .withColumn(
            "n_tokens_removed",
            F.coalesce(F.col("_sd_cut.n_tokens_removed"), F.lit(0)),
        )
        .drop("_sd_spans", "_sd_cut")
    )


def span_gram_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    l: int = DEFAULT_SPAN_TOKENS,
) -> DataFrame:
    """(gh, n_occ, canon) for EVERY gram of a corpus — the persistable
    span-dedup index (the band-index analog). O(distinct grams) hash rows;
    heavier than the LSH index (O(tokens) vs k rows per doc) but it is
    what exact incremental span dedup fundamentally requires: a new span
    duplicates history iff its gram hash is present at all."""
    return (
        gram_occurrences(df, text_col, id_col, l)
        .groupBy("gh")
        .agg(F.count("*").alias("n_occ"), F.min(_ckey("id", "pos")).alias("canon"))
    )


def remove_duplicate_spans_incremental(
    new_df: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    l: int = DEFAULT_SPAN_TOKENS,
    min_count: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Span-dedup a NEW batch against a persisted ``span_gram_index``
    WITHOUT touching historical text. Returns ``(rewritten_batch,
    index_delta)``; persist ``merge_gram_index(index, delta)`` for the
    next batch.

    Contract (same asymmetry as ``dedup_incremental``): history is
    immutable, so an indexed gram's canonical occurrence lives in history
    and every new occurrence of it is cut ONCE the merged count (index
    ``n_occ`` + this batch's occurrences) reaches ``min_count`` — the same
    corpus-wide threshold ``remove_duplicate_spans`` applies over the
    concatenated corpus (ADVICE r4: presence-only cutting diverged for
    min_count > 2, cutting spans below the corpus-wide threshold). Grams
    new to this batch dedup among themselves (batch-canonical survives).
    Process each batch exactly once (the atomic-commit pipeline's run_id
    bookkeeping guarantees that); replaying a batch against an index
    already containing its delta would cut its canonical occurrences too.
    """
    occ = gram_occurrences(new_df, text_col, id_col, l)
    # the probe only needs gram hashes + counts — shuffle hash keys, never
    # text. Threshold on the MERGED count so batched == concatenated.
    presence = index.select("gh")
    batch_counts = occ.groupBy("gh").agg(F.count("*").alias("_b_n"))
    hist = (
        index.select("gh", "n_occ")
        .join(batch_counts, "gh")
        .filter(F.col("n_occ") + F.col("_b_n") >= min_count)
        .select("gh")
    )
    hist_hits = occ.join(hist, "gh", "left_semi").select(
        "id", F.col("pos").alias("start"), (F.col("pos") + l).alias("end")
    )
    # fresh = never seen in history AT ALL (presence, not threshold): an
    # indexed below-threshold gram must wait for the merged count — its
    # canonical lives in history, so the batch-local fresh path would pick
    # the wrong survivor
    fresh_occ = occ.join(presence, "gh", "left_anti")
    fresh_iv = duplicate_span_intervals(
        new_df, text_col, id_col, l, min_count, occ=fresh_occ
    )
    iv = hist_hits.unionByName(fresh_iv)
    out = remove_duplicate_spans(
        new_df, text_col, id_col, l, min_count, intervals=iv
    )
    delta = occ.groupBy("gh").agg(
        F.count("*").alias("n_occ"), F.min(_ckey("id", "pos")).alias("canon")
    )
    return out, delta


def merge_gram_index(index: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a batch delta into the index: counts add; the HISTORICAL
    canonical wins when present (first-seen, not global min — history is
    already committed and must stay the survivor)."""
    a = index.select("gh", F.col("n_occ").alias("_n_a"), F.col("canon").alias("_c_a"))
    b = delta.select("gh", F.col("n_occ").alias("_n_b"), F.col("canon").alias("_c_b"))
    return a.join(b, "gh", "full_outer").select(
        "gh",
        (F.coalesce("_n_a", F.lit(0)) + F.coalesce("_n_b", F.lit(0))).alias("n_occ"),
        F.coalesce("_c_a", "_c_b").alias("canon"),
    )


def span_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    l: int = DEFAULT_SPAN_TOKENS,
    min_count: int = 2,
) -> DataFrame:
    """Observability ('no silent caps'): duplicated grams, removable
    occurrences, and docs touched — log next to any rewrite."""
    occ = gram_occurrences(df, text_col, id_col, l)
    hot = hot_grams(occ, min_count)
    iv = duplicate_span_intervals(df, text_col, id_col, l, min_count, hot=hot, occ=occ)
    a = hot.agg(
        F.count("*").alias("n_hot_grams"),
        F.coalesce(F.sum("n_occ"), F.lit(0)).cast("bigint").alias("n_hot_occurrences"),
    )
    b = iv.agg(
        F.count("*").alias("n_cut_intervals"),
        F.countDistinct("id").alias("n_docs_touched"),
    )
    return a.withColumn("_k", F.lit(1)).join(b.withColumn("_k", F.lit(1)), "_k").drop("_k")
