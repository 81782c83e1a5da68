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
    per_doc = iv.groupBy("id").agg(
        F.collect_list(F.struct("start", "end")).alias("_spans")
    )
    joined = ensure_min_parallelism(df).join(
        per_doc, F.col(id_col) == F.col("id"), "left"
    ).drop("id")
    cut = F.pandas_udf(_cut_spans_kernel, _CUT_SCHEMA)(
        F.col(text_col), F.col("_spans")
    )
    return (
        joined.withColumn("_cut", cut)
        .withColumn(text_col, F.col("_cut.text"))
        .withColumn("n_tokens_removed", F.coalesce(F.col("_cut.n_tokens_removed"), F.lit(0)))
        .drop("_spans", "_cut")
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
