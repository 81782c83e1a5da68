"""C4-style global line deduplication: corpus-wide removal of repeated lines.

C4 (Raffel et al. 2020, §2.2) discards any three-sentence span occurring
more than once in the corpus; practical re-implementations (e.g. what most
open pipelines run) drop LINES whose exact text appears in >= K documents —
navigation chrome, cookie banners, legal footers survive per-document
boilerplate stripping because each page carries them once; only the corpus
view exposes them.

Unit of dedup here: a LINE of ``extracted_text`` (the extraction kernel
emits one line per content block, so lines are block-granular spans).

Physical plan at 10^12 docs:
  1. explode lines keeping (doc, line_idx)          -- map-side
  2. groupBy md5(line) -> distinct-doc counts        -- shuffle of 32-char
     hashes + counts ONLY (never the text)
  3. broadcast-or-shuffle join counts back, filter   -- heavy lines are few:
     the count frame after `HAVING nd >= K` is tiny, so it broadcasts
  4. re-assemble per doc, original line order        -- ONE shuffle of the
     surviving text keyed by doc id (a rewrite op must move text once;
     this is the floor)

Keeping first-occurrence (true C4) needs a global "who saw it first" order;
the published pipelines drop ALL occurrences of super-threshold lines
(simpler, unbiased, and removes the chrome everywhere) — that is the
semantics here, with the threshold K to protect legitimately repeated
short quotes (K defaults to 3: a line in >= 3 distinct docs is chrome).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.parallelism import ensure_min_parallelism

DEFAULT_MIN_DOCS = 3


def line_frequencies(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = DEFAULT_MIN_DOCS,
) -> DataFrame:
    """md5(line) -> distinct-doc count, for lines at/above the threshold —
    the (small) blocklist frame. Persist it once per corpus snapshot; it is
    the reusable artifact the rewrite pass and any audit query share."""
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).filter(F.col("line") != "")
    return (
        lines.groupBy(F.md5("line").alias("lh"))
        .agg(F.countDistinct("_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = DEFAULT_MIN_DOCS,
    frequencies: DataFrame | None = None,
) -> DataFrame:
    """Rewrite ``text_col``: drop every line appearing in >= ``min_docs``
    distinct documents corpus-wide. All other columns pass through; line
    order inside a document is preserved; docs whose lines are all chrome
    come back with empty text (callers typically follow with a length gate).

    ``frequencies`` accepts a precomputed/persisted ``line_frequencies``
    output so the counting pass is shared across jobs.
    """
    if frequencies is None:
        frequencies = line_frequencies(df, text_col, id_col, min_docs)
    df = ensure_min_parallelism(df)
    exploded = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_idx", "line"),
    ).withColumn("lh", F.md5("line"))
    # the blocklist is tiny after the HAVING filter -> broadcast anti-join
    kept = exploded.join(F.broadcast(frequencies.select("lh")), "lh", "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("line_idx"), F.col("line")))
                ),
                lambda s: s["line"],
            ),
        ).alias("_new_text")
    )
    return (
        df.join(rebuilt, df[id_col] == rebuilt["_id"], "left")
        .withColumn(text_col, F.coalesce("_new_text", F.lit("")))
        .drop("_id", "_new_text")
    )
