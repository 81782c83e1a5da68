"""Block-level feature export + tag-path boilerplate classifier.

The north rule calls for "tag-path feature vectors for boilerplate
classification": production content extractors (Boilerpipe's successors)
train a classifier over DOM-path + density features, using the rule-based
extractor's own decisions as distillation labels. This module provides the
Spark-native version of that loop:

1. ``extract_block_features`` — one row per DOM block (or PDF line) with
   the kernel's features (tag, tag_path, region, densities, the rule label
   ``is_content``): the classifier-training TABLE, exported straight from
   the same Arrow kernel the pipeline runs. At 100 TB this is a map-only
   stage (no shuffle): each page expands to ~30 block rows executor-side.

2. ``hashed_path_features`` — feature hashing of the tag-path: each path
   segment plus each adjacent-segment bigram hashed into ``n_buckets``
   (md5-based buckets — portable, so the DuckDB oracle computes identical
   vectors). Pure Column expression.

3. ``fit_path_nb_weights`` / ``path_nb_score`` — a Bernoulli Naive-Bayes
   log-odds model over the hashed buckets, trained by counting (fully
   deterministic — no SGD, no seed) with Laplace smoothing, applied as a
   literal-weights Column fold. The frozen-literal pattern mirrors the IVF
   quantizer (operators/ivf_centroids.py): fit once on a sample, embed the
   weights, score the world map-side with zero joins.

Why a classifier when the rule exists? The rule reads the whole block
(text, links); the path model scores STRUCTURE alone, so it can gate
blocks before text assembly, transfer to pages where density gates
misfire, and serve as the cheap first stage of a cascade. Distilling
rule → model is the standard bootstrapping step the reference's pseudo-
label loop (consensus.py:196-222) applies at document level; here it is
applied at block level.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.html_blocks import parse_blocks
from ..functions.pdf_text import parse_pdf_blocks

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("block_idx", T.IntegerType()),
        T.StructField("tag", T.StringType()),
        T.StructField("tag_path", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("link_density", T.DoubleType()),
        T.StructField("text_density", T.DoubleType()),
        T.StructField("is_content", T.BooleanType()),
        T.StructField("text", T.StringType()),
    ]
)

DEFAULT_BUCKETS = 256


def extract_block_features(df: DataFrame, include_text: bool = False) -> DataFrame:
    """Pages ``(url, html, ...)`` -> one row per block with kernel features.

    ``include_text=False`` (default) nulls the text column so the feature
    table ships no payload — structure + densities + label only, which is
    all the classifier needs and ~10x smaller on the wire.
    """
    cols = [c for c in ("url", "html") if c in df.columns]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in BLOCKS_SCHEMA.fields}
            for url, html in zip(pdf["url"], pdf["html"]):
                try:
                    if isinstance(html, (bytes, bytearray, memoryview)) and bytes(
                        html[:5]
                    ) == b"%PDF-":
                        blocks = parse_pdf_blocks(bytes(html))
                    else:
                        blocks = parse_blocks(html)
                except Exception:  # noqa: BLE001 — poison doc: zero block rows
                    continue
                for b in blocks:
                    out["url"].append(url)
                    out["block_idx"].append(b.idx)
                    out["tag"].append(b.tag)
                    out["tag_path"].append(b.tag_path)
                    out["region"].append(b.region)
                    out["n_chars"].append(b.n_chars)
                    out["n_tokens"].append(b.n_tokens)
                    out["link_density"].append(round(b.link_density, 4))
                    out["text_density"].append(round(b.text_density, 4))
                    out["is_content"].append(b.is_content)
                    out["text"].append(b.text if include_text else None)
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(gen, schema=BLOCKS_SCHEMA)


def _bucket(token: Column, n_buckets: int) -> Column:
    """md5-based feature bucket — portable across engines (same recipe as
    operators/sampling: first 8 hex chars as an int, mod n_buckets)."""
    return (
        F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long") % n_buckets
    ).cast("int")


def hashed_path_features(
    tag_path: Column | str, n_buckets: int = DEFAULT_BUCKETS
) -> Column:
    """Sorted distinct bucket indices for a tag path: one feature per path
    segment ("div") and per adjacent bigram ("div>ul") — the bigrams carry
    the structural context (a ``li`` under ``nav`` is boilerplate, under
    ``article`` it is content)."""
    c = F.col(tag_path) if isinstance(tag_path, str) else tag_path
    segs = F.filter(F.split(c, "/"), lambda s: s != "")
    bigrams = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(segs) - 1, F.lit(1))),
            lambda i: F.when(
                F.try_element_at(segs, i + 1).isNotNull(),
                F.concat_ws(">", F.try_element_at(segs, i), F.try_element_at(segs, i + 1)),
            ),
        ),
        lambda s: s.isNotNull(),
    )
    all_toks = F.concat(segs, bigrams)
    return F.array_sort(
        F.array_distinct(F.transform(all_toks, lambda t: _bucket(t, n_buckets)))
    )


def fit_path_nb_weights(
    blocks: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> tuple[list[float], float]:
    """Bernoulli NB log-odds per bucket + class prior, trained by COUNTING
    (deterministic, one aggregation pass — no iterations, no RNG):

        w[b]  = ln(P(b | content) / P(b | boiler)),  Laplace-``alpha``
        prior = ln(n_content / n_boiler)

    Returns plain Python (weights list, prior) ready to freeze as literals.
    Fit on a hash-sample at scale — bucket frequencies converge like any
    count statistic (same argument as the LM/IVF sampled fits).
    """
    exploded = blocks.select(
        F.col("is_content").cast("int").alias("y"),
        F.explode(hashed_path_features(F.col("tag_path"), n_buckets)).alias("b"),
    )
    per_bucket = (
        exploded.groupBy("b")
        .agg(
            F.sum("y").alias("n_pos"),
            F.sum(1 - F.col("y")).alias("n_neg"),
        )
        .collect()
    )
    totals = blocks.agg(
        F.sum(F.col("is_content").cast("long")).alias("np"),
        F.sum((~F.col("is_content")).cast("long")).alias("nn"),
    ).collect()[0]
    n_pos, n_neg = int(totals["np"]), int(totals["nn"])
    weights = [0.0] * n_buckets
    for r in per_bucket:
        p = (int(r["n_pos"]) + alpha) / (n_pos + 2 * alpha)
        q = (int(r["n_neg"]) + alpha) / (n_neg + 2 * alpha)
        weights[int(r["b"])] = round(math.log(p / q), 6)
    prior = round(math.log((n_pos + alpha) / (n_neg + alpha)), 6)
    return weights, prior


def path_nb_score(
    tag_path: Column | str,
    weights: list[float],
    prior: float,
    n_buckets: int | None = None,
) -> Column:
    """Literal-weights scoring: sum of the block's bucket weights + prior,
    rounded to 4. Positive = structurally content-like. Map-side only —
    the weights ride the plan as a literal array, no join, no shuffle
    (same deployment shape as the frozen IVF centroids)."""
    n = n_buckets or len(weights)
    wlit = F.array(*[F.lit(float(w)) for w in weights])
    feats = hashed_path_features(tag_path, n)
    return F.round(
        F.aggregate(
            feats,
            F.lit(float(prior)),
            lambda acc, b: acc + F.try_element_at(wlit, b + 1),
        ),
        4,
    )
