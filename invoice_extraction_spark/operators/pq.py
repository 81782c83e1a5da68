"""Product quantization (PQ): embedding compression + ADC nearest-neighbor.

At 100 TB, the embedding column is the storage problem: 10^12 vectors ×
64 float32 = 256 TB. PQ (Jégou et al. 2011) stores each vector as M small
codes — here M=8 subvectors × K=16 centroids = 8 nibbles (4 bytes packed;
64× compression) — and answers nearest-neighbor queries on the CODES via
asymmetric distance computation (ADC): the query stays exact, each code
looks up a precomputed distance in a 16-entry table per subvector.

Spark-first shape, mirroring the frozen-IVF pattern
(`operators/ivf_centroids.py`):

  fit    : seeded driver-side k-means per subvector on a hash-sample
           (codebooks = M×K×(D/M) floats ≈ 4 KB — a literal, not data);
  encode : pure Column program — per subvector, argmin over K literal
           centroids (JVM-side, codegen'd; the codes column is what you
           persist, the float column is what you drop);
  search : ADC — per subvector a 16-float literal LUT from the query,
           distance = sum of LUT lookups, TakeOrderedAndProject top-k.
           Map-only: no join, no shuffle, codes never leave their
           partitions.

Compose with IVF for the standard IVF-PQ layout: IVF prunes to a cell,
PQ ranks within it.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M = 8  # subvectors
DEFAULT_K = 16  # centroids per subvector (4-bit codes)


def fit_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    seed: int = 7,
    sample_fraction: float = 0.25,
    iters: int = 10,
) -> list[list[list[float]]]:
    """Seeded k-means per subvector on a deterministic hash-sample —
    returns ``codebooks[m][k][dim/m]`` ready to freeze as literals (the
    IVF sampled-fit recipe: codebook statistics converge on a sample, so
    fit cost is O(sample), not O(corpus))."""
    import numpy as np

    bucket = F.pmod(F.xxhash64(F.col(vec_col).cast("string"), F.lit(seed)), F.lit(1000))
    sample = (
        df.filter(bucket < int(sample_fraction * 1000)).select(vec_col).toPandas()
    )
    X = np.array(sample[vec_col].tolist(), dtype=np.float64)
    d_sub = dim // m
    rng = random.Random(seed)
    books: list[list[list[float]]] = []
    for mi in range(m):
        S = X[:, mi * d_sub : (mi + 1) * d_sub]
        idx = rng.sample(range(len(S)), k)
        C = S[idx].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for ci in range(k):
                members = S[assign == ci]
                if len(members):
                    C[ci] = members.mean(axis=0)
        books.append([[round(float(v), 6) for v in row] for row in C])
    return books


def _sub_dist(vec: Column, mi: int, centroid: list[float], d_sub: int) -> Column:
    """Squared L2 between subvector mi of ``vec`` and a literal centroid."""
    base = mi * d_sub
    return sum(
        (F.try_element_at(vec, F.lit(base + j + 1)).cast("double") - F.lit(centroid[j])) ** 2
        for j in range(d_sub)
    )


def pq_encode(
    vec: Column | str, codebooks: list[list[list[float]]]
) -> Column:
    """Codes column (array<int>, length M): per subvector, the argmin
    centroid index (ties -> lowest index, deterministic). Pure Column —
    the encode pass is map-only and stays in codegen."""
    c = F.col(vec) if isinstance(vec, str) else vec
    d_sub = len(codebooks[0][0])
    codes = []
    for mi, book in enumerate(codebooks):
        dists = F.array(*[_sub_dist(c, mi, cent, d_sub) for cent in book])
        codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    return F.array(*codes)


def pq_adc_distance(
    codes: Column | str, query: list[float], codebooks: list[list[list[float]]]
) -> Column:
    """ADC distance estimate for a literal query: per subvector a K-entry
    literal LUT of exact query↔centroid distances, indexed by the code."""
    cc = F.col(codes) if isinstance(codes, str) else codes
    d_sub = len(codebooks[0][0])
    total = F.lit(0.0)
    for mi, book in enumerate(codebooks):
        q_sub = query[mi * d_sub : (mi + 1) * d_sub]
        lut = F.array(
            *[
                F.lit(round(sum((q_sub[j] - cent[j]) ** 2 for j in range(d_sub)), 8))
                for cent in book
            ]
        )
        # cast: tolerate array<bigint> code columns (element_at wants INT)
        total = total + F.try_element_at(
            lut, (F.try_element_at(cc, F.lit(mi + 1)) + 1).cast("int")
        )
    return total


def ivf_pq_index(
    df: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The persisted IVF-PQ index: (id, cell, pq_codes) — ~5 bytes of
    payload per vector instead of 256. Build once per corpus snapshot
    (map-only), write ``partition_by=["cell"]`` so probes become partition
    pruning: a query touching n_probe of n_cells cells READS n_probe/n_cells
    of the index, the physical reason IVF-PQ is the web-scale layout."""
    from .similarity import ivf_assign_expr

    c = F.col(vec_col)
    return df.select(
        id_col,
        ivf_assign_expr(c, centroids).alias("cell"),
        pq_encode(c, codebooks).alias("pq_codes"),
    )


def ivf_pq_topk(
    index: DataFrame,
    query: list[float],
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Standard IVF-PQ search: probe the n_probe cells nearest the query
    (literal cell ids -> an ``isin`` filter the scan can push down /
    partition-prune), ADC-rank the surviving codes. Everything after the
    pruned scan is map + TakeOrderedAndProject."""
    from .similarity import ivf_probe_cells

    cells = ivf_probe_cells(query, centroids, n_probe)
    return pq_topk(
        index.filter(F.col("cell").isin(cells)),
        query,
        codebooks,
        k=k,
        id_col=id_col,
    )


def pq_topk(
    df: DataFrame,
    query: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    codes_col: str = "pq_codes",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by ADC distance over a pre-encoded codes column — map +
    TakeOrderedAndProject, nothing shuffles."""
    return (
        df.select(
            id_col,
            F.round(pq_adc_distance(codes_col, query, codebooks), 6).alias("adc_dist"),
        )
        .orderBy(F.asc_nulls_last("adc_dist"), F.asc(id_col))
        .limit(k)
    )
