"""Synthesize an sf1 test-data directory (10x sf0.1) for the scale
rehearsal (VERDICT r3 'Next round' #3) — /root/testdata is read-only and
ships no sf1, so we upscale sf0.1 deterministically (seeded, no wall-clock)
into a local dir and run the SAME 50-query oracle gate + bench against it.

Upscale = 10 striped copies with referential integrity preserved:
  - region/nation: identity (dimension enums — key sets must not change)
  - customer/supplier/part/orders/lineitem/events: copy k shifts every key
    by k * stride (stride = a round number above the sf0.1 max), so joins
    land exactly as in copy 0; names get a copy suffix so string ops see
    fresh values
  - documents: copy k>0 word-shuffles each text with Random((doc_id, k)) —
    token/lang statistics survive, 5-gram shingles do not, so the copies
    are NOT near-duplicates of each other and dedup queries keep the
    original (copy-0) pair structure at 10x corpus size
  - embeddings: copy k>0 adds +-1% seeded uniform noise per dimension —
    new vectors in the same distribution, safe under the frozen IVF/PQ
    literals

Everything is pyarrow/pandas/numpy — no Spark, so generation can't pollute
a concurrent benchmark. Output defaults to /tmp/sf1. A copies argument
scales further (100 -> sf10, the round-5 O(corpus)-state probe); copies
are streamed to the parquet writer one at a time so peak memory is one
copy regardless of the target scale.

    python scripts/make_sf1.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10
STRIDES = {
    "c_custkey": 20_000,
    "s_suppkey": 2_000,
    "p_partkey": 30_000,
    "o_orderkey": 1_000_000,
    "l_orderkey": 1_000_000,
    "l_partkey": 30_000,
    "l_suppkey": 2_000,
    "event_id": 200_000,
    "user_id": 100_000,
    "doc_id": 10_000,
    "vec_id": 10_000,
}
SUFFIX_COLS = {"c_name", "s_name", "p_name"}  # fresh strings per copy


def _read(table: str) -> pd.DataFrame:
    return pq.read_table(os.path.join(SRC, f"{table}.parquet")).to_pandas()


def _write_copies(copies_iter, n_copies, out_dir, table, schema) -> None:
    """Stream copies to one parquet file. >=16 row groups per file: Spark
    assigns file SPLITS to tasks by row-group midpoint, so a single jumbo
    row group serializes the whole scan onto one task no matter how many
    byte-range splits exist (observed: a corpus-wide Arrow-kernel query
    ran 1-task-slow on a 1-RG sf1 file)."""
    writer = None
    try:
        for df in copies_iter:
            t = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
            if writer is None:
                rg = max(len(df) * n_copies // max(16, n_copies), 1024)
                writer = pq.ParquetWriter(
                    os.path.join(out_dir, f"{table}.parquet"), schema
                )
            writer.write_table(t, row_group_size=rg)
    finally:
        if writer is not None:
            writer.close()


def _upscale_keys(df: pd.DataFrame, k: int) -> pd.DataFrame:
    out = df.copy()
    for col, stride in STRIDES.items():
        if col in out.columns:
            out[col] = out[col] + k * stride
    if k:
        for col in SUFFIX_COLS & set(out.columns):
            out[col] = out[col] + f" c{k}"
    return out


def _shuffle_words(text: str, seed: str) -> str:
    words = text.split(" ")
    random.Random(seed).shuffle(words)
    return " ".join(words)


def main(out_dir: str = "/tmp/sf1", copies: int = COPIES) -> None:
    os.makedirs(out_dir, exist_ok=True)

    for table in ("region", "nation"):
        src = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
        pq.write_table(src, os.path.join(out_dir, f"{table}.parquet"))
        print(f"{table}: copied ({src.num_rows} rows)")

    for table in ("customer", "supplier", "part", "orders", "lineitem", "events"):
        schema = pq.read_schema(os.path.join(SRC, f"{table}.parquet"))
        base = _read(table)
        _write_copies(
            (_upscale_keys(base, k) for k in range(copies)),
            copies, out_dir, table, schema,
        )
        print(f"{table}: {len(base)} -> {len(base) * copies} rows")

    # documents: shuffle words per copy (k=0 stays verbatim)
    schema = pq.read_schema(os.path.join(SRC, "documents.parquet"))
    base = _read("documents")

    def doc_copies():
        for k in range(copies):
            c = base.copy()
            c["doc_id"] = c["doc_id"] + k * STRIDES["doc_id"]
            if k:
                c["text"] = [
                    _shuffle_words(t, f"{int(d)}|{k}")
                    for d, t in zip(c["doc_id"], c["text"])
                ]
                c["n_chars"] = [len(t) for t in c["text"]]
            yield c

    _write_copies(doc_copies(), copies, out_dir, "documents", schema)
    print(f"documents: {len(base)} -> {len(base) * copies} rows")

    # embeddings: seeded +-1% noise per copy (k=0 verbatim)
    schema = pq.read_schema(os.path.join(SRC, "embeddings.parquet"))
    base = _read("embeddings")
    dim = len(base["embedding"].iloc[0])

    def emb_copies():
        for k in range(copies):
            c = base.copy()
            c["vec_id"] = c["vec_id"] + k * STRIDES["vec_id"]
            if k:
                rng = np.random.RandomState(k)
                noise = rng.uniform(-0.01, 0.01, size=(len(c), dim)).astype(
                    np.float32
                )
                mat = np.stack(c["embedding"].to_numpy()) + noise
                c["embedding"] = [row for row in mat]
            yield c

    _write_copies(emb_copies(), copies, out_dir, "embeddings", schema)
    print(f"embeddings: {len(base)} -> {len(base) * copies} rows")
    print(f"scaled data ({copies} copies) ready at {out_dir}")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1",
        int(sys.argv[2]) if len(sys.argv) > 2 else COPIES,
    )
