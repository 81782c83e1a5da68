"""Streaming embedding-dedup rehearsal at sf1: feed the 20k-vector
embeddings table (seeded structure: every base vector has 9 +-1% noisy
copies, true near-dups at cosine >= 0.99) as K sequential drops through
``run_embedding_dedup_stream`` and measure per-drop wall, index growth,
and the survivor count — the evidence for the incremental contract's
scale shape (each drop costs O(drop + index probe); committed vectors are
probed from the membership index, never re-read from the table).

Usage: python scripts/embedding_stream_rehearsal.py [sf_dir] [n_drops] [n_probe]
Prints one JSON line; paste numbers into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from invoice_extraction_spark.operators.similarity import auto_n_planes  # noqa: E402
from invoice_extraction_spark.session import get_spark  # noqa: E402
from invoice_extraction_spark.sources.atomic import read_table  # noqa: E402
from invoice_extraction_spark.streaming.embedding_dedup_stream import (  # noqa: E402
    run_embedding_dedup_stream,
)


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _dd, fs in os.walk(d)
        for f in fs
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_drops = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_probe = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    base = "/tmp/embedding_stream_rehearsal"
    shutil.rmtree(base, ignore_errors=True)
    src = f"{base}/source"
    table = f"{base}/table"
    index = f"{base}/index"
    ckpt = f"{base}/ckpt"
    os.makedirs(src)

    spark = get_spark(app_name="embedding-stream-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .withColumn("_drop", F.abs(F.hash("vec_id")) % n_drops)
        .persist()
    )
    n_vecs = emb.count()
    n_planes = auto_n_planes(n_vecs)

    drops = []
    for i in range(n_drops):
        emb.filter(F.col("_drop") == i).drop("_drop").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        t0 = time.monotonic()
        run_embedding_dedup_stream(
            spark,
            src,
            table,
            index,
            ckpt,
            schema="vec_id long, embedding array<float>",
            id_col="vec_id",
            min_cos=0.99,
            n_planes=n_planes,
            n_probe=n_probe,
            max_files_per_trigger=1,
        )
        wall = round(time.monotonic() - t0, 2)
        drops.append(
            {
                "drop": i,
                "wall_s": wall,
                "index_bytes": _dir_bytes(index),
                "index_partitions": len(
                    [d for d in os.listdir(index) if d.startswith("seq=")]
                ),
            }
        )

    n_out = read_table(spark, table).count()
    idx = spark.read.option("basePath", index).parquet(index)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_vecs": n_vecs,
                "n_drops": n_drops,
                "n_planes": n_planes,
                "n_probe": n_probe,
                "min_cos": 0.99,
                "drops": drops,
                "survivors": n_out,
                "dropped_near_dups": n_vecs - n_out,
                "index_rows_total": idx.count(),
                "load_at_end": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
