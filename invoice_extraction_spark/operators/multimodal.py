"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

Task-brief requirement for the 100 TB training-data pipeline: media payloads
flow through Spark as `binary` columns with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batch kernels over
``mapInPandas``. The image/audio libraries are NOT in this container, so the
actual decoders are STUBBED behind ``_HAS_PIL``-style gates with a
deterministic fake (seeded from the payload hash) — the Spark-side plumbing
(schema, partitioning, UDF signature, batch shape) is real and tested.

This mirrors how the reference treats its perception stack as swappable
engines with graceful fallback (EasyOCR -> Tesseract -> skip,
ocr.py:255-260; custom YOLO -> pretrained -> heuristics, vision.py:33-42).

Scale notes: payloads never leave the executor (no collect); batches are
row-capped AND byte-capped via the iterator protocol so one 4K video frame
row can't blow the Arrow buffer; metadata-only queries prune the binary
column at the parquet scan (ReadSchema check in tests).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoders if ever present — NOT in this sandbox
    import PIL.Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),  # 16-dim
        T.StructField("decoded_w", T.IntegerType()),
        T.StructField("decoded_h", T.IntegerType()),
    ]
)

FEATURE_DIM = 16


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from sha-chained
    seed, metadata consistent with type. Stands in for a real Iceberg media
    table at sf scale."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "media_type": [], "payload": [], "meta": []}
            for i in pdf["id"]:
                i = int(i)
                h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                mtype = ["image", "audio", "video"][i % 3]
                payload = (h * (8 + i % 17))[: 256 + (i % 1024)]
                w, hgt = 16 + h[0] % 64, 16 + h[1] % 64
                rows["media_id"].append(i)
                rows["media_type"].append(mtype)
                rows["payload"].append(payload)
                rows["meta"].append(
                    {
                        "width": w if mtype != "audio" else None,
                        "height": hgt if mtype != "audio" else None,
                        "duration_ms": (1000 + h[2] * 37) if mtype != "image" else None,
                        "codec": {"image": "png", "audio": "opus", "video": "av1"}[mtype],
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, max(2, n // 32)).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Decode + 16-dim feature. Real decode is NOT implemented in this
    container (no PIL/cv2/ffmpeg); a deterministic fake derived from the
    payload digest keeps the plumbing testable end-to-end."""
    if _HAS_PIL:
        raise NotImplementedError(
            "real image decode path intentionally stubbed: wire PIL.Image.open"
            " + resize + channel stats here when the library ships"
        )
    d = hashlib.sha256(payload).digest()
    w, h = 16 + d[0] % 64, 16 + d[1] % 64
    feat = [b / 255.0 for b in d[:FEATURE_DIM]]
    return w, h, feat


def _frame_sample(payload: bytes, n_frames: int = 4) -> list[bytes]:
    """Deterministic frame sampling stub: split payload into n_frames even
    chunks (real impl: ffmpeg keyframe extraction)."""
    if not payload:
        return []
    step = max(len(payload) // n_frames, 1)
    return [payload[i * step : (i + 1) * step] for i in range(n_frames)]


def extract_features(df: DataFrame, max_batch_bytes: int = 32 << 20) -> DataFrame:
    """Arrow-batch feature extraction over media payloads.

    The kernel re-chunks each incoming Arrow batch by cumulative payload
    bytes so oversized media rows can't blow Python memory — the byte-capped
    analog of arrow.maxRecordsPerBatch (which only caps rows).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            start = 0
            acc = 0
            for i, p in enumerate(pdf["payload"]):
                acc += len(p or b"")
                if acc >= max_batch_bytes and i + 1 > start:
                    yield _featurize(pdf.iloc[start : i + 1])
                    start, acc = i + 1, 0
            if start < len(pdf):
                yield _featurize(pdf.iloc[start:])

    def _featurize(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {
            "media_id": pdf["media_id"].tolist(),
            "media_type": pdf["media_type"].tolist(),
            "n_bytes": [],
            "sha1": [],
            "feature": [],
            "decoded_w": [],
            "decoded_h": [],
        }
        for p in pdf["payload"]:
            p = bytes(p or b"")
            w, h, feat = _decode_image(p)
            out["n_bytes"].append(len(p))
            out["sha1"].append(hashlib.sha1(p).hexdigest())
            out["feature"].append(feat)
            out["decoded_w"].append(w)
            out["decoded_h"].append(h)
        return pd.DataFrame(out)

    return df.select("media_id", "media_type", "payload").mapInPandas(
        kernel, schema=FEATURE_SCHEMA
    )


def frame_sample(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video rows -> exploded frame rows (media_id, frame_idx, frame BINARY)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for j, fr in enumerate(_frame_sample(bytes(p or b""), n_frames)):
                    ids.append(int(mid))
                    idxs.append(j)
                    frames.append(fr)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return (
        df.filter(F.col("media_type") == "video")
        .select("media_id", "payload")
        .mapInPandas(kernel, schema=schema)
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — must NOT read the payload column (column
    pruning keeps the binary out of the scan; asserted in tests)."""
    return (
        df.select("media_type", F.col("meta.codec").alias("codec"))
        .groupBy("media_type", "codec")
        .agg(F.count("*").alias("n"))
        .orderBy("media_type", "codec")
    )
