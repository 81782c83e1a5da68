"""WARC source — read Common-Crawl-style web archives straight into the
input-hint table shape ``(url, warc_ts, html, text, lang)``.

Real crawl data arrives as WARC segments (plain or gzip with one gzip member
per record, the Common Crawl convention). This source reads segments via
Spark's ``binaryFile`` format (one row per segment file; parallelism = number
of segment files, which is how Common Crawl shards a crawl — ~64k files) and
splits records in an Arrow-batch kernel: pure stdlib parsing, zero per-row
Python.

Scale notes: a segment is processed entirely inside one task (CC segments
are ~1 GB — size executor memory accordingly, or re-shard upstream); only
``response`` records with an http payload become rows; the HTTP header block
is stripped so ``html`` is the raw body bytes the extraction kernel expects.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("lang", T.StringType()),
        T.StructField("segment", T.StringType()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the CC per-record convention)."""
    out = []
    while data:
        d = zlib.decompressobj(zlib.MAX_WBITS | 16)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def parse_warc(data: bytes) -> Iterator[tuple[str, datetime | None, bytes]]:
    """Yield (url, warc_date, body_bytes) for each ``response`` record.

    Tolerant scanner: malformed records are skipped, never raised — one bad
    record in a 1 GB segment must not kill the task (same poison-row
    discipline as the extraction kernel).
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        head_start = data.find(b"WARC/", pos)
        if head_start < 0:
            break
        head_end = data.find(b"\r\n\r\n", head_start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[head_start:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", "replace"
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = head_end + 4
            continue
        payload = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        ts = None
        raw_ts = headers.get("warc-date", "")
        try:
            ts = datetime.strptime(raw_ts, "%Y-%m-%dT%H:%M:%SZ").replace(
                tzinfo=timezone.utc
            )
        except ValueError:
            pass
        body = payload
        if payload[:5] in (b"HTTP/",):  # strip the http response header block
            sep = payload.find(b"\r\n\r\n")
            body = payload[sep + 4 :] if sep >= 0 else b""
        yield url, ts, body


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC segments -> input-hint-shaped DataFrame (lang unknown -> NULL;
    pipe into ``extract_pages`` / ``text_metrics.lang_guess`` downstream)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "lang": [], "segment": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    records = list(parse_warc(bytes(content)))
                except Exception:  # poison segment -> zero rows, not a task kill
                    records = []
                for url, ts, body in records:
                    rows["url"].append(url)
                    rows["warc_ts"].append(
                        None if ts is None else pd.Timestamp(ts).tz_convert(None)
                    )
                    rows["html"].append(body)
                    rows["lang"].append(None)
                    rows["segment"].append(path)
            yield pd.DataFrame(rows)

    seg = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return seg.mapInPandas(kernel, schema=WARC_SCHEMA)


# --- test/support writer ----------------------------------------------------

def write_warc_record(url: str, ts: str, body: bytes, gzip_member: bool = False) -> bytes:
    """One valid WARC 1.0 response record (+ HTTP header block), optionally
    as its own gzip member (the Common Crawl layout)."""
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts}\r\n"
        f"Content-Length: {len(http)}\r\n"
        f"\r\n"
    ).encode()
    rec = head + http + b"\r\n\r\n"
    if gzip_member:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(rec)
        return buf.getvalue()
    return rec
