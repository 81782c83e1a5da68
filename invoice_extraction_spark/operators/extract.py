"""The extraction pipeline: pages DataFrame -> extracted rows DataFrame.

Physical shape (SURVEY.md §3 "our lifecycle"):

    scan (url, warc_ts, html, lang)             -- column pruning: html only
      -> salted repartition on hash(url)        -- north rule: break host skew
      -> ONE ArrowEvalPython stage (mapInPandas) -- DOM parse + block scoring
         + anchor span extraction fused in a single Python round-trip
      -> pure-Column validation (when/otherwise) -- stays in WholeStageCodegen
      -> confidence arithmetic (Column math)
      -> sink (atomic append + lineage)

The per-document work matches the reference pipeline stage-for-stage
(executable.py:54-65: encode -> extract -> validate -> confidence) but runs as
vectorized Arrow batches with zero per-row Python UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.fields import FIELD_NAMES, extract_fields
from ..functions.html_blocks import parse_blocks
from ..functions.pdf_text import parse_pdf_blocks

if TYPE_CHECKING:
    pass

SPAN_T = T.StructType(
    [
        T.StructField("value", T.StringType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("conf", T.DoubleType()),
        T.StructField("method", T.StringType()),
    ]
)

FIELDS_T = T.StructType([T.StructField(n, SPAN_T) for n in FIELD_NAMES])

EXTRACT_RAW_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("n_content_blocks", T.IntegerType()),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("fields", FIELDS_T),
        T.StructField("error", T.StringType()),
    ]
)

# Validation vocabulary — the SHAPE follows the reference (validators.py:26-42
# manufacturer-reject list + dealer-words override), the CONTENTS are a
# deliberate adaptation to this synthetic webtext corpus: the list below adds
# TAFE/ESCORTS and omits the reference's new holland / massey ferguson /
# farmtrac / eicher / kubota because those never appear in the corpus vocab.
# Parity audits should compare the rule, not the word list.
MANUFACTURER_REJECT = ["MAHINDRA", "TAFE", "SONALIKA", "JOHN DEERE", "ESCORTS", "SWARAJ"]
DEALER_WORDS = ["TRACTORS", "MOTORS", "AGRO", "AGROTECH", "ENTERPRISES", "TRADERS"]
# Range gate adapted from validators.py:86-95. Deliberate non-parity: the
# reference ACCEPTS out-of-range asset_cost when > 100,000 (soft warn); we
# strictly null outside [10k, 100M] — a webtext page has no second channel to
# rescue an implausible amount, so a hard gate is the safer semantics.
TOTAL_MIN, TOTAL_MAX = 10_000.0, 100_000_000.0
CONFIDENCE_CAP = 0.97  # confidence.py stepped cap tops out at 97


def _extract_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batch in, Arrow batch out. All heavy work
    (DOM parse V2, layout V4, boilerplate classify V5, anchor extraction V6 —
    SURVEY.md §2.8) fused into one executor-side Python stage."""
    for pdf in it:
        out = {
            "url": pdf["url"].tolist(),
            "warc_ts": pdf["warc_ts"].tolist(),
            "lang": pdf["lang"].tolist() if "lang" in pdf else [None] * len(pdf),
            "extracted_text": [],
            "n_blocks": [],
            "n_content_blocks": [],
            "bytes_in": [],
            "fields": [],
            "error": [],
        }
        for html in pdf["html"]:
            # per-row try/except: a poison document degrades to an error row,
            # never a task failure (reference's engine-fallback discipline,
            # ocr.py:255-260; at 10^12 docs a task retry loop is an outage)
            try:
                # format dispatch by magic bytes (north rule: "HTML
                # boilerplate strip, PDF/layout parse" through ONE pipeline)
                if isinstance(html, (bytes, bytearray, memoryview)) and bytes(
                    html[:5]
                ) == b"%PDF-":
                    blocks = parse_pdf_blocks(bytes(html))
                else:
                    blocks = parse_blocks(html)
                content = [b.text for b in blocks if b.is_content]
                if not content:
                    content = [b.text for b in blocks if b.region == "body"]
                text = "\n".join(content)
                spans = extract_fields(text)
                err = None
            except Exception as e:  # noqa: BLE001
                blocks, text, spans = [], "", {n: None for n in FIELD_NAMES}
                err = f"{type(e).__name__}: {e}"[:500]
            out["extracted_text"].append(text)
            out["n_blocks"].append(len(blocks))
            out["n_content_blocks"].append(sum(1 for b in blocks if b.is_content))
            out["bytes_in"].append(len(html) if html is not None else 0)
            out["error"].append(err)
            out["fields"].append(
                {
                    n: (
                        {
                            "value": s.value,
                            "start": s.start,
                            "end": s.end,
                            "conf": s.conf,
                            "method": s.method,
                        }
                        if s is not None
                        else None
                    )
                    for n, s in spans.items()
                }
            )
        yield pd.DataFrame(out)


def salted_repartition(df: DataFrame, num_partitions: int, salt_seed: int = 42) -> DataFrame:
    """Explicit hash-partitioning on url with a seed-salt (north rule).

    ``xxhash64(url, salt)`` decorrelates the shuffle key from however the
    input files were clustered (Common Crawl WARCs are host-adjacent), so one
    hot host can never pin a partition. At 1000 executors this is the
    difference between 32 stragglers and a flat stage.
    """
    return df.repartition(num_partitions, F.xxhash64(F.col("url"), F.lit(salt_seed)))


def _null_span() -> F.Column:
    return F.lit(None).cast(SPAN_T)


def validate_fields(df: DataFrame) -> DataFrame:
    """Pure-Column validation — the reference's validators.py:11-132 semantics
    expressed as when/otherwise so it stays inside WholeStageCodegen (zero
    Python). Adds ``total_amount DOUBLE`` (numeric normalize, validators.py:80-83)
    and nulls invalid spans.

    Deliberate non-parity (P8): the reference force-sets ``stamp.present=true``
    regardless of input (validators.py:113-130) — a documented quirk of its
    image domain. Our validators only ever NULL spans, never forge them:
    a webtext field is present iff an anchor matched.
    """
    f = F.col("fields")

    # --- total: numeric normalize + range gate (validators.py:86-95) ---
    tv = f["total"]["value"]
    num = F.regexp_replace(tv, r"[^0-9.]", "").cast("double")
    amount = F.when(F.lower(tv).contains("lakh"), num * 100_000.0).otherwise(num)
    total_ok = f["total"].isNotNull() & amount.between(TOTAL_MIN, TOTAL_MAX)

    # --- seller: manufacturer reject unless dealer-word present
    #     (validators.py:26-42) ---
    sv = F.upper(F.trim(f["seller"]["value"]))
    has_dealer_word = F.exists(
        F.split(sv, r"\s+"), lambda w: w.isin(DEALER_WORDS)
    )
    seller_ok = f["seller"].isNotNull() & (
        ~sv.isin(MANUFACTURER_REJECT) | has_dealer_word
    )

    # --- dates/ids/addresses: non-empty sanity (validators.py:23-55 null
    #     gates; dates stay raw spans — reference never parses dates) ---
    def nonempty_ok(name: str) -> F.Column:
        return f[name].isNotNull() & (F.length(F.trim(f[name]["value"])) > 0)

    ok_by_field = {
        n: {"total": total_ok, "seller": seller_ok}.get(n, nonempty_ok(n))
        for n in FIELD_NAMES
    }
    validated = F.struct(
        *[
            F.when(ok_by_field[n], f[n]).otherwise(_null_span()).alias(n)
            for n in FIELD_NAMES
        ]
    )
    # Per-field VALIDATION scores (consensus.py:149-170's per-field blend:
    # full credit for a validated span, half credit for a span that was
    # found but failed validation — evidence the page had the field even if
    # the value is suspect — zero when absent). Feeds score_consensus.
    field_scores = F.struct(
        *[
            F.when(ok_by_field[n], F.lit(1.0))
            .when(f[n].isNotNull(), F.lit(0.5))
            .otherwise(F.lit(0.0))
            .alias(n)
            for n in FIELD_NAMES
        ]
    )
    return (
        df.withColumn("field_scores", field_scores)
        .withColumn("fields", validated)
        .withColumn(
            "total_amount",
            F.when(total_ok, F.round(amount, 2)).otherwise(F.lit(None).cast("double")),
        )
    )


def score_confidence(df: DataFrame) -> DataFrame:
    """Field-count confidence (A3) — pure Column arithmetic. Deliberate
    adaptation of confidence.py:6-41: the reference scores 6 fields with
    stepped caps (5/6 -> 95, 6/6 -> 97); this domain has 7 fields, so we use
    the smooth ratio non-null/7 capped at 0.97 — same monotone shape, no
    step table to maintain."""
    found = sum(
        F.col("fields")[n].isNotNull().cast("int") for n in FIELD_NAMES
    )
    conf = F.round(
        F.least(found.cast("double") / F.lit(float(len(FIELD_NAMES))), F.lit(CONFIDENCE_CAP)), 2
    )
    return df.withColumn("n_fields_found", found).withColumn("confidence", conf)


def score_consensus(df: DataFrame, seller_match_score=None) -> DataFrame:
    """Weighted document confidence (A4) — the reference's consensus blend
    ``0.6*fields + 0.2*ocr + 0.1*vision + 0.1*(0.5+boosts)``, clamped [0,1]
    (consensus.py:130-194, weights :180-185), with OUR evidence channels:

    - the 0.6 fields channel is the mean of per-field VALIDATION scores
      (``field_scores`` from validate_fields: 1.0 validated / 0.5 found-but-
      rejected / 0.0 absent — the consensus.py:149-170 per-field blend,
      round 2: round 1 used the bare found-ratio and lost the validation
      signal);
    - ``seller_match_score`` (a Column, e.g. the fuzzy-join match_score in
      [0,1]) replaces the seller entry when given — the reference's "dealer
      match score / 100" channel (consensus.py:151-156) — falling back to
      the rule-based score when the fuzzy match found nothing;
    - 0.2 parse success + 0.1 content-block ratio stand in for the OCR and
      vision channels (webtext has no second modality);
    - 0.1 consistency boost when both invoice_id and total were anchored.

    Kept as a SEPARATE column from the A3 field-count ``confidence`` (same
    separation as the reference's confidence.py vs consensus.py)."""
    f = F.col("fields")
    fs = F.col("field_scores")
    per_field = {n: fs[n] for n in FIELD_NAMES}
    if seller_match_score is not None:
        per_field["seller"] = F.coalesce(seller_match_score, fs["seller"])
    field_score = sum(per_field.values()) / F.lit(float(len(FIELD_NAMES)))
    parse_score = F.least(F.col("n_blocks").cast("double") / 10.0, F.lit(1.0))
    content_score = F.col("n_content_blocks").cast("double") / F.greatest(
        F.col("n_blocks").cast("double"), F.lit(1.0)
    )
    boost = (
        F.when(
            f["invoice_id"].isNotNull() & f["total"].isNotNull(), 0.5
        ).otherwise(0.0)
    )
    raw = 0.6 * field_score + 0.2 * parse_score + 0.1 * content_score + 0.1 * (0.5 + boost)
    return df.withColumn(
        "consensus_confidence",
        F.round(F.greatest(F.least(raw, F.lit(1.0)), F.lit(0.0)), 2),
    )


PSEUDO_LABEL_MIN_CONFIDENCE = 0.85  # consensus.py:209


def pseudo_labels(df: DataFrame, min_confidence: float = PSEUDO_LABEL_MIN_CONFIDENCE) -> DataFrame:
    """Weak-supervision export (reference pseudo_label_bootstrap,
    consensus.py:196-222): keep only documents whose consensus confidence
    clears the 0.85 bar and tag them usable-for-training. A pure filter +
    projection — the high-confidence slice of the extraction output becomes
    the next model's training table."""
    return df.filter(F.col("consensus_confidence") >= min_confidence).withColumns(
        {
            "source": F.lit("consensus_validation"),
            "usable_for_training": F.lit(True),
        }
    )


def extract_pages(
    df: DataFrame,
    num_partitions: int | None = None,
    salt_seed: int = 42,
) -> DataFrame:
    """Full pipeline over an input-hint-shaped DataFrame
    ``(url, warc_ts, html, text, lang)`` -> extracted output table.

    Column-prunes to the 4 needed columns before the Arrow stage (the `text`
    crawler-baseline column is never shipped to Python).
    """
    cols = [c for c in ("url", "warc_ts", "html", "lang") if c in df.columns]
    pruned = df.select(*cols)
    if "warc_ts" not in pruned.columns:
        pruned = pruned.withColumn("warc_ts", F.lit(None).cast("timestamp"))
    if "lang" not in pruned.columns:
        pruned = pruned.withColumn("lang", F.lit(None).cast("string"))
    if num_partitions:
        # Cost-aware shuffle (guide §2.4 "remove shuffles outright"): the
        # salted repartition exists to (a) guarantee kernel parallelism and
        # (b) decorrelate tasks from host-clustered input files. When the
        # scan already yields >= num_partitions row-bearing byte-range
        # splits (checked against parquet ROW GROUPS, not just splits),
        # both goals are met by the scan itself — byte-balanced splits give
        # per-task balance regardless of host adjacency — and the full-
        # payload shuffle is pure cost (measured at sf1: ~2-3 s of a 13 s
        # extraction wall moving ~1.2 GB of HTML that was already spread).
        # Unknown inputs (in-memory frames, non-parquet) keep the shuffle:
        # the skew contract stays the default, the skip needs proof.
        from ..plans.parallelism import effective_scan_parallelism

        eff = effective_scan_parallelism(pruned, num_partitions)
        if eff is None or eff < num_partitions:
            pruned = salted_repartition(pruned, num_partitions, salt_seed)
    raw = pruned.mapInPandas(_extract_batches, schema=EXTRACT_RAW_SCHEMA)
    return score_consensus(score_confidence(validate_fields(raw)))
