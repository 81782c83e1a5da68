"""Text repair: mojibake kernel vs a Python twin, no-false-positive
guarantees on clean multilingual text, Column stages' DuckDB parity."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.functions.textfix import (
    _fix_one,
    clean_text,
    fix_mojibake,
    normalize_punct,
    strip_control_chars,
)

MOJIBAKE_CASES = [
    # (broken, fixed)
    ("Ã©", "é"),
    ("CafÃ© rÃ©sumÃ©", "Café résumé"),
    ("â€œquotedâ€\x9d", "“quoted”"),  # cp1252-ish curly quotes, one pass
    ("ÃÂ©", "é"),  # double-encoded
]

CLEAN_CASES = [
    "plain ascii text",
    "déjà vu naïve",  # legitimate latin-1-range accents, valid as-is
    "किसान बाजार सेवा",
    "中文网页内容",
    "mixed ascii और देवनागरी",
    "emoji 🙂 stays",
    "",
]


def test_python_kernel_fixes_and_preserves():
    for broken, fixed in MOJIBAKE_CASES:
        assert _fix_one(broken) == fixed, broken
    for s in CLEAN_CASES:
        assert _fix_one(s) == s, s


def test_udf_matches_python_twin(spark):
    rows = [(i, s) for i, (s, _) in enumerate(MOJIBAKE_CASES)] + [
        (100 + i, s) for i, s in enumerate(CLEAN_CASES)
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {r["i"]: r["f"] for r in df.select("i", fix_mojibake("t").alias("f")).collect()}
    for i, (_, fixed) in enumerate(MOJIBAKE_CASES):
        assert got[i] == fixed
    for i, s in enumerate(CLEAN_CASES):
        assert got[100 + i] == s


def test_control_and_punct_columns(spark):
    df = spark.createDataFrame(
        [(1, "a\x00b\x1fc\td"), (2, "“smart” — dash… here end")],
        "i long, t string",
    )
    got = {
        r["i"]: (r["c"], r["p"])
        for r in df.select(
            "i",
            strip_control_chars("t").alias("c"),
            normalize_punct("t").alias("p"),
        ).collect()
    }
    assert got[1][0] == "abc\td"
    assert got[2][1] == '"smart" - dash... here end'


def test_column_stages_match_duckdb():
    """The Column half of the repair is engine-portable: same regex/translate
    in DuckDB produces identical output."""
    import duckdb

    pdf = pd.DataFrame({"t": ["a\x01b", "“x”—y… z"]})
    con = duckdb.connect()
    con.register("tt", pdf)
    want = con.sql(
        r"""
        SELECT translate(regexp_replace(replace(t, '…', '...'),
               '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]', '', 'g'),
               '‘’“”–—' || chr(160), '''''""-- ') AS f FROM tt
        """
    ).df()["f"].tolist()
    from invoice_extraction_spark.session import get_spark

    spark = get_spark(master="local[2]", shuffle_partitions=2)
    got = [
        r["f"]
        for r in spark.createDataFrame(pdf)
        .select(normalize_punct(strip_control_chars("t")).alias("f"))
        .collect()
    ]
    assert got == want
    con.close()


def test_clean_text_composition(spark):
    # fully mojibake'd input (repair is whole-string: clean smart quotes
    # MIXED with mojibake correctly refuse the round trip — see kernel doc)
    df = spark.createDataFrame(
        [(1, "  CafÃ© â€” â€œgreatâ€\x9d  spot  ")], "i long, t string"
    )
    (r,) = df.select(clean_text("t").alias("f")).collect()
    assert r["f"] == 'Café - "great" spot'


def test_mixed_clean_and_broken_passes_through(spark):
    """A string mixing CLEAN smart quotes with mojibake cannot round-trip
    as a whole — the conservative kernel leaves it untouched rather than
    corrupting the clean half."""
    s = "clean “quote” with CafÃ© mojibake"
    assert _fix_one(s) == s


def test_kernel_is_arrow_not_row_python(spark):
    from invoice_extraction_spark.plans.explain import has_row_python_udf

    df = spark.createDataFrame([(1, "x y z")], "i long, t string").select(
        clean_text("t").alias("f")
    )
    assert not has_row_python_udf(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
