"""jobs/datacard.py: numbers match independent recomputation, markdown is
coherent, regeneration is byte-identical."""

import json
import os

import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.sources.atomic import commit_append


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    tbl = str(tmp_path_factory.mktemp("card") / "tbl")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    commit_append(docs.filter("doc_id < 200"), tbl, run_id="c1", ok_predicate="doc_id >= 0")
    commit_append(
        docs.filter("doc_id >= 200 AND doc_id < 300"), tbl, run_id="c2", ok_predicate="doc_id >= 0"
    )
    return tbl


def test_card_numbers_and_markdown(spark, table, tmp_path, capsys):
    from jobs.datacard import main

    out = str(tmp_path / "card")
    main(["--table", table, "--out", out])
    capsys.readouterr()
    card = json.load(open(os.path.join(out, "datacard.json")))
    assert card["snapshots"] == ["c1", "c2"]
    assert card["n_docs"] == 300 == card["lineage_rows"]

    # independent recomputation of token totals — the card defaults to REAL
    # frozen-BPE counts (VERDICT r3 #4), so the twin uses the same frozen
    # merge table through the UDF
    from invoice_extraction_spark.functions.bpe import frozen_bpe_token_count
    from invoice_extraction_spark.sources.atomic import read_table

    assert card["token_counter"] == "bpe"
    want = (
        read_table(spark, table)
        .agg(F.sum(frozen_bpe_token_count()(F.col("text"))).cast("bigint"))
        .collect()[0][0]
    )
    assert card["n_tokens"] == want
    assert sum(e["n_tokens"] for e in card["by_language"]) == want
    assert {e["value"] for e in card["by_stratum"]} <= {f"src{i}" for i in range(20)}
    assert card["token_quantiles"]["p10"] <= card["token_quantiles"]["p99"]

    md = open(os.path.join(out, "DATACARD.md")).read()
    assert "## By language" in md and f"**{card['n_docs']:,}**" in md


def test_card_regeneration_is_byte_identical(spark, table, tmp_path, capsys):
    from jobs.datacard import main

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    main(["--table", table, "--out", a])
    main(["--table", table, "--out", b])
    capsys.readouterr()
    for name in ("datacard.json", "DATACARD.md"):
        assert open(os.path.join(a, name)).read() == open(os.path.join(b, name)).read()
