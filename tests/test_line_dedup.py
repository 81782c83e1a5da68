"""C4-style global line dedup: DuckDB parity, chrome-removal semantics,
order preservation, blocklist reuse."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.operators.line_dedup import (
    dedup_lines,
    line_frequencies,
)
from parity import assert_parity, duck

CHROME = "Accept cookies to continue"
FOOTER = "© 2021 example.com All rights reserved"


def _corpus():
    rows = []
    for i in range(8):
        body = [f"unique paragraph {i} about tractors and harvest yields"]
        if i < 6:
            body.insert(0, CHROME)  # 6 docs share the banner
        if i % 2 == 0:
            body.append(FOOTER)  # 4 docs share the footer
        if i == 0:
            body.append("a quote shared by exactly two docs")
        if i == 1:
            body.append("a quote shared by exactly two docs")
        rows.append((i, "\n".join(body)))
    rows.append((99, f"{CHROME}\n{FOOTER}"))  # all-chrome doc -> empty text
    return pd.DataFrame(rows, columns=["doc_id", "text"])


DEDUP_SQL = """
WITH d AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM corpus),
lines AS (
  SELECT doc_id, i AS line_idx, l[i] AS line
  FROM d, unnest(range(1, len(l) + 1)) AS u(i)
  WHERE l[i] <> ''
),
freq AS (
  SELECT md5(line) AS lh FROM lines GROUP BY md5(line)
  HAVING COUNT(DISTINCT doc_id) >= 3
),
kept AS (
  SELECT doc_id, line_idx, line FROM lines
  WHERE md5(line) NOT IN (SELECT lh FROM freq)
)
SELECT c.doc_id,
       COALESCE(k.t, '') AS text
FROM corpus c LEFT JOIN (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_idx) AS t
  FROM kept GROUP BY doc_id
) k USING (doc_id)
"""


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_corpus())


def test_matches_duckdb_oracle(spark, corpus):
    con = duck()
    con.register("corpus", _corpus())
    got = dedup_lines(corpus, min_docs=3).select("doc_id", "text")
    assert_parity(got, con, DEDUP_SQL)
    con.close()


def test_chrome_removed_quotes_kept(spark, corpus):
    out = {r["doc_id"]: r["text"] for r in dedup_lines(corpus, min_docs=3).collect()}
    assert all(CHROME not in t for t in out.values())
    assert all(FOOTER not in t for t in out.values())
    # a line in only TWO docs survives the K=3 threshold
    assert "a quote shared by exactly two docs" in out[0]
    assert "unique paragraph 4" in out[4]
    assert out[99] == ""  # all-chrome doc degrades to empty, not dropped


def test_line_order_preserved(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["alpha one\nbeta two\ngamma three"]})
    )
    (r,) = dedup_lines(df, min_docs=3).collect()
    assert r["text"] == "alpha one\nbeta two\ngamma three"


def test_blocklist_reuse_and_broadcast(spark, corpus):
    freq = line_frequencies(corpus, min_docs=3).persist()
    assert freq.count() == 2  # banner + footer, not the 2-doc quote
    out = dedup_lines(corpus, min_docs=3, frequencies=freq)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # blocklist side broadcast, anti-join
    freq.unpersist()
