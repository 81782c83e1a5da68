"""Shared DuckDB-parity harness for operator tests — the same normalize
(columns sorted by name, rows sorted, floats rounded to 4) the driver's
correctness gate applies, so an in-test parity pass predicts a green
CORRECTNESS row."""

import hashlib
import os

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(df, float_dp: int = 4):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(float_dp)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    body = df.to_csv(index=False, float_format="%.4f")
    return hashlib.md5(body.encode()).hexdigest(), len(df), list(df.columns), body


def assert_parity(spark_df, con, sql: str):
    """Spark result == DuckDB result under the driver's comparator."""
    sdf = spark_df.toPandas()
    odf = con.sql(sql).df()
    sh, sn, sc, sbody = normalize(sdf)
    oh, on, oc, obody = normalize(odf)
    assert sc == oc, f"columns differ: {sc} vs {oc}"
    assert sn == on, f"row counts differ: {sn} vs {on}"
    if sh != oh:
        for i, (a, b) in enumerate(zip(sbody.splitlines(), obody.splitlines())):
            if a != b:
                raise AssertionError(f"value mismatch at line {i}: spark={a!r} oracle={b!r}")
        raise AssertionError("hash mismatch with identical prefixes")
