"""Rehearse the driver's correctness gate: run every __spark_entry__.queries()
entry and its oracle_sql() twin side-by-side, compare row count, column names,
and an order-insensitive value hash (columns sorted by name, rows sorted).

    python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df, float_dp: int = 4):
    """Columns sorted by name, rows sorted, floats rounded -> hash string."""

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(float_dp)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    body = df.to_csv(index=False, float_format="%.4f")
    return hashlib.md5(body.encode()).hexdigest(), len(df), list(df.columns), body


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from invoice_extraction_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows, cols={sorted(sdf.columns)}")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            fails.append(name)
            continue
        sh, sn, sc, sbody = normalize(sdf)
        oh, on, oc, obody = normalize(odf)
        status = "OK" if (sh == oh and sn == on and sc == oc) else "MISMATCH"
        print(f"{status} {name}: spark {sn} rows / oracle {on} rows, cols {'==' if sc == oc else f'{sc} vs {oc}'}, hash {'==' if sh == oh else 'DIFF'}")
        if status != "OK":
            fails.append(name)
            sl = sbody.splitlines()
            ol = obody.splitlines()
            for i, (a, b) in enumerate(zip(sl, ol)):
                if a != b:
                    print(f"   first diff line {i}: spark={a!r} oracle={b!r}")
                    break
    spark.stop()
    print("FAILURES:", fails if fails else "none")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
