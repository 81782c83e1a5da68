"""jobs/export.py: JSONL round trip, record-per-file bounds, deterministic
shard contents across re-exports."""

import gzip
import json
import os

import pandas as pd
import pytest

from invoice_extraction_spark.sources.atomic import commit_append


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    tbl = str(tmp_path_factory.mktemp("exp") / "tbl")
    pdf = pd.DataFrame(
        {
            "doc_id": range(200),
            "extracted_text": [f"text of document {i}" for i in range(200)],
            "pack_id": [f"s#{i // 25}" for i in range(200)],
        }
    )
    commit_append(
        spark.createDataFrame(pdf), tbl, run_id="e1", ok_predicate="doc_id >= 0"
    )
    return tbl


def _read_jsonl_dir(out):
    rows = []
    for f in sorted(os.listdir(out)):
        if not f.startswith("part-") or f.endswith(".crc"):
            continue
        path = os.path.join(out, f)
        op = gzip.open if f.endswith(".gz") else open
        with op(path, "rt") as fh:
            rows.extend(json.loads(ln) for ln in fh if ln.strip())
    return rows


def test_jsonl_round_trip_with_compression(spark, table, tmp_path, capsys):
    from jobs.export import main

    out = str(tmp_path / "out")
    main(
        [
            "--table", table,
            "--out", out,
            "--columns", "doc_id,extracted_text,pack_id",
            "--shard-by", "pack_id",
            "--shards", "8",
            "--compress", "gzip",
        ]
    )
    assert "exported 200 rows" in capsys.readouterr().out
    rows = _read_jsonl_dir(out)
    assert len(rows) == 200
    assert {r["doc_id"] for r in rows} == set(range(200))
    # n_tokens rides along by default (frozen-BPE token economics)
    assert all(
        set(r) == {"doc_id", "extracted_text", "pack_id", "n_tokens"} for r in rows
    )


def test_max_records_per_file(spark, table, tmp_path, capsys):
    from jobs.export import main

    out = str(tmp_path / "out")
    main(["--table", table, "--out", out, "--shard-by", "doc_id", "--shards", "4",
          "--max-records-per-file", "30"])
    capsys.readouterr()
    for f in os.listdir(out):
        if f.startswith("part-") and not f.endswith(".crc"):
            with open(os.path.join(out, f)) as fh:
                assert sum(1 for _ in fh) <= 30


def test_reexport_is_deterministic(spark, table, tmp_path, capsys):
    from jobs.export import main

    def export(name):
        out = str(tmp_path / name)
        main(["--table", table, "--out", out, "--shard-by", "pack_id",
              "--shards", "8", "--columns", "doc_id,pack_id"])
        capsys.readouterr()
        # part filenames embed a per-job UUID; the shard INDEX (part-NNNNN)
        # is the stable identity — key on it
        return {
            f[:10]: open(os.path.join(out, f)).read()
            for f in sorted(os.listdir(out))
            if f.startswith("part-") and f.endswith(".json")
        }

    a, b = export("a"), export("b")
    assert list(a) == list(b)  # same shard indices
    assert a == b  # byte-identical shard contents per index


def test_export_attaches_frozen_bpe_token_counts_by_default(spark, table, tmp_path, capsys):
    """Default token economics (VERDICT r3 #4): exports carry an n_tokens
    column computed with the FROZEN BPE merges unless --token-counts none."""
    from invoice_extraction_spark.functions.bpe import encode_word
    from invoice_extraction_spark.functions.bpe_merges import FROZEN_BPE_MERGES
    from jobs.export import main

    out = str(tmp_path / "tok")
    main(["--table", table, "--out", out])
    capsys.readouterr()
    rows = _read_jsonl_dir(out)
    assert rows and all("n_tokens" in r for r in rows)
    ranks = {p: i for i, p in enumerate(FROZEN_BPE_MERGES)}
    r0 = rows[0]
    want = sum(
        len(encode_word(w, ranks))
        for w in r0["extracted_text"].lower().split(" ")
        if w
    )
    assert r0["n_tokens"] == want

    out2 = str(tmp_path / "notok")
    main(["--table", table, "--out", out2, "--token-counts", "none"])
    capsys.readouterr()
    assert all("n_tokens" not in r for r in _read_jsonl_dir(out2))
