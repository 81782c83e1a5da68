"""Two-phase hot-domain prefilter for the per-domain quota rank
(functions/urls.py, round 6 — VERDICT r5 'What's wrong' #1): a Zipfian
mega-domain must reach the exact row_number window already cut to
~SAFETY*quota rows, survivors must be IDENTICAL to the unprefiltered exact
rank, and the count net must fall back (still exact) when the probabilistic
threshold bites."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.functions import urls as U

QUOTA = 10


def _zipf_urls():
    """One mega-domain with ~50% of all rows + 40 small domains."""
    urls = [f"https://www.megahub.com/p/{i}" for i in range(2000)]
    for d in range(40):
        urls += [f"https://site{d:02d}.net/a/{i}" for i in range(50)]
    return urls


def _py_exact_survivors(urls, quota, hist=None):
    by_dom = {}
    for u in urls:
        by_dom.setdefault(U_py_domain(u), []).append(u)
    out = set()
    for dom, us in by_dom.items():
        h = (hist or {}).get(dom, 0)
        keep = max(0, quota - h)
        for u in sorted(us, key=lambda x: hashlib.md5(x.encode()).hexdigest())[:keep]:
            out.add(u)
    return out


def U_py_domain(url):
    import re as _re

    host = _re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", url).group(1).lower()
    host = _re.sub(r":\d+$", "", host)
    parts = host.split(".")
    return ".".join(parts[-2:]) if len(parts) >= 2 else parts[-1]


def _df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["url"])


@pytest.fixture(scope="module")
def zipf(spark):
    return _df(spark, _zipf_urls())


def test_hot_domain_window_input_is_bounded(spark, zipf):
    """(b) of the VERDICT done-criteria: the rank's input holds at most
    ~SAFETY*quota rows of the mega-domain (binomial mean 4*quota), never
    its full 2000 — while every small domain passes through unfiltered."""
    keyed = zipf.withColumn(
        "_dq_domain", U.url_registered_domain(F.col("url"))
    )
    pre, _ = U._quota_prefilter(keyed, QUOTA, "url")
    per_dom = {
        r["_dq_domain"]: r["n"]
        for r in pre.groupBy("_dq_domain").agg(F.count("*").alias("n")).collect()
    }
    hot = per_dom["megahub.com"]
    assert QUOTA <= hot <= U.QUOTA_SAFETY * QUOTA * 4, hot  # mean 40, cap 160
    for d in range(40):
        assert per_dom[f"site{d:02d}.net"] == 50  # small domains untouched


def test_survivors_identical_to_exact_rank(spark, zipf):
    """(a): prefiltered survivors == the pure-Python exact md5 rank."""
    got = {r["url"] for r in U.domain_quota_filter(zipf, QUOTA).collect()}
    assert got == _py_exact_survivors(_zipf_urls(), QUOTA)
    assert sum(1 for u in got if "megahub" in u) == QUOTA


def test_fallback_net_keeps_survivors_exact(spark, zipf, monkeypatch):
    """Force the probabilistic threshold to bite (SAFETY=0 keeps ~nothing
    under the prefix) — the count net must detect every hot domain and
    fall back to the unprefiltered rank, with survivors STILL exact."""
    monkeypatch.setattr(U, "QUOTA_SAFETY", 0)
    keyed = zipf.withColumn(
        "_dq_domain", U.url_registered_domain(F.col("url"))
    )
    pre, suspect = U._quota_prefilter(keyed, QUOTA, "url")
    assert {r["_dq_domain"] for r in suspect.collect()} == {"megahub.com"}
    got = {r["url"] for r in U.domain_quota_filter(zipf, QUOTA).collect()}
    assert got == _py_exact_survivors(_zipf_urls(), QUOTA)


def test_incremental_survivors_identical_with_history(spark, zipf):
    """The incremental path shares the prefilter: history counts reduce
    the mega-domain's remaining slots and survivors equal the Python twin
    of rank + history <= quota."""
    import pandas as pd

    hist = {"megahub.com": 4, "site00.net": QUOTA}  # saturated small domain
    counts = spark.createDataFrame(
        pd.DataFrame({"domain": list(hist), "n": list(hist.values())})
    )
    kept, delta = U.domain_quota_incremental(zipf, counts, QUOTA)
    got = {r["url"] for r in kept.collect()}
    assert got == _py_exact_survivors(_zipf_urls(), QUOTA, hist)
    d = {r["domain"]: r["n"] for r in delta.collect()}
    assert d["megahub.com"] == QUOTA - 4
    assert "site00.net" not in d  # saturated: contributes nothing


def test_quota_filter_rejects_reserved_names(spark):
    with pytest.raises(ValueError):
        U.domain_quota_filter(
            _df(spark, ["https://a.com/x"]).withColumn("_dq_rank", F.lit(1)),
            3,
        )
