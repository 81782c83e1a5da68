"""URL canonicalization family: tracking-param stripping, param sorting,
default-port/ fragment/ case rules, canonical dedup, host rollups — all pure
Column expressions (no-row-Python asserted)."""

import pandas as pd
from pyspark.sql import functions as F

from invoice_extraction_spark.functions.urls import (
    canonical_url,
    dedup_by_canonical_url,
    host_stats,
    url_host,
    url_registered_domain,
)
from invoice_extraction_spark.plans.explain import has_row_python_udf

CASES = [
    # (input, canonical)
    ("http://Example.COM:80/a?b=2&a=1#frag", "http://example.com/a?a=1&b=2"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),  # non-default kept
    ("http://h.io/p?utm_source=tw&utm_medium=x&q=1", "http://h.io/p?q=1"),
    ("http://h.io/p?fbclid=abc&gclid=1", "http://h.io/p"),
    ("http://h.io", "http://h.io/"),
    ("http://h.io/", "http://h.io/"),
    ("not a url at all", "not a url at all"),  # unparseable passes through
    ("http://h.io/p?z=1&a=2", "http://h.io/p?a=2&z=1"),  # params sorted
]


def _df(spark, urls):
    return spark.createDataFrame(pd.DataFrame({"url": urls}))


def test_canonical_url_rules(spark):
    df = _df(spark, [c[0] for c in CASES])
    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [c[1] for c in CASES]


def test_canonical_is_column_only(spark):
    df = _df(spark, ["http://a.b/c"])
    q = df.select(canonical_url(F.col("url")))
    assert not has_row_python_udf(q)


def test_host_and_registered_domain(spark):
    df = _df(spark, ["https://News.Sub.Example.com:8080/x", "http://localhost/y"])
    rows = df.select(
        url_host(F.col("url")).alias("h"),
        url_registered_domain(F.col("url")).alias("d"),
    ).collect()
    assert (rows[0]["h"], rows[0]["d"]) == ("news.sub.example.com", "example.com")
    assert (rows[1]["h"], rows[1]["d"]) == ("localhost", "localhost")


def test_dedup_by_canonical_url_keeps_one_variant(spark):
    urls = [
        "http://h.io/p?a=1&utm_source=tw",
        "http://h.io/p?a=1",          # same canonical as above
        "http://H.IO:80/p?a=1#frag",  # same canonical again
        "http://h.io/p?a=2",          # different
    ]
    kept = sorted(r["url"] for r in dedup_by_canonical_url(_df(spark, urls)).collect())
    # min original url wins for the triplicate; the distinct one survives
    assert kept == ["http://H.IO:80/p?a=1#frag", "http://h.io/p?a=2"]


def test_dedup_by_canonical_url_collapses_exact_duplicate_urls(spark):
    """The same URL crawled twice (common in crawl data) must collapse to
    ONE row — ADVICE r3: the url-string semi-join kept every copy."""
    urls = [
        "http://h.io/p?a=1",
        "http://h.io/p?a=1",  # exact duplicate crawl
        "http://h.io/p?a=1",  # and again
        "http://h.io/p?a=2",
    ]
    kept = sorted(r["url"] for r in dedup_by_canonical_url(_df(spark, urls)).collect())
    assert kept == ["http://h.io/p?a=1", "http://h.io/p?a=2"]


def test_dedup_by_canonical_url_duplicate_urls_distinct_payloads(spark):
    """Duplicate urls with DIFFERENT other columns: exactly one survives and
    the pick is deterministic (min url, then min whole-row fingerprint)."""
    rows = [
        ("http://h.io/p", "crawl-a"),
        ("http://h.io/p", "crawl-b"),
        ("http://h.io/q", "only"),
    ]
    df = spark.createDataFrame(rows, ["url", "payload"])
    got1 = sorted(map(tuple, dedup_by_canonical_url(df).collect()))
    got2 = sorted(
        map(tuple, dedup_by_canonical_url(df.repartition(7, "payload")).collect())
    )
    assert len(got1) == 2
    assert got1 == got2  # partitioning-independent survivor choice
    assert {u for u, _ in got1} == {"http://h.io/p", "http://h.io/q"}


def test_dedup_by_canonical_url_preserves_caller_fp_column(spark):
    """ADVICE r4: a caller table already carrying a bare ``_fp`` column was
    silently overwritten by the internal fingerprint and dropped on exit
    (data loss). Collision-safe _cud_* names must leave it intact."""
    rows = [
        ("http://h.io/p?a=1", "user-fp-1"),
        ("http://h.io/p?a=1&utm_source=tw", "user-fp-2"),
        ("http://h.io/q", "user-fp-3"),
    ]
    df = spark.createDataFrame(rows, ["url", "_fp"])
    got = dedup_by_canonical_url(df)
    assert "_fp" in got.columns
    kept = sorted(map(tuple, got.collect()))
    assert kept == [
        ("http://h.io/p?a=1", "user-fp-1"),
        ("http://h.io/q", "user-fp-3"),
    ]


def test_dedup_by_canonical_url_rejects_reserved_names(spark):
    df = spark.createDataFrame([("http://h.io/p", 1)], ["url", "_cud_fp"])
    import pytest

    with pytest.raises(ValueError, match="_cud_fp"):
        dedup_by_canonical_url(df)


def test_host_stats_rollup(spark):
    urls = ["http://a.io/1", "http://a.io/2", "https://b.io/1"]
    got = {r["host"]: r["n_docs"] for r in host_stats(_df(spark, urls)).collect()}
    assert got == {"a.io": 2, "b.io": 1}


# --- property fuzz: Column implementation vs an independent Python twin ----

from hypothesis import given, settings
from hypothesis import strategies as st


def _py_canonical(url: str) -> str:
    """Independent reference implementation of the module's documented rules
    (plain string ops, no regex sharing with the Column form)."""
    import re as _re

    m = _re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]+)([^?#]*)(?:\?([^#]*))?(?:#.*)?$", url)
    if not m:
        return url
    scheme = m.group(1).lower()
    host = m.group(2).lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[: -len(":80")]
    elif scheme == "https" and host.endswith(":443"):
        host = host[: -len(":443")]
    path = m.group(3) or "/"
    q = m.group(4) or ""
    kept = []
    for kv in q.split("&"):
        if not kv:
            continue
        k = kv.split("=")[0].lower()
        if k.startswith("utm_") or k in ("fbclid", "gclid", "msclkid", "ref", "mc_cid", "mc_eid"):
            continue
        kept.append(kv)
    kept.sort()
    return scheme + "://" + host + path + ("?" + "&".join(kept) if kept else "")


_hosts = st.from_regex(r"[A-Za-z0-9]([A-Za-z0-9.-]{0,20}[A-Za-z0-9])?", fullmatch=True)
_paths = st.from_regex(r"(/[A-Za-z0-9._~%-]{0,8}){0,3}", fullmatch=True)
_keys = st.sampled_from(["a", "B", "q", "utm_source", "UTM_X", "fbclid", "ref", "id2"])
_vals = st.from_regex(r"[A-Za-z0-9%-]{0,6}", fullmatch=True)
_query = st.lists(st.tuples(_keys, _vals), max_size=4).map(
    lambda kvs: "&".join(f"{k}={v}" for k, v in kvs)
)


@settings(max_examples=120, deadline=None)
@given(
    scheme=st.sampled_from(["http", "https", "HTTP", "ftp"]),
    host=_hosts,
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=_paths,
    query=_query,
    frag=st.sampled_from(["", "#x", "#a=b"]),
)
def test_canonical_url_matches_python_twin(spark, scheme, host, port, path, query, frag):
    url = f"{scheme}://{host}{port}{path}"
    if query:
        url += "?" + query
    url += frag
    got = (
        _df(spark, [url])
        .select(canonical_url(F.col("url")).alias("c"))
        .first()["c"]
    )
    assert got == _py_canonical(url), url


# --- per-domain quotas -----------------------------------------------------


def _quota_urls():
    # bigdomain: 12 urls across 3 subdomains of one registered domain;
    # small.org: 2 urls — under any quota
    urls = [f"https://{sub}.bigdomain.com/p/{i}" for i, sub in enumerate(
        ["www", "forum", "blog"] * 4
    )]
    urls += ["https://small.org/a", "https://small.org/b"]
    return urls


def _py_domain(url):
    import re as _re

    host = _re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", url).group(1).lower()
    host = _re.sub(r":\d+$", "", host)
    parts = host.split(".")
    return ".".join(parts[-2:]) if len(parts) >= 2 else parts[-1]


def test_domain_quota_exact_against_python_twin(spark):
    """Independent twin: rank urls per registered domain by md5(url), keep
    the quota — recomputed in pure Python with hashlib."""
    import hashlib

    from invoice_extraction_spark.functions.urls import domain_quota_filter

    urls = _quota_urls()
    quota = 5
    by_dom = {}
    for u in urls:
        by_dom.setdefault(_py_domain(u), []).append(u)
    expected = set()
    for dom, us in by_dom.items():
        for u in sorted(us, key=lambda x: hashlib.md5(x.encode()).hexdigest())[:quota]:
            expected.add(u)

    got = {
        r["url"]
        for r in domain_quota_filter(_df(spark, urls), max_per_domain=quota).collect()
    }
    assert got == expected
    assert sum(1 for u in got if "bigdomain" in u) == quota  # cap bit
    assert sum(1 for u in got if "small.org" in u) == 2  # under-quota untouched


def test_domain_quota_partitioning_independent(spark):
    from invoice_extraction_spark.functions.urls import domain_quota_filter

    urls = _quota_urls()
    a = {r["url"] for r in domain_quota_filter(_df(spark, urls), 3).collect()}
    b = {
        r["url"]
        for r in domain_quota_filter(_df(spark, urls).repartition(13), 3).collect()
    }
    assert a == b


def test_domain_stats_counts(spark):
    from invoice_extraction_spark.functions.urls import domain_stats

    got = {
        r["domain"]: r["n_docs"]
        for r in domain_stats(_df(spark, _quota_urls())).collect()
    }
    assert got == {"bigdomain.com": 12, "small.org": 2}


def test_domain_quota_no_row_python(spark):
    from invoice_extraction_spark.functions.urls import domain_quota_filter

    df = domain_quota_filter(_df(spark, _quota_urls()), 3)
    assert not has_row_python_udf(df)
