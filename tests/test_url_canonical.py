"""canonicalize_url vs its DuckDB twin on adversarial URLs — the classes
the documents-derived fixture can't reach: multi-'?', bare tracking param
names, path case (must be preserved), '?'-in-value, empty query, NULL."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from petfinder_database_distributor_spark.functions.scalars import (
    CANONICAL_URL_SQL,
    canonicalize_url,
)

URLS = [
    "https://Example.COM:443/A/Path?b=2&a=1#frag",
    "http://example.com:80/x",
    "http://example.com:8080/x",           # non-default port survives
    "https://example.com/x?utm_source=1&utm_medium=2",  # all-tracking → no '?'
    "https://example.com/x?gclid",          # bare tracking name
    "https://example.com/x?a=http://other?c=1&b=2",  # '?' inside a value
    "https://example.com/x?",               # empty query
    "https://example.com/CaseSensitive/Path",
    None,
]


def test_canonicalize_matches_duckdb(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "u string")
    got = {
        r["u"]: r["c"]
        for r in df.select("u", canonicalize_url(F.col("u")).alias("c")).collect()
    }
    for u in URLS:
        if u is None:
            assert got[None] is None
            continue
        want = duckdb.sql(
            "WITH t(x) AS (VALUES (?)) SELECT "
            + CANONICAL_URL_SQL.format(x="x")
            + " FROM t",
            params=[u],
        ).fetchone()[0]
        assert got[u] == want, (u, got[u], want)


def test_canonical_semantics(spark):
    df = spark.createDataFrame([(u,) for u in URLS if u], "u string")
    got = {
        r["u"]: r["c"]
        for r in df.select("u", canonicalize_url(F.col("u")).alias("c")).collect()
    }
    assert got["https://Example.COM:443/A/Path?b=2&a=1#frag"] == (
        "https://example.com/A/Path?a=1&b=2"  # host folded, PATH case kept
    )
    assert got["http://example.com:80/x"] == "http://example.com/x"
    assert got["http://example.com:8080/x"] == "http://example.com:8080/x"
    assert got["https://example.com/x?utm_source=1&utm_medium=2"] == (
        "https://example.com/x"
    )
    assert got["https://example.com/x?gclid"] == "https://example.com/x"
    assert got["https://example.com/x?"] == "https://example.com/x"


def test_unicode_paths_preserved_bytewise(spark):
    """Contract: the canonicalizer folds CASE only in scheme+authority;
    non-ASCII path/query BYTES pass through untouched (IDN/punycode and
    percent-encoding normalization are out of scope — a crawler
    canonicalizes post-fetch URLs it actually saw, and both engines must
    simply agree). Pinned against DuckDB on the same inputs."""
    import duckdb

    urls = [
        "https://example.com/café/路径?q=naïve",
        "HTTPS://EXAMPLE.COM/Ω?π=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = {
        r["u"]: r["c"]
        for r in df.select("u", canonicalize_url(F.col("u")).alias("c")).collect()
    }
    assert got[urls[0]] == "https://example.com/café/路径?q=naïve"
    assert got[urls[1]] == "https://example.com/Ω?π=1"
    for u in urls:
        want = duckdb.sql(
            "WITH t(x) AS (VALUES (?)) SELECT "
            + CANONICAL_URL_SQL.format(x="x")
            + " FROM t",
            params=[u],
        ).fetchone()[0]
        assert got[u] == want, (u, got[u], want)
