"""URL canonicalization: Spark == DuckDB == the spec, incl. the reference's
cases (query-string strip lib/request.js:260-262, template strip
githubFetcher.js:111-122)."""

from ghcrawler_spark.functions.urls import (
    canonicalize_url,
    canonicalize_url_sql,
    extract_host,
    extract_host_sql,
)

CASES = [
    ("  HTTP://ExAmple.COM:80//a//b/?q=1#frag", "http://example.com/a/b", "example.com"),
    ("https://API.test:443/path/", "https://api.test/path", "api.test"),
    ("http://h0001.test/p1", "http://h0001.test/p1", "h0001.test"),
    ("http://host.test/teams{/member}/x", "http://host.test/teams/x", "host.test"),
    ("http://host.test", "http://host.test", "host.test"),
    ("http://host.test/?search=zzz", "http://host.test", "host.test"),
    ("notaurl", "notaurl", ""),
    ("http://HOST.test:8080/a", "http://host.test:8080/a", "host.test:8080"),
]


def test_canonicalize_spec(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in CASES], ["url"])
    got = df.select(
        "url",
        canonicalize_url("url").alias("c"),
        extract_host("url").alias("h"),
    ).collect()
    expect = {u: (c, h) for u, c, h in CASES}
    for row in got:
        assert (row["c"], row["h"]) == expect[row["url"]], row["url"]


def test_canonicalize_duckdb_parity(spark, ddb):
    df = spark.createDataFrame([(u,) for u, _, _ in CASES], ["url"])
    srows = {
        r["url"]: (r["c"], r["h"])
        for r in df.select(
            "url", canonicalize_url("url").alias("c"), extract_host("url").alias("h")
        ).collect()
    }
    for u, _, _ in CASES:
        lit = "'" + u.replace("'", "''") + "'"
        c, h = ddb.execute(
            f"SELECT {canonicalize_url_sql(lit)}, {extract_host_sql(lit)}"
        ).fetchone()
        assert srows[u] == (c, h), u


def test_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in CASES], ["url"])
    once = df.select(canonicalize_url("url").alias("c"))
    twice = once.select(canonicalize_url("c").alias("c2"), "c")
    for r in twice.collect():
        assert r["c2"] == r["c"]
