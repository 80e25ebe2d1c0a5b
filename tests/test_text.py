"""Text primitives: Spark == DuckDB on every builder (the _sql twins), plus
spec sanity on hand-checked values."""

import duckdb
from pyspark.sql import functions as F

from ghcrawler_spark.functions import text as T

SAMPLES = [
    "The quick brown fox, and the lazy dog!",
    "el la de que los",
    "der die und das",
    "le la et les des",
    "",
    "x",
    "  spaced   out\ttabs  ",
    "numbers 123 and symbols #$% mixed-in",
]

def q(s: str) -> str:
    """SQL string literal (the generated fragments repeat the expr, so
    prepared-statement placeholders can't be used)."""
    return "'" + s.replace("'", "''") + "'"


PAIRS = [
    (T.token_count_ws, T.token_count_ws_sql, "long"),
    (T.token_count_bpe, T.token_count_bpe_sql, "long"),
    (T.stopword_count, T.stopword_count_sql, "long"),
    (T.quality_score, T.quality_score_sql, None),
    (T.predicted_lang, T.predicted_lang_sql, None),
    (T.fingerprint, T.fingerprint_sql, "long"),
]


def test_duckdb_parity(spark, ddb):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["t"])
    for fn, sql_fn, cast in PAIRS:
        col = fn("t")
        if cast:
            col = col.cast(cast)
        got = {r["t"]: r["v"] for r in df.select("t", col.alias("v")).collect()}
        for s in SAMPLES:
            duck = ddb.execute(f"SELECT {sql_fn(q(s))}").fetchone()[0]
            assert got[s] == duck, (fn.__name__, repr(s), got[s], duck)


def test_shingles_parity(spark, ddb):
    df = spark.createDataFrame([(s,) for s in SAMPLES if s.strip()], ["t"])
    got = {r["t"]: r["v"] for r in df.select("t", T.shingles("t", 3).alias("v")).collect()}
    for s in got:
        duck = ddb.execute(f"SELECT {T.shingles_sql(q(s), 3)}").fetchone()[0]
        assert got[s] == duck, repr(s)


def test_specs():
    # hand-checked expectations pinned against the generated values
    import pandas as pd

    from ghcrawler_spark.session import build_session

    spark = build_session("t", master="local[2]", shuffle_partitions=2)
    df = spark.createDataFrame(
        [("the and of is a",), ("der die und das ein",)], ["t"]
    )
    rows = df.select(
        T.predicted_lang("t").alias("pl"), T.token_count_ws("t").alias("n")
    ).collect()
    assert rows[0]["pl"] == "en" and rows[0]["n"] == 5
    assert rows[1]["pl"] == "de"


def test_fingerprint_rolling_property(spark):
    """fp('ab') == (fp('a')*31 + ascii('b')) % p — the rolling-hash law."""
    df = spark.createDataFrame([("a",), ("ab",)], ["t"])
    vals = {r["t"]: r["v"] for r in df.select("t", T.fingerprint("t").alias("v")).collect()}
    assert vals["ab"] == (vals["a"] * T.FP_BASE + ord("b")) % T.FP_MOD
