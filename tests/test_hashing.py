"""stable_long_hash must agree bit-for-bit across Spark, DuckDB, and pure
Python (the simulator uses the Python form — simulator.stable_hash)."""

from pyspark.sql import functions as F

from ghcrawler_spark.hashing import (
    stable_long_hash,
    stable_long_hash_seeded,
    stable_long_hash_seeded_sql,
    stable_long_hash_sql,
)
from ghcrawler_spark.simulator import stable_hash

SAMPLES = ["", "a", "http://h0001.test/p1", "Ünïcode-ish", "x" * 500]


def test_spark_duckdb_python_parity(spark, ddb):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["v"])
    got = {
        r["v"]: r["h"]
        for r in df.select("v", stable_long_hash("v").alias("h")).collect()
    }
    for s in SAMPLES:
        duck = ddb.execute(
            f"SELECT {stable_long_hash_sql('?')}", [s]
        ).fetchone()[0]
        assert got[s] == duck, s
        assert got[s] == stable_hash(s), s
        assert got[s] >= 0


def test_seeded_family_independent(spark, ddb):
    df = spark.createDataFrame([("shingle text",)], ["v"])
    vals = df.select(
        *[stable_long_hash_seeded("v", i).alias(f"h{i}") for i in range(4)]
    ).collect()[0]
    assert len({vals[f"h{i}"] for i in range(4)}) == 4
    for i in range(4):
        duck = ddb.execute(
            f"SELECT {stable_long_hash_seeded_sql('?', i)}", ["shingle text"]
        ).fetchone()[0]
        assert vals[f"h{i}"] == duck
