"""Salted-aggregation correctness: hot keys sharded and merged must
equal the plain aggregation (SURVEY.md A4 skew note)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spinneret_spark.functions.skew import salted_agg, split_hot_keys


def _skewed_df(spark):
    # one mega-hot key (0) + a long tail
    hot = spark.range(5000).select(
        F.lit(0).alias("k"), F.col("id").alias("v")
    )
    tail = spark.range(200).select(
        (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail)


def test_salted_min_equals_plain(spark):
    df = _skewed_df(spark)
    plain = {
        r["k"]: r["m"]
        for r in df.groupBy("k").agg(F.min("v").alias("m")).collect()
    }
    salted = {
        r["k"]: r["v"]
        for r in salted_agg(df, ["k"], "v", "min", n_salts=8).collect()
    }
    assert salted == plain


def test_salted_count_equals_plain(spark):
    df = _skewed_df(spark)
    plain = {
        r["k"]: r["c"]
        for r in df.groupBy("k").agg(F.count("v").alias("c")).collect()
    }
    salted = {
        r["k"]: r["v"]
        for r in salted_agg(df, ["k"], "v", "count", n_salts=8).collect()
    }
    assert salted == plain


def test_split_hot_keys(spark):
    df = _skewed_df(spark)
    hot, cold = split_hot_keys(df, "k", hot_threshold=1000)
    assert hot.select("k").distinct().collect()[0]["k"] == 0
    assert cold.filter(F.col("k") == 0).count() == 0
    assert hot.count() + cold.count() == df.count()
