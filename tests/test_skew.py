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


def test_salted_topk_rollup_mega_component(spark):
    """One mega-component (VERDICT r1 item 9: 'one mega-component must
    not straggle'): the capped entity rollup must (a) match the exact
    unsalted semantics — exact count, k smallest member ids — and
    (b) plan with NO Window node (the single-task straggler shape)."""
    from spinneret_spark.operators.canonicalize import entity_table

    mega = spark.range(5000).select(
        F.lit(7).alias("canonical_id"), F.col("id").alias("doc_id")
    )
    small = spark.range(30).select(
        (F.col("id") % 10 + 100).alias("canonical_id"),
        (F.col("id") + 10_000).alias("doc_id"),
    )
    assign = mega.unionByName(small).repartition(8)

    ents = entity_table(assign, id_col="doc_id", max_members=16)
    plan = ents._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "capped rollup must not use a Window"

    rows = {r["canonical_id"]: r for r in ents.collect()}
    assert rows[7]["n_members"] == 5000
    assert rows[7]["members"] == list(range(16))
    for cid in range(100, 110):
        assert rows[cid]["n_members"] == 3
        assert rows[cid]["members"] == sorted(
            10_000 + i for i in range(30) if i % 10 + 100 == cid
        )
