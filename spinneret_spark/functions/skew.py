"""Explicit skew handling: salted two-phase aggregation and hot-key
splitting (north rule: "salted, AQE-skew-hedged shuffles").

AQE's skew-join splitting (enabled in session.py) handles most
runtime skew; these helpers cover the cases AQE cannot see:

* a grouped aggregation whose reduce keys are power-law hot (CC
  labels of giant components, entity degrees of head entities) —
  :func:`salted_agg` shards each key across ``n_salts`` partial
  groups, then merges. Correct for any associative+commutative
  aggregate (min/max/count/sum).
* a join against a relation with a few mega-hot keys —
  :func:`split_hot_keys` partitions the relation into hot/cold by an
  observed-frequency threshold so callers can broadcast the hot
  slice and shuffle only the cold one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    agg_col: str,
    agg: str = "min",
    n_salts: int = 16,
    out_name: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation: groupBy(keys+salt).agg →
    groupBy(keys).agg. The salt shards hot keys across reducers in
    phase one; phase two merges ≤ n_salts rows per key. ``agg`` must
    be associative+commutative ("min", "max", "sum", "count")."""
    out_name = out_name or agg_col
    fn = getattr(F, agg)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(fn(agg_col).alias("_partial"))
    merge = {"count": "sum"}.get(agg, agg)
    return phase1.groupBy(*keys).agg(
        getattr(F, merge)("_partial").alias(out_name)
    )


def salted_topk_rollup(
    df: DataFrame,
    key: str,
    val_col: str,
    k: int,
    n_salts: int = 16,
    count_name: str = "n",
    list_name: str = "topk",
) -> DataFrame:
    """(key, exact count, k smallest vals) — the salted form of the
    capped-member rollup.

    The naive shape (``row_number`` over ``Window.partitionBy(key)``,
    or a plain ``collect_list``) funnels every row of a hot key through
    ONE reducer task: a boilerplate mega-cluster with 10^7 members
    becomes a straggler that serializes the whole stage. Salting shards
    each key across ``n_salts`` partial groups first; top-k is
    associative (k smallest of the union == k smallest of per-shard
    k-smallest), so phase two merges ≤ ``n_salts`` partial lists of ≤ k
    elements per key — bounded regardless of component size. Phase-one
    partial lists hold ~group_size/n_salts elements; raise ``n_salts``
    if the hottest expected key divided by ``n_salts`` is still too
    large for one task.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    phase1 = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.slice(F.sort_array(F.collect_list(val_col)), 1, k).alias("_part"),
    )
    return phase1.groupBy(key).agg(
        F.sum("_n").alias(count_name),
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_part"))), 1, k
        ).alias(list_name),
    )


def split_hot_keys(
    df: DataFrame,
    key: str,
    hot_threshold: int,
) -> tuple[DataFrame, DataFrame]:
    """(hot, cold) split by key frequency. Join the hot slice with
    ``F.broadcast`` and union the results; AQE handles the rest."""
    freq = df.groupBy(key).agg(F.count(F.lit(1)).alias("_n"))
    hot_keys = freq.filter(F.col("_n") > hot_threshold).select(key)
    hot = df.join(F.broadcast(hot_keys), key, "left_semi")
    cold = df.join(F.broadcast(hot_keys), key, "left_anti")
    return hot, cold
