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
