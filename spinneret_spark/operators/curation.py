"""Corpus-curation operators for training-data pipelines:
deterministic sampling and sequence packing (task brief §"beyond the
reference"; complements the dedup/similarity/textstats families).

* :func:`deterministic_sample` — hash-gated Bernoulli sampling, per
  stratum. ``rand()``-based sampling is non-reproducible across
  retries and engines; hashing the row key through the portable md5
  bridge (functions/hashing.py) makes every row's keep/drop decision
  a pure function of its key, so resumed or re-run jobs — and the
  DuckDB oracle — select the *same rows*. The curation use-case is
  rebalancing: cap an over-represented stratum (language, source
  domain) at a fraction while keeping the rest.
* :func:`pack_sequences` — GPT-style concat-and-chunk packing: lay
  documents end-to-end in a fixed key order and cut every ``budget``
  cost units; each document learns its global start offset, first
  chunk id, and how many chunks it spans. The global prefix sum is
  the interesting part at scale: a single ``SUM() OVER (ORDER BY
  ...)`` window funnels the entire corpus through ONE task, so this
  runs the classic two-phase distributed scan instead — range-
  partition by key, per-partition local cumsum, then a tiny window
  over the per-partition totals (#partitions rows) broadcast back.
  The result is identical for ANY partition layout, which is what
  the DuckDB single-window oracle checks.

Both operators are pure built-ins — no Python crossing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spinneret_spark.functions.hashing import md5_int

SAMPLE_DENOM = 1_000_000


def sample_gate(key: Column, fraction: float) -> Column:
    """Boolean keep/drop: md5-uniform in [0, 1) < fraction.

    The 60-bit md5 integer mod 10^6 is uniform to ~10^-12 bias;
    thresholds are integers so both engines compare exactly."""
    u = F.pmod(md5_int(key.cast("string")), F.lit(SAMPLE_DENOM))
    return u < int(fraction * SAMPLE_DENOM)


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    strata_col: str | None = None,
    strata_fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Keep each row iff its key hashes under the (per-stratum)
    fraction. ``fraction`` is the default; ``strata_fractions``
    overrides per stratum value. One filter over the scan — predicate
    and column pruning reach parquet; no shuffle, no Python."""
    if strata_col is None or not strata_fractions:
        return df.where(sample_gate(F.col(key_col), fraction))
    # CASE-style integer threshold per stratum — null-safe (a NULL
    # stratum falls through to the default rate, matching SQL CASE
    # semantics in the oracle) and one comparison per row
    threshold = F.lit(int(fraction * SAMPLE_DENOM))
    for value, frac in sorted(strata_fractions.items(), reverse=True):
        threshold = F.when(
            F.col(strata_col) == value, int(frac * SAMPLE_DENOM)
        ).otherwise(threshold)
    u = F.pmod(md5_int(F.col(key_col).cast("string")), F.lit(SAMPLE_DENOM))
    return df.where(u < threshold)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    cost_col: str = "n_chars",
    id_col: str = "doc_id",
    num_parts: int | None = None,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """(id, cost) → (id, cost, start_off, chunk_id, n_chunks) for
    concat-and-chunk packing at ``budget`` cost units per chunk.
    ``payload_cols`` ride along through the range exchange and come
    back on the output — attaching chunk ids to wide rows WITHOUT a
    second corpus shuffle (a join back on id would re-shuffle every
    payload byte).

    start_off = exclusive prefix sum of cost in ``id_col`` order;
    chunk_id = start_off // budget; n_chunks spans through the last
    byte (zero-cost documents count as occupying one boundary slot so
    every document lands in exactly ≥1 chunk).

    Two-phase distributed prefix sum: range partitioning puts id-order
    contiguous runs in each partition, the per-partition window is
    partition-local (parallel), and only #partitions totals pass
    through the serial offsets window — O(parts), not O(rows).
    """
    payload = payload_cols or []
    parted = docs.select(id_col, cost_col, *payload)
    parted = (
        parted.repartitionByRange(num_parts, id_col)
        if num_parts
        else parted.repartitionByRange(id_col)
    )
    # one materialization, NOT a lazy plan: the local-cumsum branch and
    # the totals branch must see the SAME range boundaries, and range
    # partitioning samples its boundaries per evaluation — two
    # evaluations could bucket rows differently and misalign offsets.
    # (The final result is layout-independent once both branches share
    # a layout.)
    parted = parted.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint()

    w_local = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parted.withColumn(
        "_local_excl", F.coalesce(F.sum(cost_col).over(w_local), F.lit(0))
    )

    totals = parted.groupBy("_pid").agg(F.sum(cost_col).alias("_tot"))
    w_parts = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_tot").over(w_parts), F.lit(0)).alias("_offset"),
    )

    start = (F.col("_offset") + F.col("_local_excl")).cast("long")
    cost = F.col(cost_col).cast("long")
    chunk = F.floor(start / budget).cast("long")
    end_chunk = F.floor(
        (start + F.greatest(cost, F.lit(1)) - 1) / budget
    ).cast("long")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .select(
            id_col,
            cost.alias("cost"),
            start.alias("start_off"),
            chunk.alias("chunk_id"),
            (end_chunk - chunk + F.lit(1)).alias("n_chunks"),
            *payload,
        )
    )


def vocab_topk(
    docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Global top-k token frequencies → (token, n), ties to the
    lexicographically smaller token.

    Split on runs of spaces (' +': identical semantics in Spark and
    RE2/DuckDB, unlike \\s classes), lowercase, drop empties. The
    groupBy is one shuffle with map-side partials; the final
    orderBy+limit compiles to TakeOrderedAndProject — per-partition
    top-k then a k-row merge, never a global sort (asserted in
    tests/test_plans.py)."""
    tokens = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), " +")).alias("token")
    ).where(F.col("token") != "")
    return (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )
