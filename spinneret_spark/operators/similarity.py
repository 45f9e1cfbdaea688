"""Similarity search over embedding columns (array<float>).

* :func:`brute_force_topk` — exact cosine top-k: the correctness
  baseline. Query side is broadcast (queries ≪ corpus); per-query
  top-k via window row_number with id tiebreak. Cost O(|Q|·N·d) —
  fine for reranking shortlists, not for N=10^12.
* :func:`ivf_topk` — the scale path: coarse quantization into cells
  (deterministic seed centroids = embeddings of the lexicographically
  first ids per label-stratum), probe the ``nprobe`` nearest cells,
  brute-force only inside them. Recall < 1 by design; the plan is the
  point — candidate generation becomes an equi-join on cell_id, so
  the corpus shuffles once on a short key instead of crossing with
  every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spinneret_spark.functions.vectors import cosine


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k by cosine: (q_id, vec_id, rank, cos)."""
    pairs = embeddings.crossJoin(F.broadcast(queries)).where(
        F.col(id_col) != F.col(q_id_col)
    )
    scored = pairs.select(
        q_id_col,
        id_col,
        cosine(F.col(q_vec_col), F.col(vec_col)).alias("cos"),
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.desc("cos"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "rank", "cos")
    )


def assign_cells(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "cell_id",
    cent_vec: str = "cell_vec",
) -> DataFrame:
    """IVF assignment: nearest centroid per vector (broadcast argmax,
    no shuffle — max_by aggregation happens after an explode of the
    small centroid set)."""
    scored = embeddings.crossJoin(F.broadcast(centroids)).withColumn(
        "sim", cosine(F.col(vec_col), F.col(cent_vec))
    )
    return scored.groupBy(id_col).agg(
        F.max_by(F.col(cent_id), F.struct(F.col("sim"), -F.col(cent_id))).alias(
            "cell_id"
        )
    )


def assign_cells_multi(
    embeddings: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "cell_id",
    cent_vec: str = "cell_vec",
) -> DataFrame:
    """Multi-probe IVF assignment: each vector lands in its ``nprobe``
    nearest cells (one output row per (vector, cell)). Blocking near-
    dup search on this assignment catches pairs that straddle a single
    cell boundary — the standard recall/cost dial: candidate volume
    grows ~nprobe², recall approaches the exhaustive join."""
    scored = embeddings.crossJoin(F.broadcast(centroids)).withColumn(
        "sim", cosine(F.col(vec_col), F.col(cent_vec))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc(cent_id))
    return (
        scored.withColumn("nth", F.row_number().over(w))
        .filter(F.col("nth") <= nprobe)
        .select(id_col, cent_id)
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd's k-means → (cell_id, cell_vec) centroids.

    Determinism contract (what makes this oracle-exact vs DuckDB):
    * init = the ``k`` lowest-id vectors, cell_id = rank by id;
    * assignment ties break to the LOWER cell_id;
    * per-dimension means are LEFT-TO-RIGHT float64 folds over members
      sorted by id, then one double/int division — addition order is
      pinned, so both engines produce bit-identical centroids.

    The ordered fold costs a collect_list per (cell, dim) — an oracle-
    determinism device, not an algorithmic need; the corpus-scale
    variant is the same plan with plain ``avg(val)`` (commutative
    partial aggregation, no list materialization). Iteration count is
    fixed (no convergence probe → no extra driver actions). Cells that
    lose all members drop out on both engines alike.
    """
    w_init = Window.orderBy(id_col)
    cents = (
        embeddings.orderBy(id_col)
        .limit(k)
        .select(F.row_number().over(w_init).alias("rn"), F.col(vec_col))
        .select(
            (F.col("rn") - 1).alias("cell_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                "cell_vec"
            ),
        )
    )
    for _ in range(iters):
        assigned = assign_cells(embeddings, cents, id_col, vec_col).join(
            embeddings, id_col
        )
        ex = assigned.select(
            "cell_id",
            F.col(id_col).alias("i"),
            F.posexplode(
                F.transform(F.col(vec_col), lambda x: x.cast("double"))
            ).alias("pos", "val"),
        )
        # materialize the sorted member list as a real column before
        # folding (inline agg expressions re-inline per access)
        vals = ex.groupBy("cell_id", "pos").agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("i"), F.col("val")))
            ).alias("vals")
        )
        sums = vals.select(
            "cell_id",
            "pos",
            (
                F.aggregate(
                    "vals", F.lit(0.0), lambda acc, s: acc + s["val"]
                )
                / F.size("vals")
            ).alias("mean"),
        )
        cents = (
            sums.groupBy("cell_id")
            .agg(F.sort_array(F.collect_list(F.struct("pos", "mean"))).alias("pm"))
            .select(
                "cell_id",
                F.transform("pm", lambda s: s["mean"]).alias("cell_vec"),
            )
        )
    return cents


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: probe the nprobe nearest cells per query.

    Plan: corpus→cell assignment (broadcast argmax) once; queries→
    nprobe cells (broadcast, row_number over tiny set); candidates =
    equi-join on cell_id; exact rerank inside. The only corpus
    shuffle is the cell_id equi-join, and AQE handles cell-size skew.
    """
    assigned = assign_cells(embeddings, centroids, id_col, vec_col).join(
        embeddings, id_col
    )
    q_cells = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("sim", cosine(F.col(q_vec_col), F.col("cell_vec")))
        .withColumn(
            "nth",
            F.row_number().over(
                Window.partitionBy(q_id_col).orderBy(
                    F.desc("sim"), F.asc("cell_id")
                )
            ),
        )
        .filter(F.col("nth") <= nprobe)
        .select(q_id_col, q_vec_col, "cell_id")
    )
    cands = assigned.join(q_cells, "cell_id").where(
        F.col(id_col) != F.col(q_id_col)
    )
    scored = cands.select(
        q_id_col, id_col, cosine(F.col(q_vec_col), F.col(vec_col)).alias("cos")
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "rank", "cos")
    )
