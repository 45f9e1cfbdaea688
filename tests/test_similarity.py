"""Similarity-search tests: deterministic k-means bit-exactness vs
DuckDB, IVF recall against brute-force ground truth, and the
no-cartesian plan contract for blocked embedding dedup (VERDICT r1
items 2-3)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from spinneret_spark.operators.dedup import embedding_near_dup_pairs
from spinneret_spark.operators.similarity import (
    assign_cells,
    brute_force_topk,
    ivf_topk,
    kmeans_fit,
)
from spinneret_spark.plans import has_cartesian

SF = "/root/testdata/sf0.001"
K, ITERS = 8, 2


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    yield df
    df.unpersist()  # keep the cached scan out of other modules' plans


def test_kmeans_bit_exact_vs_duckdb(spark, emb):
    """The trained centroids must be BIT-IDENTICAL to the DuckDB twin
    (ordered float64 folds pin the addition order on both engines)."""
    import __spark_entry__ as entry

    got = sorted(
        (r["cell_id"], list(r["cell_vec"]))
        for r in kmeans_fit(emb, K, ITERS).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    want = con.sql(
        f"WITH {entry._kmeans_sql(K, ITERS)} "
        f"SELECT cell_id, cell_vec FROM c{ITERS} ORDER BY cell_id"
    ).fetchall()
    assert len(got) == len(want) == K
    for (gc, gv), (wc, wv) in zip(got, want):
        assert gc == wc
        assert gv == list(wv)  # exact equality, not approx


def test_kmeans_improves_inertia(spark, emb):
    """Lloyd iterations must not worsen the clustering: mean best-
    cosine after 2 iterations >= after 0 (init centroids)."""
    from spinneret_spark.functions.vectors import cosine

    def mean_best_cos(cents):
        scored = emb.crossJoin(F.broadcast(cents)).select(
            "vec_id", cosine(F.col("embedding"), F.col("cell_vec")).alias("c")
        )
        best = scored.groupBy("vec_id").agg(F.max("c").alias("b"))
        return best.agg(F.avg("b")).first()[0]

    init = kmeans_fit(emb, K, iters=0)
    trained = kmeans_fit(emb, K, iters=ITERS)
    assert mean_best_cos(trained) >= mean_best_cos(init) - 1e-12


def test_ivf_recall_vs_brute_force(spark, emb):
    """recall@5 of trained-centroid IVF (nprobe=2) vs exact top-5."""
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = {
        (r["q_id"], r["vec_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    cents = kmeans_fit(emb, K, ITERS)
    got = {
        (r["q_id"], r["vec_id"])
        for r in ivf_topk(emb, queries, cents, k=5, nprobe=2).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, f"recall@5 {recall:.2f} below floor"


def test_blocked_dedup_plan_has_no_cartesian(spark, emb):
    """The blocked pair join must be an equi-join, never a cross join;
    the brute-force baseline (contrast) is a cross join. The centroid
    lineage is checkpointed away so the assertion targets the pair
    join itself (the k-row centroid argmax upstream is a deliberate
    broadcast cross, linear in the corpus)."""
    cents = kmeans_fit(emb, K, ITERS)
    assigned = assign_cells(emb, cents).join(emb, "vec_id").localCheckpoint()
    blocked = embedding_near_dup_pairs(
        assigned, threshold=0.4, block_col="cell_id"
    )
    assert not has_cartesian(blocked)
    baseline = embedding_near_dup_pairs(emb, threshold=0.4)
    assert has_cartesian(baseline)


def test_blocked_pairs_subset_of_brute_force(spark, emb):
    """Blocking loses cross-cell pairs but must never invent one."""
    cents = kmeans_fit(emb, K, ITERS)
    blocked = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            assign_cells(emb, cents).join(emb, "vec_id"),
            threshold=0.4,
            block_col="cell_id",
        ).collect()
    }
    full = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    assert blocked <= full
    assert blocked, "blocking found nothing — fixture or k too degenerate"


def test_multiprobe_recall_between_blocked_and_full(spark, emb):
    """nprobe=2 blocking must dominate nprobe=1 and stay a subset of
    the exhaustive pair set."""
    from spinneret_spark.operators.similarity import assign_cells_multi

    cents = kmeans_fit(emb, K, ITERS)
    single = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            assign_cells(emb, cents).join(emb, "vec_id"),
            threshold=0.4,
            block_col="cell_id",
        ).collect()
    }
    multi = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            assign_cells_multi(emb, cents, nprobe=2).join(emb, "vec_id"),
            threshold=0.4,
            block_col="cell_id",
        ).distinct().collect()
    }
    full = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    assert single <= multi <= full
    assert len(multi) > len(single), "nprobe=2 found no extra pairs"


def test_kmeans_scalable_fold_agrees_with_exact(spark, emb):
    """exact_fold=False (corpus-scale: commutative avg, no member-list
    row) must produce the same CLUSTERING as the oracle-exact ordered
    fold — centroids differ only by float reassociation, so cell
    assignments agree on non-degenerate data; and its plan must carry
    no collect_list over members."""
    fast_lazy = kmeans_fit(emb, K, ITERS, exact_fold=False)
    # the k×dim-bounded vector-reassembly collect_list remains (one per
    # iteration, list length = dim); the MEMBER-list collect per
    # (cell, pos) must be gone — so the fast plan has strictly fewer
    # collect_list aggregates than the exact plan
    def n_collects(df):
        return df._jdf.queryExecution().executedPlan().toString().count(
            "collect_list"
        )

    exact_lazy = kmeans_fit(emb, K, ITERS)
    assert n_collects(fast_lazy) < n_collects(exact_lazy)

    exact = exact_lazy.localCheckpoint()
    fast = fast_lazy.localCheckpoint()
    a = {r["vec_id"]: r["cell_id"] for r in assign_cells(emb, exact).collect()}
    b = {r["vec_id"]: r["cell_id"] for r in assign_cells(emb, fast).collect()}
    agree = sum(a[i] == b[i] for i in a) / len(a)
    assert agree >= 0.95, f"assignment agreement {agree:.2f}"


def test_ivf_recall_monotone_in_nprobe(spark, emb):
    """The recall/cost dial must actually be a dial: recall@5 is
    non-decreasing in nprobe, and at nprobe=K (probe every cell) IVF
    degenerates to the exact brute-force ranking — not just recall
    1.0 but the identical (q_id, vec_id, rank) rows, since both paths
    share the rerank and the (cos desc, id asc) tiebreak."""
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = {
        (r["q_id"], r["vec_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    cents = kmeans_fit(emb, K, ITERS).localCheckpoint()
    recalls = []
    for nprobe in (1, 2, 4):
        got = {
            (r["q_id"], r["vec_id"])
            for r in ivf_topk(emb, queries, cents, k=5, nprobe=nprobe).collect()
        }
        recalls.append(len(got & truth) / len(truth))
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"

    exact_rows = {
        (r["q_id"], r["vec_id"], r["rank"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    full_probe = {
        (r["q_id"], r["vec_id"], r["rank"])
        for r in ivf_topk(emb, queries, cents, k=5, nprobe=K).collect()
    }
    assert full_probe == exact_rows


def test_kmeans_sampled_fit_keeps_ivf_recall(spark, emb):
    """VERDICT r3 item 3: the 100 TB path fits the coarse quantizer on
    a deterministic sample, never iterating Lloyd's over the full
    corpus. Centroids from a 20% fit must still give IVF recall@5 at
    the established floor, produce k cells, and provably train on
    fewer rows."""
    from spinneret_spark.operators.curation import sample_gate

    frac = 0.2
    sampled_n = emb.where(
        sample_gate(F.col("vec_id").cast("string"), frac)
    ).count()
    assert K <= sampled_n < emb.count()  # the fit input really shrank

    cents = kmeans_fit(emb, K, ITERS, fit_fraction=frac)
    assert cents.count() == K

    queries = (
        emb.orderBy("vec_id").limit(5)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    truth = {
        (r["q_id"], r["vec_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    got = {
        (r["q_id"], r["vec_id"])
        for r in ivf_topk(emb, queries, cents, k=5, nprobe=2).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, f"recall@5 {recall:.2f} below floor (sampled fit)"

    # determinism: the sampled fit is a pure function of the data
    again = kmeans_fit(emb, K, ITERS, fit_fraction=frac)
    a = sorted((r["cell_id"], list(r["cell_vec"])) for r in cents.collect())
    b = sorted((r["cell_id"], list(r["cell_vec"])) for r in again.collect())
    assert a == b


def test_rerank_candidates_max_by_and_tiebreak(spark):
    """linking.rerank_candidates: one hash aggregation (no Window over
    the candidate set), best candidate per mention by cosine, exact
    score ties broken to the higher subject_id — deterministic."""
    import re

    from spinneret_spark.operators.linking import rerank_candidates

    rows = [
        # mention 1: candidate 20 clearly best
        (1, [1.0, 0.0], 10, [0.0, 1.0]),
        (1, [1.0, 0.0], 20, [1.0, 0.0]),
        # mention 2: candidates 30 and 40 tie EXACTLY (same vector);
        # the higher id must win
        (2, [0.5, 0.5], 30, [1.0, 1.0]),
        (2, [0.5, 0.5], 40, [1.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows,
        "m_id int, mention_vec array<double>, subject_id int, "
        "cand_vec array<double>",
    )
    got = {
        r["m_id"]: r["subject_id"]
        for r in rerank_candidates(df, ["m_id"]).collect()
    }
    assert got == {1: 20, 2: 40}
    plan = (
        rerank_candidates(df, ["m_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert not re.findall(r"\bWindow \[", plan)


def test_blocked_composition_deployment_surface(spark, emb):
    """dedup.blocked_embedding_near_dup_pairs (the --dedup-embeddings
    CLI path): fit→assign→within-cell pairs in one call. Pairs must be
    a nonempty subset of brute force, the plan cartesian-free, and the
    sampled fit (--fit-fraction) deterministic."""
    from spinneret_spark.operators.dedup import (
        blocked_embedding_near_dup_pairs,
    )

    full = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    for frac in (1.0, 0.5):
        pairs = blocked_embedding_near_dup_pairs(
            emb, threshold=0.4, k=K, iters=ITERS, fit_fraction=frac
        )
        assert not has_cartesian(pairs)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert got and got <= full, f"fit_fraction={frac}"
        again = {
            (r["id_a"], r["id_b"])
            for r in blocked_embedding_near_dup_pairs(
                emb, threshold=0.4, k=K, iters=ITERS, fit_fraction=frac
            ).collect()
        }
        assert got == again  # pure function of the data
