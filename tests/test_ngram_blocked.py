"""The blocked (block-pair numpy kernel) and join (inverted-index
self-join) plans of ngram_jaccard_pairs must be result-identical —
the blocked plan is the round-6 optimization that replaced the
Σ df² row-explosion shuffle; the join plan is its oracle-shaped
cross-check twin."""

import pytest

from spinneret_spark.operators.dedup import ngram_jaccard_pairs


def _rows(df):
    return sorted(
        (r["id_a"], r["id_b"], repr(r["jaccard"])) for r in df.collect()
    )


@pytest.mark.parametrize("hash_mode", ["md5", "xxhash"])
@pytest.mark.parametrize("max_bucket", [None, 50])
def test_blocked_matches_join(spark, hash_mode, max_bucket):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = _rows(
        ngram_jaccard_pairs(
            docs, 0.5, max_bucket=max_bucket, hash_mode=hash_mode,
            impl="join",
        )
    )
    got = _rows(
        ngram_jaccard_pairs(
            docs, 0.5, max_bucket=max_bucket, hash_mode=hash_mode,
            impl="blocked",
        )
    )
    assert got == want and got


def test_minhash_kernel_matches_expr(spark):
    from spinneret_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = sorted(
        tuple(r) for r in minhash_signatures(docs, impl="expr").collect()
    )
    got = sorted(
        tuple(r) for r in minhash_signatures(docs, impl="kernel").collect()
    )
    assert got == want and got


def test_blocked_string_ids_and_short_docs(spark):
    rows = [
        ("z-doc", "alpha beta gamma delta epsilon zeta"),
        ("a-doc", "alpha beta gamma delta epsilon eta"),
        ("m-doc", "totally different words here appear only once"),
        ("short", "two words"),
        ("empty", ""),
        ("nul", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    want = _rows(ngram_jaccard_pairs(docs, 0.3, max_bucket=None, impl="join"))
    got = _rows(
        ngram_jaccard_pairs(docs, 0.3, max_bucket=None, impl="blocked")
    )
    assert got == want and got
    # orientation: id_a < id_b lexicographically, like the join plan
    for id_a, id_b, _ in got:
        assert id_a < id_b
