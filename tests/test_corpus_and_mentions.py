"""Corpus generator invariants + trie mention detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from spinneret_spark.operators.mentions import detect_mentions_trie
from spinneret_spark.sources.corpusgen import generate_pages
from spinneret_spark.extract.htmltext import extract_text


def test_generated_pages_shape(spark):
    pages = generate_pages(spark, 50, include_reference_eml=False)
    assert pages.columns == ["page_id", "url", "warc_ts", "html", "text", "lang"]
    assert pages.count() == 50
    assert pages.select("url").distinct().count() == 50


def test_extraction_byte_identity(spark):
    """BASELINE.json:15 per-row invariant: extract(html) == text,
    byte-for-byte, for every generated page."""
    pages = generate_pages(spark, 120, include_reference_eml=False).toPandas()
    for _, row in pages.iterrows():
        assert extract_text(bytes(row["html"])) == row["text"], row["url"]


def test_generation_deterministic_across_partitionings(spark):
    a = generate_pages(spark, 40, include_reference_eml=False, num_partitions=1)
    b = generate_pages(spark, 40, include_reference_eml=False, num_partitions=7)
    pa = a.orderBy("page_id").toPandas()
    pb = b.orderBy("page_id").toPandas()
    assert (pa["url"] == pb["url"]).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(pa["html"], pb["html"]))


def test_near_dup_pages_exist(spark):
    pages = generate_pages(
        spark, 200, near_dup_fraction=0.2, include_reference_eml=False
    )
    n_dupish = pages.filter(F.col("url").contains("dup-farm")).count()
    assert 10 < n_dupish < 90


def test_trie_mentions_multiword_leftmost_longest(spark):
    docs = spark.createDataFrame(
        [(1, "deep table scan beats a table any day")],
        "doc_id long, text string",
    )
    out = (
        detect_mentions_trie(docs, ["table scan", "table", "scan"])
        .select(F.explode("mentions").alias("m"))
        .select("m.*")
        .toPandas()
    )
    got = list(zip(out["norm"], out["start"]))
    # leftmost-longest: "table scan" consumes positions 5-15; the later
    # bare "table" still matches
    assert ("table scan", 5) in got
    assert ("table", 24) in got
    assert ("scan", 11) not in got


def test_trie_mentions_case_insensitive_offsets(spark):
    docs = spark.createDataFrame(
        [(1, "Spark and SPARK and spark")], "doc_id long, text string"
    )
    out = (
        detect_mentions_trie(docs, ["spark"])
        .select(F.explode("mentions").alias("m"))
        .select("m.*")
        .toPandas()
    )
    assert list(out["norm"]) == ["spark"] * 3
    assert list(out["start"]) == [0, 10, 20]
    assert list(out["end"]) == [5, 15, 25]


def test_find_norms_matches_positional_find():
    """Property: for any text, the fast set path must equal the norms
    of the positional greedy scan (single-word dictionaries take the
    vectorized branch; mixed dictionaries fall back)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spinneret_spark.operators.mentions import DictMatcher

    single = DictMatcher(["spark", "table", "join", "a1"])
    mixed = DictMatcher(["spark", "table scan", "hash join part"])

    token = st.sampled_from(
        ["spark", "table", "scan", "hash", "join", "part", "a1", "Zz", "x"]
    )
    texts = st.lists(token, min_size=0, max_size=30).map(" ".join)

    @settings(max_examples=200, deadline=None)
    @given(texts)
    def check(text):
        for m in (single, mixed):
            assert m.find_norms(text) == {n for n, _, _ in m.find(text)}

    check()
