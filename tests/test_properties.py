"""Hypothesis property tests for the pure-Python kernels (no Spark):
extractor idempotence/determinism, DictMatcher vs a naive reference,
MinHash Jaccard estimation accuracy."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from spinneret_spark.extract.htmltext import extract_text
from spinneret_spark.functions.hashing import MINHASH_PARAMS, MERSENNE_P
from spinneret_spark.operators.mentions import DictMatcher

_words = st.lists(
    st.sampled_from(
        ["spark", "table", "scan", "kelp", "ocean", "data", "the", "x1"]
    ),
    min_size=0,
    max_size=30,
)

_html_bits = st.lists(
    st.sampled_from(
        [
            "<p>",
            "</p>",
            "<div>",
            "</div>",
            "<script>junk()</script>",
            "<style>a{}</style>",
            "<b>",
            "</b>",
            "plain words here",
            "&amp;",
            "ocean water",
            "  spaced   out  ",
            "<nav>menu</nav>",
        ]
    ),
    min_size=0,
    max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(_html_bits)
def test_extract_idempotent_and_deterministic(bits):
    html = "".join(bits)
    once = extract_text(html)
    assert extract_text(html) == once  # deterministic
    assert extract_text(once) == once  # idempotent


@settings(max_examples=200, deadline=None)
@given(_words)
def test_dictmatcher_equals_regex_reference(words):
    text = " ".join(words)
    terms = ["spark", "table scan", "ocean water", "table", "data"]
    got = DictMatcher(terms).find(text)
    # reference: longest-first regex union, leftmost-longest
    ordered = sorted(terms, key=len, reverse=True)
    pat = re.compile(
        r"\b(" + "|".join(re.escape(t) for t in ordered) + r")\b", re.I
    )
    want = [(m.group(0).lower(), m.start(), m.end()) for m in pat.finditer(text)]
    assert got == want


@settings(max_examples=50, deadline=None)
@given(
    st.sets(st.integers(0, 500), min_size=5, max_size=120),
    st.sets(st.integers(0, 500), min_size=5, max_size=120),
)
def test_minhash_estimates_jaccard(sa, sb):
    """E[matching minhash fraction] = J(A,B); with k=16 we assert a
    loose deterministic bound via the fixed seeded permutations."""

    def sig(items):
        out = []
        for a, b in MINHASH_PARAMS:
            out.append(min((a * (x % MERSENNE_P) + b) % MERSENNE_P for x in items))
        return out
    true_j = len(sa & sb) / len(sa | sb)
    est = sum(x == y for x, y in zip(sig(sa), sig(sb))) / len(MINHASH_PARAMS)
    assert abs(est - true_j) <= 0.45  # k=16 → wide but bounded
