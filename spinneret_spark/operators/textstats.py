"""Text analysis operators: token stats, quality scoring, language-ID
heuristic, document fingerprinting. All pure built-in expressions —
no Python crossing — with exact DuckDB twins (integer arithmetic and
int/int divisions only, so values are engine-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spinneret_spark.functions.text import STOPWORDS, tokens


def token_stats(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_distinct, total_len, avg_token_len)."""
    toks = tokens(F.col(text_col))
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, v: a + v
    )
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        total_len.alias("total_len"),
        (total_len / F.size(toks)).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Length / stopword-ratio / repetition quality signals.

    ``rep_ratio`` (1 - distinct/total) is the cheap boilerplate
    detector; ``stop_ratio`` the cheap fluency detector. Ratios are
    int/int divisions — exact across engines.
    """
    toks = tokens(F.col(text_col))
    stop = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS]))
    )
    n = F.size(toks)
    return docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars_txt"),
        n.alias("n_tokens"),
        stop.alias("n_stopwords"),
        (stop / n).alias("stop_ratio"),
        (F.lit(1.0) - F.size(F.array_distinct(toks)) / n).alias("rep_ratio"),
    )


def langid_heuristic(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", lang_col: str = "lang",
                     threshold: float = 0.05) -> DataFrame:
    """Stopword-density language guess (en vs other).

    A deliberately simple, deterministic n-gram-family heuristic: the
    plumbing (score → argmax → compare to labeled lang) is what a real
    fastText-style classifier would slot into via a pandas UDF.
    """
    toks = tokens(F.col(text_col))
    stop = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS]))
    )
    score = stop / F.size(toks)
    predicted = F.when(score >= threshold, F.lit("en")).otherwise(F.lit("other"))
    return docs.select(
        F.col(id_col),
        F.col(lang_col).alias("lang"),
        score.alias("en_score"),
        predicted.alias("predicted"),
        (predicted == F.col(lang_col)).alias("is_match"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set (bag-of-words identity; robust to shuffling
    sentence order, the classic suffix-array-free near-dup screen)."""
    toks = tokens(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias(
            "fingerprint"
        ),
    )
