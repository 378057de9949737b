"""Count-based bigram language model + perplexity scoring.

The CCNet-style corpus-quality signal (Wenzek et al. 2020, public):
train a small LM on the corpus (there a 5-gram KenLM on Wikipedia;
here a bigram model with add-k smoothing — the same signal shape
without the external toolchain), score every document by its average
per-transition negative log-likelihood, and filter/bucket on the
score. Low NLL = looks like the training corpus; high NLL =
boilerplate, codebook noise, wrong language.

Model: ``p(w2 | w1) = (c(w1,w2) + k) / (c(w1) + k·V)`` with ``c`` the
corpus counts, ``V`` the vocabulary size, ``k`` the add-k constant —
every probability is a single IEEE division of exact integer counts,
and a document's score is the mean of their ``ln``s, so the DuckDB
oracle reproduces the numbers; the mean is rounded (default 6 digits)
because float SUMMATION order varies with partitioning (magnitude
~1e-14 wobble against a 1e-6 grid — the same discipline as the BM25
scores).

Scale shape: training is one flatMap-free explode of consecutive-pair
arrays + two count aggregations (map-side partial combine); scoring is
one explode + one equi-join against the bigram table (hash-partitioned
by (w1,w2); the unigram side is vocabulary-sized — broadcast) + one
per-doc aggregation. ``min_count`` prunes the bigram tail so the join
table stays small at corpus scale (pruned pairs score as unseen, which
is exactly what add-k smoothing is for).

Tokens are :func:`pawpaw_spark.operators.text._lower_tokens` — the
same split every other text operator uses, so signals compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pawpaw_spark.operators.text import _lower_tokens


def _transitions(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per consecutive token pair: (id, w1, w2)."""
    toks = _lower_tokens(F.col(text_col))
    pair = F.explode(
        F.arrays_zip(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        )
    )
    return df.select(F.col(id_col), pair.alias("__p")).select(
        id_col,
        F.col("__p.0").alias("w1"),
        F.col("__p.1").alias("w2"),
    )


def bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame, int]:
    """Train the count model -> ``(unigrams, bigrams, vocab_size)``:
    ``unigrams`` = (w, c) total token occurrences, ``bigrams`` =
    (w1, w2, c) consecutive-pair counts with ``c >= min_count``,
    ``vocab_size`` = distinct-token count (a driver scalar — the
    vocabulary is metadata, not data)."""
    toks = df.select(
        F.explode(_lower_tokens(F.col(text_col))).alias("w")
    )
    unigrams = toks.groupBy("w").agg(F.count("*").alias("c"))
    vocab_size = unigrams.count()
    bigrams = (
        _transitions(df, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    if min_count > 1:
        bigrams = bigrams.filter(F.col("c") >= min_count)
    return unigrams, bigrams, vocab_size


def perplexity_score(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    vocab_size: int,
    *,
    k: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    digits: int = 6,
) -> DataFrame:
    """Score every document with >= 1 token transition:
    ``(id, n_transitions, avg_nll)`` where ``avg_nll`` is the mean
    add-k negative log-likelihood of its transitions, rounded to
    ``digits`` (see module doc for why). Unseen pairs and unseen
    context words fall back to counts of 0 — add-k keeps every
    probability strictly positive."""
    pairs = _transitions(docs, text_col, id_col)
    uni = unigrams.select(
        F.col("w").alias("w1"), F.col("c").alias("__c1")
    )
    bi = bigrams.select(
        "w1", "w2", F.col("c").alias("__c12")
    )
    scored = (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(F.broadcast(uni), ["w1"], "left")
        .select(
            id_col,
            (
                -F.log(
                    (F.coalesce(F.col("__c12"), F.lit(0)) + F.lit(k))
                    / (
                        F.coalesce(F.col("__c1"), F.lit(0))
                        + F.lit(k) * F.lit(float(vocab_size))
                    )
                )
            ).alias("__nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_transitions"),
        F.round(F.avg("__nll"), digits).alias("avg_nll"),
    )
