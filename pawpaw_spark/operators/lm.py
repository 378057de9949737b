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


def kn_stats(bigrams: DataFrame) -> tuple[DataFrame, DataFrame, int]:
    """Kneser-Ney sufficient statistics from the bigram count table:
    ``ctx`` = per-context (w1, c1=sum of pair counts, n_follow=distinct
    continuations), ``cont`` = per-word (w2, n_prec=distinct preceding
    contexts), plus the total bigram TYPE count (a driver scalar — the
    model's normalizer, not data). Context counts come from the bigram
    table, not the unigram table, so ``sum_w2 p(w2|w1) = 1`` exactly
    (the unigram count exceeds the context count by one per document-
    final token). Two aggregations over the (already small) bigram
    count table; no pass over the corpus."""
    ctx = bigrams.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count("*").alias("n_follow")
    )
    cont = bigrams.groupBy(F.col("w2").alias("w")).agg(
        F.count("*").alias("n_prec")
    )
    n_types = bigrams.count()
    return ctx, cont, n_types


def kneser_ney_score(
    docs: DataFrame,
    bigrams: DataFrame,
    *,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    digits: int = 6,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen
    & Goodman 1999 eq. 4.25-4.27) -> ``(id, n_transitions, avg_nll)``.

    ``p(w2|w1) = (max(c(w1,w2) - D, 0) + D·N1+(w1,·)·p_cont(w2)) / c(w1)``
    with ``p_cont(w2) = N1+(·,w2) / N1+(·,·)`` — the continuation
    probability counts the distinct contexts a word FOLLOWS, which is
    what makes KN the empirical best of the count smoothers: a word
    frequent only inside one collocation ("francisco") gets low unseen-
    context mass. Single-division form, so the DuckDB oracle reproduces
    the IEEE doubles bit-for-bit; the per-doc mean rounds to ``digits``
    (summation-order wobble, the BM25 discipline).

    Fallbacks (never hit when scoring the training corpus itself, where
    every transition was counted): unseen context w1 -> ``p_cont(w2)``;
    a word unseen as a continuation -> ``1 / N1+(·,·)`` (one type's
    worth of continuation mass) so every probability stays positive.
    ``0 < D < 1`` is required: the discounted mass ``c12 - D >= 1 - D``
    of a seen pair stays positive, and lambda stays a proper fraction.

    Scale shape: one transitions explode + one (w1,w2) equi-join (hash-
    partitioned on the pair) + two vocabulary-sized broadcast joins +
    one per-doc aggregation — identical to :func:`perplexity_score`
    plus one broadcast."""
    if not (0.0 < discount < 1.0):
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    ctx, cont, n_types = kn_stats(bigrams)
    if n_types == 0:
        raise ValueError("empty bigram table: nothing to smooth")
    pairs = _transitions(docs, text_col, id_col)
    bi = bigrams.select("w1", "w2", F.col("c").alias("__c12"))
    d = F.lit(float(discount))
    pcont = F.coalesce(
        F.col("n_prec") / F.lit(float(n_types)),
        F.lit(1.0 / float(n_types)),
    )
    p = F.when(
        F.col("c1").isNotNull(),
        (
            F.greatest(F.coalesce(F.col("__c12"), F.lit(0)) - d, F.lit(0.0))
            + d * F.col("n_follow") * pcont
        )
        / F.col("c1"),
    ).otherwise(pcont)
    scored = (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(F.broadcast(ctx), ["w1"], "left")
        .join(
            F.broadcast(cont.withColumnRenamed("w", "w2")), ["w2"], "left"
        )
        .select(id_col, (-F.log(p)).alias("__nll"))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_transitions"),
        F.round(F.avg("__nll"), digits).alias("avg_nll"),
    )
