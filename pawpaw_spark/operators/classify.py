"""Multinomial Naive Bayes text classification over hashed n-gram
features — the quality/domain/language *classifier filter* slot of a
training-data pipeline (CCNet trains a fastText langid+quality model,
Wenzek et al. 2020; the LLaMA corpus quality filter is the same
linear-over-hashed-ngrams shape).

Why Naive Bayes and not SGD here: training is ONE exact-integer
aggregation over the labeled corpus (per-(label, bucket) gram counts +
per-label totals) — no gradient loop, no float accumulation across
rounds, bit-reproducible at any partitioning — and at inference the
model is a (labels x n_buckets)-bounded table that BROADCASTS, so
scoring is one map-side join over the exploded gram stream no matter
the corpus size.  NB with hashed unigram+bigram features is the
standard strong baseline fastText itself is benchmarked against
(Joulin et al. 2017 compare directly to "h-NB": hashed Naive Bayes).

Features reuse the DSIR hashing convention (:func:`dsir._grams`
unigrams + space-joined bigrams of the shared ``[^0-9a-z_]+``
tokenizer, :func:`dsir.bucket_col` first-8-md5-hex-digits mod
``n_buckets``) so the oracle replay and cross-engine portability
arguments carry over verbatim.

Determinism: sufficient statistics are exact int64; per-(doc, label)
scores are one float dot product ``sum c_b * (ln(n_lb + 1) -
ln(T_l + V))`` plus the ``ln`` prior — rounded to 6 decimals before
the argmax (the lm_perplexity/bm25 convention against summation-order
wobble), ties broken label-ascending, so predictions are stable across
partitionings and engines.

Scale shape: train = one explode (corpus-linear) + one two-level
partial-combine aggregation into a metadata-sized model; predict = one
explode + broadcast model join + one (id, label) aggregation + one
per-doc window over |labels| rows.  No driver collection, no loops.

Reference parity: none — the reference emits segments/triples and
stops; this extends the beyond-parity training-data surface
(text.py, dsir.py, lm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pawpaw_spark.operators.dsir import _grams, bucket_col


def nb_train(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = 4096,
) -> tuple[DataFrame, DataFrame]:
    """Train: returns ``(counts, priors)`` — ``counts`` =
    (label, bucket, n) hashed-gram counts, ``priors`` =
    (label, n_docs, n_tokens) per-label document and gram totals.
    Both are exact int64 aggregations; together they are the whole
    model (bounded by |labels| x (n_buckets + 1) rows)."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    g = df.select(
        F.col(label_col).alias("label"),
        F.explode(_grams(F.col(text_col))).alias("g"),
    ).select("label", bucket_col(F.col("g"), n_buckets).alias("bucket"))
    # the model is |labels| x n_buckets bounded METADATA — checkpoint it
    # eagerly so the corpus-scale gram explode runs ONCE, not once per
    # lazy consumer (n_tokens agg + every predict join); localCheckpoint
    # rather than persist so harness cache-release sweeps can't silently
    # reintroduce the recompute (the _call_edges discipline)
    counts = g.groupBy("label", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).localCheckpoint(eager=True)
    tok = counts.groupBy("label").agg(F.sum("n").cast("long").alias("n_tokens"))
    docs = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    priors = docs.join(tok, "label", "left").fillna(0, subset=["n_tokens"])
    return counts, priors


def nb_scores(
    df: DataFrame,
    counts: DataFrame,
    priors: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-(doc, label) add-1-smoothed log-posterior scores ->
    (``id_col``, label, score) with score already rounded to 6
    decimals.  Every document scores against EVERY label (docs whose
    text yields no grams score on the prior alone), so the argmax in
    :func:`nb_predict` is total."""
    total_docs = priors.select(F.sum("n_docs").alias("td"))
    pri = (
        priors.crossJoin(F.broadcast(total_docs))
        .select(
            "label",
            "n_tokens",
            (F.log(F.col("n_docs").cast("double")) - F.log(F.col("td").cast("double"))).alias("ln_prior"),
        )
    )
    feats = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(_grams(F.col(text_col))).alias("g"),
        )
        .select("__id", bucket_col(F.col("g"), n_buckets).alias("bucket"))
        .groupBy("__id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # every (doc, label) cell exists even when the doc has no grams
    cells = df.select(F.col(id_col).alias("__id")).distinct().crossJoin(
        F.broadcast(pri.select("label"))
    )
    term = F.col("c") * (
        F.log(F.coalesce(F.col("n"), F.lit(0)).cast("double") + F.lit(1.0))
        - F.log(F.col("n_tokens").cast("double") + F.lit(float(n_buckets)))
    )
    tok_scores = (
        feats.crossJoin(F.broadcast(pri))
        .join(F.broadcast(counts), ["label", "bucket"], "left")
        .select("__id", "label", term.alias("term"))
        .groupBy("__id", "label")
        .agg(F.sum("term").alias("s"))
    )
    return (
        cells.join(tok_scores, ["__id", "label"], "left")
        .join(F.broadcast(pri.select("label", "ln_prior")), "label")
        .select(
            F.col("__id").alias(id_col),
            "label",
            F.round(F.coalesce(F.col("s"), F.lit(0.0)) + F.col("ln_prior"), 6).alias(
                "score"
            ),
        )
    )


def nb_predict(
    df: DataFrame,
    counts: DataFrame,
    priors: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    out_col: str = "pred_label",
) -> DataFrame:
    """Argmax over :func:`nb_scores` -> (``id_col``, ``out_col``,
    score).  Total order (score DESC, label ASC) on the round-6 scores
    — deterministic at any partitioning and across engines."""
    s = nb_scores(df, counts, priors, text_col, id_col, n_buckets)
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("label"))
    return (
        s.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(id_col, F.col("label").alias(out_col), "score")
    )
