"""DSIR: Data Selection via Importance Resampling (Xie et al. 2023,
public — arXiv:2302.03169).

The published recipe for picking pretraining documents that LOOK LIKE a
small high-quality target set: featurize every document as a bag of
hashed n-grams (unigrams + bigrams into B buckets), fit two bag-of-
buckets unigram models — one on the target corpus, one on the raw
corpus — and weight each raw document by the log-likelihood ratio
``log w(x) = sum_b f_b(x) * (ln p_target[b] - ln p_raw[b])``. Selection
is then Gumbel-top-k over the weights, which draws k documents without
replacement with probability proportional to ``w`` (Vieira 2014) — here
with DETERMINISTIC hash-derived Gumbel noise, so the selection is a
pure function of (seed, doc_id) and reproducible across engines, reruns
and partitionings.

Everything is exact-count arithmetic + single IEEE divisions + ``ln``,
so a DuckDB oracle replays the numbers bit-for-bit (per-doc sums round
to 6 digits — float summation order varies with partitioning, the BM25
discipline). The gram hash is the repo's portable idiom: the first 8
hex digits of md5, ``F.conv(..., 16, 10)`` in Spark ==
``('0x' || substr(md5(g), 1, 8))::BIGINT`` in DuckDB.

Scale shape: featurization is one explode + one (id, bucket) count —
map-side combinable, no Python in the hot path. The two models are
B-row tables (B ~ 10^4): the log-ratio table BROADCASTS to the per-doc
join, so weighting a 100 TB raw corpus is one scan + one broadcast join
+ one per-doc aggregation, zero wide shuffles beyond the count. The
Gumbel top-k is a k-row total order (sort + limit, AQE-friendly).

Reference anchor: the reference engine has no data-selection surface —
this extends the training-data-pipeline suite (text.py, sampling.py)
the brief asks for beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pawpaw_spark.operators.text import _lower_tokens


def _grams(text_col):
    """Unigrams + space-joined bigrams of the shared tokenizer, one
    array column (order irrelevant — features are a bag)."""
    toks = _lower_tokens(text_col)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bi = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bi)


def bucket_col(gram_col, n_buckets: int):
    """Portable hash bucket of a gram string: first 8 md5 hex digits as
    an integer, mod ``n_buckets`` (nonnegative: conv of 8 hex digits is
    < 2^32)."""
    return (
        F.conv(F.substring(F.md5(gram_col), 1, 8), 16, 10).cast("long")
        % F.lit(int(n_buckets))
    )


def hashed_ngram_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
) -> DataFrame:
    """Per-document hashed-n-gram feature counts:
    ``(id, bucket, c)``. One explode + one count; empty docs vanish
    (zero features — DSIR weight undefined, like a zero-transition doc
    in the LM scorers)."""
    return (
        df.select(
            F.col(id_col),
            F.explode(_grams(F.col(text_col))).alias("__g"),
        )
        .select(id_col, bucket_col(F.col("__g"), n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("c"))
    )


def log_ratio_table(
    raw: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    alpha: float = 1.0,
) -> DataFrame:
    """The B-row model table ``(bucket, lr)`` with
    ``lr = ln((c_t + a) / (T_t + a*B)) - ln((c_r + a) / (T_r + a*B))``
    — add-alpha smoothed, so every bucket of the raw corpus has a
    finite ratio even when the target never hit it. Buckets absent
    from BOTH corpora are irrelevant (no raw doc can reference them).
    The two corpus totals are driver scalars (model metadata)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    rb = (
        hashed_ngram_buckets(raw, text_col, id_col, n_buckets)
        .groupBy("bucket")
        .agg(F.sum("c").alias("c_r"))
    )
    tb = (
        hashed_ngram_buckets(target, text_col, id_col, n_buckets)
        .groupBy("bucket")
        .agg(F.sum("c").alias("c_t"))
    )
    tot_r = rb.agg(F.sum("c_r")).collect()[0][0] or 0
    tot_t = tb.agg(F.sum("c_t")).collect()[0][0] or 0
    a, b = float(alpha), float(n_buckets)
    joined = rb.join(tb, "bucket", "full")
    return joined.select(
        "bucket",
        (
            F.log(
                (F.coalesce(F.col("c_t"), F.lit(0)) + F.lit(a))
                / F.lit(float(tot_t) + a * b)
            )
            - F.log(
                (F.coalesce(F.col("c_r"), F.lit(0)) + F.lit(a))
                / F.lit(float(tot_r) + a * b)
            )
        ).alias("lr"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    alpha: float = 1.0,
    digits: int = 6,
) -> DataFrame:
    """Per-raw-document importance weights:
    ``(id, n_feats, log_w)`` with ``log_w = sum_b f_b * lr_b`` rounded
    to ``digits`` and ``n_feats`` the total feature count (gram
    occurrences, unigrams + bigrams). High ``log_w`` = looks like the
    target corpus. One broadcast join (B-row ratio table) + one per-doc
    aggregation over the feature counts."""
    feats = hashed_ngram_buckets(raw, text_col, id_col, n_buckets)
    lr = log_ratio_table(
        raw, target, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets, alpha=alpha,
    )
    return (
        feats.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.round(F.sum(F.col("c") * F.col("lr")), digits).alias("log_w"),
        )
    )


def gumbel_topk(
    weights: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    weight_col: str = "log_w",
    seed: str = "dsir",
    digits: int = 6,
) -> DataFrame:
    """Deterministic Gumbel-top-k selection: draws ``k`` rows without
    replacement with probability proportional to ``exp(weight)``
    (Vieira 2014 — adding Gumbel noise to log-weights and taking the
    top k IS weighted sampling without replacement). The noise is
    ``g = -ln(-ln(u))`` with ``u = (h + 0.5) / 2^32`` and ``h`` the
    portable md5 hash of ``seed:id`` — u in (0,1) strictly, never a
    log-of-zero, and the whole draw replays in any engine with md5.
    Output: ``(id, <weight_col>, score)`` ordered by score desc, ties
    by id (engine-independent cutoff)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 32))
    score = F.round(F.col(weight_col) + (-F.log(-F.log(u))), digits)
    return (
        weights.select(id_col, weight_col, score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(int(k))
    )
