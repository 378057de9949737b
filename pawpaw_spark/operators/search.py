"""Keyword search / relevance ranking over document corpora.

Okapi BM25 (Robertson et al., public formula) expressed as pure column
arithmetic — the retrieval primitive a training-data pipeline uses for
corpus curation: pulling topical slices, scoring decontamination
candidates, building eval retrieval sets.

Scale notes (100 TB):
- Per-term term frequencies are array filters over the tokenized text
  (``F.filter`` inside whole-stage codegen) — no explode, no per-term
  shuffle, no Python. A q-term query adds q counters to ONE scan.
- Corpus statistics (N, Σdl, per-term document frequency) are a single
  1-row aggregate broadcast back onto the scan; document lengths sum
  as integers so the statistics — and therefore every downstream
  float — are bit-identical regardless of partitioning.
- Two passes over the corpus total (stats + score), both pruned to the
  text column. For repeated querying at scale,
  :func:`build_inverted_index` materializes postings once and
  :func:`bm25_scores_from_index` reads only the query terms' partitions.

The reference engine has no retrieval scorer; this extends the
training-pipeline surface (SURVEY.md "beyond the reference" §).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize(text_col: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped (mirrors Python
    ``str.split()`` and the dedup shingle tokenizer)."""
    return F.filter(
        F.split(F.lower(text_col), r"\s+"), lambda t: t != F.lit("")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against ``query_terms`` with Okapi BM25.

    Returns (``id_col``, ``dl``, ``score``) for documents matching at
    least one term. idf is the standard
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` (always positive), and the
    per-term contribution ``idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``.

    Determinism: tf/dl/df/N are integer counts and Σdl an integer sum,
    so ``avgdl`` and every score are fixed scalar float64 expressions —
    reproducible across partitionings and engines (the contract oracle
    recomputes them in DuckDB with the same expression tree).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    base = df.select(
        F.col(id_col),
        tokenize(F.col(text_col)).alias("toks"),
    ).withColumn("dl", F.size("toks").cast("long"))
    def _eq(term):
        # closure, NOT a default arg: a 2-param lambda would be treated
        # by F.filter as the (element, index) form
        return lambda t: t == F.lit(term)

    for i, term in enumerate(query_terms):
        base = base.withColumn(
            f"tf_{i}", F.size(F.filter(F.col("toks"), _eq(term))).cast("long")
        )
    base = base.drop("toks")

    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.join(F.broadcast(stats))  # 1-row broadcast, no shuffle
    n = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl") / F.col("n_docs")
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        tf = F.col(f"tf_{i}").cast("double")
        dfreq = F.col(f"df_{i}").cast("double")
        idf = F.log(F.lit(1.0) + (n - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5)))
        contrib = idf * (
            (tf * F.lit(k1 + 1.0))
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl)))
        )
        score = score + contrib
    matched = F.lit(False)
    for i in range(len(query_terms)):
        matched = matched | (F.col(f"tf_{i}") > 0)
    return (
        scored.filter(matched)
        .select(F.col(id_col), F.col("dl"), score.alias("score"))
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score; ties broken by ``id_col`` so the
    result is deterministic. A global top-k is a driver-side heap over
    partition-local top-ks (Spark's ``orderBy().limit(k)`` — TakeOrdered,
    no full sort shuffle)."""
    scored = bm25_scores(df, query_terms, text_col, id_col, k1, b)
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# Inverted index: the at-rest scale path for repeated querying
# ---------------------------------------------------------------------------


def build_inverted_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> None:
    """Materialize the corpus as a BM25-ready inverted index:

    - ``<path>/postings`` — one row per (token, doc, tf, dl), written
      partitioned by ``tok_bucket = crc32(token) % n_buckets`` so a
      q-term query prunes the scan to at most q partitions of the
      postings table instead of re-tokenizing the corpus;
    - ``<path>/tokens`` — per-token document frequency (the idf side);
    - ``<path>/meta`` — one row: N docs and Σdl.

    ``bm25_scores`` re-reads the whole corpus per query (fine for one
    sweep); this trades one indexing shuffle for per-query cost
    proportional to the QUERY TERMS' postings — the 100 TB shape for a
    curation workload that issues many retrievals. Bucketing by token
    hash instead of ``partitionBy(token)`` keeps the file count fixed
    (a web vocabulary has tens of millions of distinct tokens).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokenize(F.col(text_col)).alias("toks"),
    ).withColumn("dl", F.size("toks").cast("long"))
    postings = (
        toks.select("doc_id", "dl", F.explode("toks").alias("token"))
        .groupBy("token", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("tok_bucket", F.crc32(F.col("token")) % n_buckets)
    )
    postings.write.mode("overwrite").partitionBy("tok_bucket").parquet(
        f"{path}/postings"
    )
    spark = df.sparkSession
    spark.read.parquet(f"{path}/postings").groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    ).write.mode("overwrite").parquet(f"{path}/tokens")
    toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).withColumn("n_buckets", F.lit(n_buckets).cast("long")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/meta")


def bm25_scores_from_index(
    spark,
    path: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 over a :func:`build_inverted_index` — reads only the query
    terms' postings partitions (``tok_bucket`` pruned at the scan,
    token equality inside them), never the corpus text.

    Bit-identical to ``bm25_scores`` on the same corpus: per-term
    contributions are pivoted into fixed columns ((token, doc) is
    unique, so each pivot cell is a single value, not a float
    reassociation) and added in query order — the same float64 tree.

    The bucket count comes from the ``meta`` sidecar, not the caller —
    re-deriving it with a different modulus would silently prune every
    posting away (same guard as the MinHash index sidecar).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    import zlib

    n_buckets = int(spark.read.parquet(f"{path}/meta").first()["n_buckets"])
    buckets = sorted({zlib.crc32(t.encode()) % n_buckets for t in query_terms})
    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("tok_bucket").isin(buckets))
        .filter(F.col("token").isin(list(query_terms)))
    )
    tokens = spark.read.parquet(f"{path}/tokens").filter(
        F.col("token").isin(list(query_terms))
    )
    meta = spark.read.parquet(f"{path}/meta")
    rows = (
        postings.join(F.broadcast(tokens), "token")
        .join(F.broadcast(meta))
    )
    n = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl") / F.col("n_docs")
    dfreq = F.col("df").cast("double")
    tf = F.col("tf").cast("double")
    idf = F.log(F.lit(1.0) + (n - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5)))
    contrib = idf * (
        (tf * F.lit(k1 + 1.0))
        / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl)))
    )
    per_term = (
        rows.groupBy("doc_id", "dl")
        .pivot("token", list(query_terms))
        .agg(F.first(contrib))
        # positional rename: pivot names columns after the raw token
        # text, which need not be a safe identifier
        .toDF("doc_id", "dl", *[f"c_{i}" for i in range(len(query_terms))])
    )
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        score = score + F.coalesce(F.col(f"c_{i}"), F.lit(0.0))
    return per_term.select("doc_id", "dl", score.alias("score"))
