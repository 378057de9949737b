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
  text column. For repeated querying at scale, persist ``tokenize()``'s
  output once (or materialize an inverted index via
  ``text.vocab_topk``-style gram tables) and both passes ride it.

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
