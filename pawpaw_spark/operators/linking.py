"""Entity linking: symbol mentions -> candidate match edges.

Blocking is MinHash/LSH over character 3-grams of the normalized name
(explode band hashes -> bucket equi-join: never an all-pairs join), then
a batched scorer (Jaro-Winkler + token Jaccard, Arrow batches) on the
candidates only. This is the north-star stage that pawpaw does not have
(BASELINE.json north_rule).

Scale: the bucket join is the only shuffle; hot buckets are capped the
same way as dedup.lsh_candidate_pairs. The scorer sees candidate pairs
only (<< n^2); it is pure numpy/python inside mapInPandas batches.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_MERSENNE = (1 << 61) - 1


def normalize_symbol(col):
    """casefold + strip separators: parse_config/parseConfig -> parseconfig."""
    return F.regexp_replace(F.lower(col), r"[^a-z0-9]", "")


def symbol_mentions(segments: DataFrame) -> DataFrame:
    """Distinct symbol surface forms from the segments table."""
    return (
        segments.filter(
            F.col("desc").isin("def_name", "class_name", "import_name", "call_name")
            & F.col("value").isNotNull()
        )
        .select(F.col("value").alias("name"))
        .distinct()
        .withColumn("norm", normalize_symbol(F.col("name")))
    )


def _char_ngrams(s: str, k: int = 3) -> list[str]:
    padded = f"^{s}$"
    if len(padded) <= k:
        return [padded]
    return [padded[i : i + k] for i in range(len(padded) - k + 1)]


def minhash_name_signatures(
    names: DataFrame, n_hashes: int = 32, seed: int = 7
) -> DataFrame:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_hashes, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_hashes, dtype=np.uint64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for norm in pdf["norm"].values:
                grams = set(_char_ngrams(str(norm)))
                x = np.array(
                    [
                        int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "little")
                        for g in grams
                    ],
                    dtype=np.uint64,
                )
                vals = (x[:, None] * a[None, :] + b[None, :]) % _MERSENNE
                sigs.append(vals.min(axis=0).astype(np.int64).tolist())
            yield pd.DataFrame({"name": pdf["name"], "norm": pdf["norm"], "sig": sigs})

    return names.mapInPandas(kernel, schema="name string, norm string, sig array<long>")


def candidate_pairs(
    sigs: DataFrame, bands: int = 8, max_bucket: int = 500,
    n_hashes: int | None = None,
) -> DataFrame:
    if n_hashes is None:  # probe only when the caller didn't know it —
        # a driver action that runs the signature kernel on a partition
        n_hashes = len(sigs.select("sig").first()["sig"])
    rpb = n_hashes // bands
    banded = sigs.select(
        "name",
        "norm",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.hash(F.slice("sig", i * rpb + 1, rpb)),
            )
        ).alias("band", "bucket"),
    )
    w = W.partitionBy("band", "bucket").orderBy("name")
    banded = (
        banded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_bucket)
        .drop("__rn")
    )
    a = banded.select(F.col("name").alias("a"), F.col("norm").alias("na"), "band", "bucket")
    b = banded.select(F.col("name").alias("b"), F.col("norm").alias("nb"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "na", "nb")
        .distinct()
    )


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - match_dist), min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3


def jaro_winkler(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4) -> float:
    j = _jaro(s1, s2)
    prefix = 0
    for c1, c2 in zip(s1, s2):
        if c1 != c2 or prefix == max_prefix:
            break
        prefix += 1
    return j + prefix * p * (1 - j)


def _token_jaccard(a: str, b: str) -> float:
    ta, tb = set(_char_ngrams(a, 2)), set(_char_ngrams(b, 2))
    if not ta and not tb:
        return 1.0
    return len(ta & tb) / len(ta | tb)


def score_pairs(cands: DataFrame, threshold: float = 0.82) -> DataFrame:
    """Batched scorer: 0.6*JaroWinkler(norm) + 0.4*bigramJaccard(norm)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scores = [
                0.6 * jaro_winkler(na, nb) + 0.4 * _token_jaccard(na, nb)
                for na, nb in zip(pdf["na"].values, pdf["nb"].values)
            ]
            out = pdf.assign(score=scores)
            out = out[out["score"] >= threshold]
            yield out[["a", "b", "score"]]

    return cands.mapInPandas(kernel, schema="a string, b string, score double")


def link_symbols(
    segments: DataFrame,
    threshold: float = 0.82,
    n_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """segments -> (a, b, score) match edges between symbol names."""
    mentions = symbol_mentions(segments)
    sigs = minhash_name_signatures(mentions, n_hashes=n_hashes)
    # n_hashes threaded through — no driver action before the score stage
    cands = candidate_pairs(sigs, bands=bands, n_hashes=n_hashes)
    return score_pairs(cands, threshold=threshold)


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str = "id",
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD 1995):
    candidate pairs = rows within ``window`` positions of each other in
    the TOTAL order ``(key, id)`` -> ``(id_a, id_b, d)`` with ``d`` the
    rank distance (1..window) and ``id_a`` the earlier row.

    The classic merge/purge complement to set-similarity blocking: a
    sort key built from domain knowledge (normalized name, zip+street
    prefix, ...) puts likely duplicates adjacent, and the pair count is
    EXACTLY ``n*w - w*(w+1)/2`` — linear in n, never quadratic,
    independent of key skew (ties don't widen the neighborhood; the id
    tiebreak keeps the order total so results are deterministic at any
    parallelism).

    Scale shape: a global rank WITHOUT a single-partition window —
    ``repartitionByRange`` on the sort key, a per-range-partition local
    row_number, and a metadata-sized per-partition count collect whose
    running offsets lift local ranks to global ones (the two-phase rank
    every distributed sort-rank uses).  The pair join is then a hash
    equi-join of ranks against rank+d for d in 1..w — each row appears
    in at most 2w joined rows.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    base = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(key_col).cast("string").alias("k"),
    ).repartitionByRange(F.col("k"), F.col("id"))
    # Persist so the offsets job and the rank join see the SAME sampled
    # range boundaries — RangePartitioner re-samples on recompute, so an
    # unpersisted frame could hand the two jobs DIFFERENT partitionings
    # and corrupt the global ranks (same hazard graph.py's node_index
    # documents). Handle attached via _attach_caches: bounded by
    # cached_scope / release_session_caches like every operator cache.
    part = base.withColumn("_pid", F.spark_partition_id()).persist()
    local = part.withColumn(
        "_lr",
        F.row_number().over(
            W.partitionBy("_pid").orderBy(F.col("k"), F.col("id"))
        ),
    )
    # metadata-sized: one row per shuffle partition
    counts = sorted(
        (r["_pid"], r["n"])
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    ranked = local.select(
        "id", "k",
        (F.col("_lr") + F.element_at(off_map, F.col("_pid")) - 1)
        .alias("rank"),
    )
    a = ranked.select(
        F.col("id").alias("id_a"), F.col("rank").alias("_ra")
    )
    b = ranked.select(
        F.col("id").alias("id_b"), F.col("rank").alias("_rb")
    )
    d = F.explode(F.sequence(F.lit(1), F.lit(window))).alias("d")
    out = (
        a.select("id_a", "_ra", d)
        .join(b, F.col("_rb") == F.col("_ra") + F.col("d"))
        .select("id_a", "id_b", "d")
    )
    from .dedup import _attach_caches

    return _attach_caches(out, [part])  # see dedup.cached_scope


def er_pair_metrics(
    pred: DataFrame,
    gold: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Pairwise entity-resolution quality -> ONE row
    ``(n_pred, n_gold, n_common, precision, recall, f1)``.

    The evaluation harness for the linking stage itself (the north
    rule's P/R >= 0.95 gate is exactly this computation): both inputs
    are match-pair tables, canonicalized to unordered distinct pairs
    (least/greatest + distinct — direction and duplicates can't skew
    the counts), intersected with one equi-join.  Counts are exact
    int64; the three ratios are single divisions of exact ints,
    round-6 (0.0 when the denominator is empty, the conventional
    convention).  Two shuffles (the distincts) + one join — at any
    scale the pair tables are the operator's own output size.
    """
    def canon(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.least(F.col(a_col), F.col(b_col)).alias("x"),
                F.greatest(F.col(a_col), F.col(b_col)).alias("y"),
            )
            .filter(F.col("x") != F.col("y"))
            .distinct()
        )

    p = canon(pred).persist()
    g = canon(gold).persist()
    n_pred = p.count()
    n_gold = g.count()
    n_common = p.join(g, ["x", "y"]).count()
    p.unpersist()
    g.unpersist()
    spark = pred.sparkSession
    prec = round(n_common / n_pred, 6) if n_pred else 0.0
    rec = round(n_common / n_gold, 6) if n_gold else 0.0
    f1 = (
        round(2 * n_common / (n_pred + n_gold), 6)
        if (n_pred + n_gold)
        else 0.0
    )
    return spark.createDataFrame(
        [(n_pred, n_gold, n_common, prec, rec, f1)],
        "n_pred long, n_gold long, n_common long, "
        "precision double, recall double, f1 double",
    )
