"""Similarity search over embedding columns.

* ``cosine_topk``      — brute-force exact top-k: one scan, JVM-side
  dot product (zip_with/aggregate), no shuffle until the final top-k.
* ``lsh_topk``         — random-hyperplane LSH bucketing: candidates
  share a sign-pattern bucket (with multi-probe on query side), exact
  re-rank inside buckets. The 100-TB path: the scan prunes to matching
  buckets instead of reading every vector.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine to a constant query vector (broadcast as a
    literal array — evaluated inside whole-stage codegen)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        emb.select(F.col(id_col).alias("id"), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float)


def with_lsh_bucket(
    emb: DataFrame,
    planes: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Sign-pattern bucket id from the fixed hyperplane family — a pure
    column expression (sum of bit-shifted signs of dot products)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(_dot(F.col(vec_col), plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return emb.withColumn(out_col, bucket)


def probe_buckets_for(
    query_vec: list[float], planes: np.ndarray, n_probe: int
) -> list[int]:
    """Multiprobe bucket sequence: the query's own bucket plus the
    n_probe buckets cheapest to reach by flipping hyperplane signs,
    ranked by total flipped |margin| (the standard multiprobe-LSH
    ordering). For small plane counts every mask is ranked exactly;
    beyond 12 planes the ranking covers all 1- and 2-flip masks (the
    useful probe set — a 3-flip bucket is practically never cheaper
    than an unprobed 2-flip one)."""
    q = np.asarray(query_vec, dtype=float)
    margins = planes @ q
    p = len(planes)
    base = sum((1 << i) for i, m in enumerate(margins) if m >= 0)
    am = np.abs(margins)
    if p <= 12:
        masks = np.arange(1 << p)
        costs = [(am[[i for i in range(p) if m >> i & 1]].sum(), int(m)) for m in masks]
    else:
        order = np.argsort(am)
        costs = [(0.0, 0)]
        costs += [(float(am[i]), 1 << int(i)) for i in order]
        costs += [
            (float(am[order[i]] + am[order[j]]), (1 << int(order[i])) | (1 << int(order[j])))
            for i in range(min(p, 24)) for j in range(i + 1, min(p, 24))
        ]
    costs.sort()
    return [base ^ m for _, m in costs[: n_probe + 1]]


def lsh_topk(
    emb_with_bucket: DataFrame,
    query_vec: list[float],
    planes: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: probe the query's bucket plus its n_probe cheapest
    multiprobe neighbors (ranked bit-flip masks over the plane margins),
    exact cosine re-rank inside the probed buckets."""
    q = np.asarray(query_vec, dtype=float)
    probe_buckets = probe_buckets_for(query_vec, planes, n_probe)

    qcol = F.array(*[F.lit(float(x)) for x in q])
    qn = float(np.sqrt(q @ q))
    cos = _dot(F.col(vec_col), qcol) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        emb_with_bucket.filter(F.col("bucket").isin(probe_buckets))
        .select(F.col(id_col).alias("id"), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )


def _assign_udf(centroids: np.ndarray):
    """Nearest-centroid assignment as an Arrow-batched numpy matmul.

    NOT a codegen column expression on purpose: k x dim literal arrays
    (512 literals at 8x64) cost seconds of plan compilation per
    distinct centroid matrix — every k-means iteration is a new matrix,
    so the compile bill repeats. The UDF ships the matrix in its
    closure and each batch is one (n, d) @ (d, k) product."""
    mat = np.asarray(centroids, dtype=float)

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        M = np.array(v.tolist(), dtype=float)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ mat.T, axis=1).astype("int32"))

    return assign


def ivf_fit(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantize: int | None = None,
) -> np.ndarray:
    """Spherical k-means for the IVF index: assignment runs distributed
    (argmax of centroid dot products, JVM-side), the centroid update is
    a (cluster, dim)-keyed sum — n_centroids x dim rows, metadata-sized
    no matter the corpus. Init = first n_centroids vectors by id-hash
    order (deterministic, spread by the hash).

    ``quantize``: round centroids to this many decimals after every
    update. Distributed float sums are order-nondeterministic at the
    ~1e-15 level; quantizing each iteration's centroids makes the whole
    fit bit-identical across runs and partitionings (the correctness
    contract relies on this to put the *iterated* path under the
    cross-engine value check). ~1e-6 centroid error is far below any
    assignment margin, so index quality is unchanged."""
    init = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id")))
        .limit(n_centroids)
        .collect()
    )
    centroids = np.array([r["v"] for r in init], dtype=float)
    centroids /= np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    norm = _norm(F.col(vec_col))
    unit = F.transform(F.col(vec_col), lambda x: x / norm)
    for _ in range(iters):
        assigned = (
            emb.withColumn("__unit", unit)
            .withColumn("__c", _assign_udf(centroids)(F.col(vec_col)))
        )
        sums = (
            assigned.select("__c", F.posexplode("__unit").alias("pos", "x"))
            .groupBy("__c", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = centroids.copy()
        acc = np.zeros_like(centroids)
        for r in sums:
            acc[int(r["__c"]), int(r["pos"])] = r["s"]
        filled = {int(r["__c"]) for r in sums}
        for c in filled:
            v = acc[c]
            n = np.linalg.norm(v)
            if n > 1e-12:
                new[c] = v / n
        centroids = new
        if quantize is not None:
            centroids = np.round(centroids, quantize)
    return centroids


def with_ivf_cluster(
    emb: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment (Arrow-batched numpy); at rest the
    table is partitioned by this column so a probe reads only the probed
    clusters' files (partition pruning = the IVF inverted lists)."""
    return emb.withColumn(out_col, _assign_udf(centroids)(F.col(vec_col)))


def ivf_topk(
    emb_with_cluster: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: probe the n_probe clusters whose centroids are nearest
    the query (driver-side on the tiny centroid matrix), exact cosine
    re-rank inside them."""
    q = np.asarray(query_vec, dtype=float)
    qu = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(centroids @ qu))[:n_probe]
    qcol = F.array(*[F.lit(float(x)) for x in q])
    qn = float(np.linalg.norm(q))
    cos = _dot(F.col(vec_col), qcol) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        emb_with_cluster.filter(F.col("cluster").isin([int(c) for c in probe]))
        .select(F.col(id_col).alias("id"), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )


def topk_per_group(
    df: DataFrame, group_col: str, order_col: str, k: int, ascending: bool = False
) -> DataFrame:
    """Generic top-k per group (window + row_number — the canonical
    Spark shape; no driver collect)."""
    oc = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = W.partitionBy(group_col).orderBy(oc)
    return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# product quantization (ANN scale path #3: byte codes instead of floats)
# ---------------------------------------------------------------------------


def pq_fit(
    emb: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantize: int | None = 6,
) -> np.ndarray:
    """Product-quantization codebooks (Jegou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011) ->
    (m, n_codes, dim/m): unit-normalize, split the dimension into ``m``
    subspaces, k-means each subspace to ``n_codes`` centroids.

    ALL subspaces train in one distributed pass per iteration: the
    encode UDF emits every subspace's assignment at once and the update
    is a single (subspace, code, dim)-keyed aggregation — m * n_codes *
    dim/m = dim * n_codes rows, metadata-sized at any corpus scale.
    Init and determinism follow :func:`ivf_fit`: id-hash-ordered seed
    vectors, per-iteration centroid quantization so the fit is
    bit-identical across runs/partitionings.
    """
    first = emb.select(vec_col).first()
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    init = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id")))
        .limit(n_codes)
        .collect()
    )
    seeds = np.array([r["v"] for r in init], dtype=float)
    seeds /= np.maximum(np.linalg.norm(seeds, axis=1, keepdims=True), 1e-12)
    # (m, n_codes, dsub)
    books = np.stack([seeds[:, s * dsub : (s + 1) * dsub] for s in range(m)])
    for _ in range(iters):
        enc = emb.withColumn("__codes", _pq_encode_udf(books)(F.col(vec_col)))
        norm = _norm(F.col(vec_col))
        unit = F.transform(F.col(vec_col), lambda x: x / norm)
        sums = (
            enc.withColumn("__unit", unit)
            .select(F.explode(F.col("__codes")).alias("code_struct"), "__unit")
            .select(
                F.col("code_struct.sub").alias("sub"),
                F.col("code_struct.code").alias("code"),
                F.col("__unit"),
            )
            .select(
                "sub",
                "code",
                F.posexplode(
                    F.slice(
                        F.col("__unit"),
                        F.col("sub") * dsub + 1,
                        dsub,
                    )
                ).alias("pos", "x"),
            )
            .groupBy("sub", "code", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = books.copy()
        acc = np.zeros_like(books)
        cnt = np.zeros((m, n_codes))
        for r in sums:
            acc[int(r["sub"]), int(r["code"]), int(r["pos"])] = r["s"]
            cnt[int(r["sub"]), int(r["code"])] = r["n"]
        nz = cnt > 0
        for s in range(m):
            for c in range(n_codes):
                if nz[s, c]:
                    new[s, c] = acc[s, c] / cnt[s, c]
        books = np.round(new, quantize) if quantize is not None else new
    return books


def _pq_encode_udf(books: np.ndarray):
    """All-subspace PQ assignment as one Arrow-batched numpy pass ->
    array<struct<sub:int,code:int>> (same compile-cost argument as
    :func:`_assign_udf`)."""
    B = np.asarray(books, dtype=float)  # (m, k, dsub)
    m, k, dsub = B.shape

    @F.pandas_udf("array<struct<sub:int,code:int>>")
    def enc(v: pd.Series) -> pd.Series:
        M = np.array(v.tolist(), dtype=float)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        out = []
        codes = np.empty((len(M), m), dtype=int)
        for s in range(m):
            sub = M[:, s * dsub : (s + 1) * dsub]  # (n, dsub)
            # argmin ||x - c||^2 == argmax (x.c - |c|^2/2)
            scores = sub @ B[s].T - 0.5 * (B[s] ** 2).sum(axis=1)
            codes[:, s] = np.argmax(scores, axis=1)
        for row in codes:
            out.append([{"sub": int(s), "code": int(c)} for s, c in enumerate(row)])
        return pd.Series(out)

    return enc


def pq_encode(
    emb: DataFrame,
    books: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "codes",
) -> DataFrame:
    """-> (id, codes): ``codes`` is an array<int> of length m — the
    byte-code table that REPLACES the float vectors in the hot path
    (m bytes vs dim*4; at dim=64, m=8 that is a 32x column shrink —
    the whole point of PQ at 100 TB)."""
    enc = _pq_encode_udf(books)(F.col(vec_col))
    return emb.select(
        F.col(id_col).alias("id"),
        F.transform(enc, lambda s: s["code"]).alias(out_col),
    )


def pq_topk(
    encoded: DataFrame,
    raw: DataFrame,
    books: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    rerank: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k via asymmetric distance computation: the query builds
    an (m x n_codes) inner-product lookup table driver-side, ADC score
    = sum of m table lookups per row (pure codegen arithmetic over the
    byte codes — the float vectors are NOT read), the best ``rerank``
    candidates join back to the raw table for exact cosine re-rank.

    The candidate set is rerank rows — the re-rank join broadcasts it,
    so the raw table is touched only by a broadcast-semi-join probe.
    """
    q = np.asarray(query_vec, dtype=float)
    qu = q / max(np.linalg.norm(q), 1e-12)
    B = np.asarray(books, dtype=float)  # (m, kc, dsub)
    m, kc, dsub = B.shape
    # T[s, c] = qu_s . B[s, c]
    T = np.stack([B[s] @ qu[s * dsub : (s + 1) * dsub] for s in range(m)])
    tflat = F.array(*[F.lit(float(x)) for x in T.ravel()])
    codes = F.col("codes")
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(tflat, (s * kc + F.element_at(codes, s + 1) + 1).cast("int")),
    )
    cands = (
        encoded.select(F.col("id").alias("_cand_id"), adc.alias("adc"))
        .orderBy(F.col("adc").desc(), F.col("_cand_id"))
        .limit(rerank)
    )
    qcol = F.array(*[F.lit(float(x)) for x in q])
    qn = float(np.linalg.norm(q))
    cos = _dot(F.col(vec_col), qcol) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        raw.join(F.broadcast(cands), raw[id_col] == cands["_cand_id"])
        .select(F.col(id_col).alias("id"), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )
