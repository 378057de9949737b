"""Deterministic sampling for training-data mixes.

A 100-TB pipeline can't use ``df.sample()`` for anything that must be
reproducible or auditable: rerunning the job, resuming from checkpoint,
or recomputing a lost partition must select the SAME rows.  These
samplers decide membership from a cryptographic hash of a stable key,
so the sample is a pure function of the data — independent of
partitioning, task retries, executor count, and Spark version — and the
exact selection is reproducible in any other engine (the contract
mirrors it in DuckDB SQL verbatim).

Mechanism: ``md5(key)`` is uniform on [0, 16^8) over its first 8 hex
chars; comparing that fixed-width lowercase hex prefix against the hex
encoding of ``floor(p * 16^8)`` keeps each row with probability p.
String comparison of equal-length lowercase hex IS numeric comparison,
so no engine-specific hex→int conversion is needed anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPACE = 16**8  # first 8 hex chars of md5


def _threshold_hex(fraction: float) -> str:
    """Fixed-width lowercase hex threshold for a keep-fraction.

    ``fraction == 1.0`` returns ``"g"``: every 8-hex-char key compares
    strictly below it ('f' < 'g'), so keep-100% keeps ALL rows — a
    clamped "ffffffff" under the strict ``<`` would silently drop the
    ~1-in-4.3e9 keys whose md5 prefix is exactly ffffffff."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    t = int(fraction * _SPACE)
    return "g" if t >= _SPACE else format(t, "08x")


def sample_key(key_col: Column) -> Column:
    """The 8-hex-char decision key for a row (exposed for audits)."""
    return F.substring(F.md5(key_col.cast("string")), 1, 8)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by ``md5(key)`` alone.

    Pure narrow filter — no shuffle, no RNG state; pushes down to the
    scan as a deterministic predicate. The same (key, fraction) always
    selects the same rows, on any cluster size or engine.
    """
    return df.where(sample_key(F.col(key_col)) < F.lit(_threshold_hex(fraction)))


def stratified_sample(
    df: DataFrame,
    strata: dict[str, float],
    strata_col: str,
    key_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive
    (e.g. keep 75 % of code, 25 % of web, 100 % of books).

    ``strata`` maps stratum value -> keep fraction; rows in strata not
    listed use ``default_fraction``. Same guarantees as
    :func:`deterministic_sample`: a narrow filter, reproducible across
    engines and reruns, no shuffle.
    """
    thr: Column = F.lit(_threshold_hex(default_fraction))
    for value, fraction in sorted(strata.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_threshold_hex(fraction))
        ).otherwise(thr)
    return df.where(sample_key(F.col(key_col)) < thr)


def weighted_mix_keys(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic mixture-ordering key -> (key, source, mix_key).

    Gives every document a sortable key such that ANY prefix of the
    corpus ordered by ``mix_key`` contains the sources in proportion to
    ``weights`` — independent of how many documents each source has
    (the property a training-mix schedule needs; per-doc sampling rates
    cannot express it without knowing source sizes).

    Mechanism: ``u = md5-uniform(key) in [0, 1)``; ``mix_key =
    u * n_source / weight``. Documents of source s with mix_key <= K
    number ~ K * weight_s, so the prefix ratio is weight_s /
    sum(weights). Expected-proportion (hash-uniform) rather than exact
    stride interleave: the deviation in a prefix of k docs is
    O(sqrt(k)), and in exchange the operator is one metadata-sized
    count aggregate broadcast back onto a pure column expression — no
    window over a source's documents (a per-source row_number would put
    a billion-doc source into one window partition at 100 TB).

    Rows whose source is absent from ``weights`` are dropped; weights
    must be positive. The full computation is mirrored in the DuckDB
    contract oracle (md5 prefix -> integer -> float is identical in
    both engines).
    """
    if not weights:
        raise ValueError("weights must name at least one source")
    for s, w in weights.items():
        if not w > 0:
            raise ValueError(f"weight for {s!r} must be > 0, got {w}")
    w_col: Column = F.lit(None).cast("double")
    for value, w in sorted(weights.items()):
        w_col = F.when(
            F.col(source_col) == F.lit(value), F.lit(float(w))
        ).otherwise(w_col)
    counts = (
        df.filter(F.col(source_col).isin(*weights))
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).cast("long").alias("__n_source"))
    )
    # md5-uniform in [0, 1): same fixed-width-prefix trick as sampling
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(_SPACE))
    )
    return (
        df.filter(F.col(source_col).isin(*weights))
        .join(F.broadcast(counts), source_col)
        .select(
            F.col(key_col),
            F.col(source_col),
            (u * F.col("__n_source") / w_col).alias("mix_key"),
        )
    )


def epoch_shuffle_key(
    df: DataFrame,
    seed: int | str,
    key_col: str = "doc_id",
    out_col: str = "shuffle_key",
) -> DataFrame:
    """Reproducible corpus shuffle order -> the input plus a
    ``shuffle_key`` column: sorting by (shuffle_key, key) IS the
    epoch's pseudorandom document order. Training runs need a shuffle
    that is (a) different every epoch, (b) bit-identical when the job
    reruns, resumes, or recomputes a lost partition, and (c) writable
    as a range-partitioned sort — none of which ``orderBy(rand())``
    gives (rand() is seeded per task attempt: a retried task silently
    reshuffles its partition).

    Key = md5(seed || ':' || key): a pure function of the data, so the
    order is engine-independent (DuckDB mirrors it verbatim) and a new
    ``seed`` value (e.g. the epoch number) derives a fresh independent
    permutation. The tie-break on the raw key matters only for md5
    prefix collisions between distinct docs (the full 32-hex key makes
    that vanishingly rare, but determinism must not rest on "rare").

    Scale: a projection; the downstream sort is Spark's range-partition
    sort (``df.sortWithinPartitions`` after ``repartitionByRange`` on
    the key), never a single-reducer window — this operator
    deliberately emits the KEY, not a global row_number, because a
    global rank is a serial bottleneck a 100 TB corpus cannot pay.
    """
    return df.withColumn(
        out_col,
        F.md5(
            F.concat(
                F.lit(str(seed)), F.lit(":"), F.col(key_col).cast("string")
            )
        ),
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    splits: dict[str, float],
    key_col: str = "doc_id",
    *,
    a_col: str = "a",
    b_col: str = "b",
    out_col: str = "split",
) -> DataFrame:
    """Cluster-aware train/validation/test split -> the input plus
    ``(canon_id, split)``: documents connected by near-duplicate
    edges ALWAYS land in the same split, so evaluation never scores a
    near-copy of a training document (train/test leakage — the
    classic failure a plain per-doc hash split commits the moment the
    corpus contains near-duplicates).

    ``pairs`` is any near-duplicate edge table ((a, b) doc ids — the
    output shape of minhash_pairs / simhash / ngram-Jaccard /
    embedding near-dup); the split unit is the CONNECTED COMPONENT of
    that graph (:func:`pawpaw_spark.operators.canon.
    connected_components` — min-label pointer jumping, driver cutover
    for metadata-sized pair sets). Documents in no pair are their own
    singleton cluster (left join + coalesce, no blowup).

    The decision is ``md5(canon_id)``-uniform against the cumulative
    ``splits`` fractions in SORTED split-name order — a pure function
    of the cluster id, so the assignment is reproducible on any
    cluster size, any engine (the DuckDB oracle replays it verbatim),
    and STABLE under corpus growth: a cluster keeps its split when
    unrelated documents arrive. Fractions must sum to 1 (±1e-9) —
    every cluster gets exactly one split.

    Scale: components over the PAIR graph (bounded by near-dup volume,
    not corpus size), one broadcast-friendly left join onto the corpus,
    then a pure column expression; no shuffle of the corpus itself.
    """
    if not splits:
        raise ValueError("splits must name at least one part")
    for s, w in splits.items():
        if not w >= 0:
            raise ValueError(f"fraction for {s!r} must be >= 0, got {w}")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    from pawpaw_spark.operators.canon import connected_components

    comp = connected_components(pairs, a_col=a_col, b_col=b_col).select(
        F.col("node").alias(key_col), F.col("comp").alias("canon_id")
    )
    with_canon = df.join(comp, key_col, "left").withColumn(
        "canon_id", F.coalesce(F.col("canon_id"), F.col(key_col))
    )
    u = (
        F.conv(F.substring(F.md5(F.col("canon_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(_SPACE))
    )
    expr: Column | None = None
    acc = 0.0
    names = sorted(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    out_expr = last if expr is None else expr.otherwise(last)
    return with_canon.withColumn(out_col, out_expr)


def rendezvous_assign(
    df: DataFrame,
    shards: list[str],
    key_col: str = "doc_id",
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment -> the
    input plus ``out_col`` (Thaler & Ravishankar 1998).

    Each key goes to ``argmax over shards of md5(shard || '|' || key)``
    — the stable-routing property that makes HRW the right primitive
    for cluster resizes: adding or removing ONE shard moves only the
    keys whose argmax was that shard (~1/n of the data), where a
    mod-n hash reshuffles almost everything.  md5 keeps the weight
    function portable (any engine can replay the argmax); ties are
    impossible in practice (128-bit collisions) but the (hash, shard)
    struct compare pins them deterministically anyway.

    One shuffle-free projection: the per-key weights are an inline
    array of len(shards) structs and ``array_max`` picks the winner —
    shard lists are config-sized (machines, not data).
    """
    if not shards:
        raise ValueError("shards must be non-empty")
    if len(set(shards)) != len(shards):
        raise ValueError("shard names must be unique")
    k = F.col(key_col).cast("string")
    arr = F.array(
        *[
            F.struct(
                F.md5(F.concat(F.lit(s), F.lit("|"), k)).alias("h"),
                F.lit(s).alias("n"),
            )
            for s in shards
        ]
    )
    return df.withColumn(out_col, F.array_max(arr)["n"])


def topk_per_group(
    df: DataFrame,
    group_cols: list[str] | str,
    order_col: str,
    k: int,
    tiebreak_col: str | None = None,
    descending: bool = True,
    salts: int = 16,
) -> DataFrame:
    """Top-``k`` rows per group WITHOUT a per-group sort shuffle ->
    the input columns, at most ``k`` rows per group (the per-language
    best-quality-docs / per-repo hottest-files selection primitive).

    Plan shape: TWO-LEVEL salted aggregation, each level
    ``slice(sort_array(collect_list(struct(...))), 1, k)``.  Level 1
    groups on ``(group, salt)`` with the salt hashed from the tiebreak
    (``salts`` buckets), so a hot group's aggregation-buffer state is
    O(group_rows / salts) per key instead of O(group_rows); level 2
    merges the per-salt top-``k`` arrays (state O(salts * k)) and cuts
    to the global top-``k``.  Correct for any salt split: every global
    top-``k`` row is necessarily in the top-``k`` of its own salt
    bucket, so the level-2 union is a superset of the answer.  No
    window function, so no sort-within-partitions of the full table.

    Rows whose ``order_col`` is NULL are EXCLUDED (a NULL-first struct
    sort would otherwise hand them top-``k`` slots ahead of every real
    value).  Determinism requires a total order: ``tiebreak_col``
    (default: the first group column is NOT enough — pass a unique id)
    breaks ``order_col`` ties; without one, equal keys make the cut
    arbitrary and this raises rather than silently returning
    run-dependent rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if salts < 1:
        raise ValueError(f"salts must be >= 1, got {salts}")
    if tiebreak_col is None:
        raise ValueError(
            "pass tiebreak_col (a unique column): without a total "
            "order the k-th place is partition-dependent"
        )
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    o = F.col(order_col)
    if descending:
        from pyspark.sql import types as T

        if not isinstance(df.schema[order_col].dataType, T.NumericType):
            raise ValueError(
                "descending=True needs a numeric order_col (the "
                "struct sort is ascending; negation implements the "
                "reversal)"
            )
    key = (-o if descending else o).alias("__o")
    tb = F.col(tiebreak_col).alias("__t")
    payload = F.struct(
        key, tb, *[F.col(c) for c in df.columns]
    )
    salt = F.pmod(
        F.xxhash64(F.col(tiebreak_col).cast("string")), F.lit(salts)
    ).alias("__s")
    lvl1 = (
        df.where(o.isNotNull())
        .groupBy(*groups, salt)
        .agg(
            F.slice(F.sort_array(F.collect_list(payload)), 1, k)
            .alias("__p")
        )
    )
    agg = lvl1.groupBy(*groups).agg(
        F.slice(F.sort_array(F.flatten(F.collect_list("__p"))), 1, k)
        .alias("__top")
    )
    ex = agg.select(F.explode("__top").alias("r"))
    return ex.select(*[F.col(f"r.{c}").alias(c) for c in df.columns])
