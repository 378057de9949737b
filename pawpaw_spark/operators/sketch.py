"""Distributed cardinality sketches: HyperLogLog registers as plain
DataFrame aggregations.

At 100 TB an exact ``countDistinct`` shuffles every distinct value;
``approx_count_distinct`` exists but its sketch is engine-internal —
opaque bytes you cannot mirror, merge across engines, or store as an
at-rest audit artifact. This module builds the HLL register table
(Flajolet et al. 2007) out of PORTABLE column expressions (md5 bits,
integer shifts, one max-aggregate), so:

* the sketch is itself a DataFrame — store it, union it, re-aggregate
  it (register merge is an elementwise ``max``, proven by test);
* every row is EXACTLY reproducible on any engine with md5 (the DuckDB
  contract oracle replays the full bit chain, value-level);
* one scan + one (group, bucket)-keyed partial aggregation — the
  shuffle carries at most ``groups x 2^b`` rows, never the data.

The ESTIMATE involves libm (``ln`` for the linear-counting small-range
correction) and so is deliberately split into :func:`hll_estimate`:
cross-engine bit-identity holds for the registers; the estimate is
unit-tested against exact distinct counts at ~1.04/sqrt(2^b) expected
relative error.

No reference parity: the reference engine has no sketches; this is
part of the beyond-parity scale surface like graph.py (SURVEY §2
"training-data pipeline" tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_registers(
    df: DataFrame,
    value_col: str,
    b: int = 12,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """HLL register table -> (group..., bucket, max_rho); only PRESENT
    buckets appear (absent bucket == register 0, the estimator adds
    them back arithmetically).

    Bit chain (mirrored verbatim by the contract oracle):

    * ``h = md5(value)``; ``hi``/``lo`` = first/second 8 hex chars as
      unsigned 32-bit ints;
    * ``bucket`` = top ``b`` bits of ``hi``;
    * ``w`` = the remaining ``64 - b`` bits (``<= 2^52`` for b >= 12,
      exact in int64);
    * ``rho`` = position of the leftmost 1-bit of ``w`` within its
      ``64 - b`` bit window, i.e. ``(64 - b + 1) - bitlength(w)``,
      with all-zero ``w`` -> ``64 - b + 1`` — computed via
      ``length(conv(w, 10, 2))``, which both Spark and DuckDB render
      without leading zeros.

    ``b`` in [4, 16]: >= 4 for the alpha constant table, <= 16 keeps
    ``w`` inside exact float64/int64 territory AND the register table
    <= 65536 rows per group. Nulls are skipped (SQL distinct-count
    semantics).
    """
    if not 4 <= b <= 16:
        raise ValueError("b must be in [4, 16]")
    v = F.col(value_col).cast("string")
    hx = F.md5(v)
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    bucket = F.shiftright(hi, 32 - b).alias("bucket")
    w = (
        (hi.bitwiseAND(F.lit((1 << (32 - b)) - 1)) * F.lit(1 << 32)) + lo
    ).alias("w")
    gcols = [F.col(g) for g in group_cols]
    rows = df.filter(v.isNotNull()).select(*gcols, bucket, w)
    rho = F.when(F.col("w") == 0, F.lit(64 - b + 1)).otherwise(
        F.lit(64 - b + 1) - F.length(F.conv(F.col("w"), 10, 2))
    )
    return (
        rows.select(*[F.col(g) for g in group_cols], "bucket",
                    rho.cast("int").alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(
    registers: DataFrame,
    b: int = 12,
    group_cols: tuple[str, ...] = (),
    correction: bool = True,
) -> DataFrame:
    """Registers -> (group..., n_distinct_est double).

    Standard bias-corrected raw estimate ``alpha * m^2 / sum(2^-M)``
    with the linear-counting small-range correction (``m * ln(m/V)``
    when the raw estimate <= 2.5m and V = zero registers > 0). The
    harmonic denominator is EXACT: terms are scaled by ``2^(64-b+1)``
    so each is an integer (absent buckets contribute the full
    ``2^(64-b+1)``), summed in DECIMAL(38,0); only the final
    divide/log touch float64.

    ``correction=False`` skips the linear-counting branch: the raw
    estimate is a pure IEEE-754 chain (exact-integer denominator,
    one multiply, one divide) and therefore BIT-IDENTICAL on any
    engine — no ``ln``, whose last-ulp rounding libms do not agree
    on. Use it when the estimate must be replayed cross-engine (the
    harmonic-centrality contract oracle); accuracy on SMALL
    cardinalities is then poor (raw saturates near ``alpha * m``),
    which is the regime the correction exists for.

    Duplicate (group, bucket) rows — e.g. a UNION of stored sketches
    passed without :func:`hll_merge` — are collapsed by an elementwise
    max first (the merge law), so estimating over unioned sketches is
    safe by construction rather than silently corrupt: without the
    collapse, ``present`` could exceed ``m`` and the denominator would
    go negative.
    """
    m = 1 << b
    s = 64 - b + 1  # scale exponent: term = 2^(s - rho), rho in [0..s]
    alpha = _alpha(m)
    registers = hll_merge(registers, group_cols=group_cols)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(
            F.expr(f"CAST(1 AS BIGINT) << ({s} - max_rho)").cast(
                "decimal(38,0)"
            )
        ).alias("s_present"),
    )
    # absent buckets: register 0 -> scaled term 2^s each
    denom = (
        F.col("s_present")
        + (F.lit(m) - F.col("present")).cast("decimal(38,0)")
        * F.lit(1 << s).cast("decimal(38,0)")
    )
    raw = F.lit(alpha * m * m * float(1 << s)) / denom.cast("double")
    if correction:
        zeros = (F.lit(m) - F.col("present")).cast("double")
        est = F.when(
            (raw <= F.lit(2.5 * m)) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
        ).otherwise(raw)
    else:
        est = raw
    return agg.select(
        *group_cols, est.cast("double").alias("n_distinct_est")
    )


def hll_merge(
    registers: DataFrame,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Union of sketches = elementwise register max — merging N
    at-rest sketch tables costs one small aggregation, never a rescan
    of the data they summarize."""
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("max_rho").alias("max_rho")
    )


def hyperball_registers(
    edges: DataFrame,
    b: int = 8,
    max_radius: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013) counter propagation -> the
    per-radius HLL register history ``(radius, node, bucket, max_rho)``
    for every node's OUT-ball (nodes reachable within ``radius`` hops,
    including the node itself; radius 0 = the singleton ball).

    The neighborhood function N(t) = #pairs within distance t — the
    basis for effective-diameter, centrality and connectivity profiles
    — is exactly computable only by all-pairs BFS (O(V·E), dead at any
    scale). HyperBall's observation: ball(v, t) = {v} ∪ ⋃_{v→w}
    ball(w, t-1), and a UNION of sets is an elementwise MAX of their
    HLL registers (:func:`hll_merge`'s merge law). So each round is
    one equi-join (edges ⋈ previous registers on the destination) and
    one max-aggregation on (node, bucket) — state O(V · 2^b) rows,
    never O(V²), and every step is the md5 bit chain of
    :func:`hll_registers`, bit-identical on any engine/partitioning
    (the contract oracle replays the whole propagation).

    Early exit: when a round changes no register, every later radius
    equals the fixpoint; the remaining history rows are emitted by
    relabeling the converged round (a union of lits, no recompute).
    The loop runs under ``fixpoint_loop_conf`` with per-round
    truncated checkpoints — the iterative-graph discipline.
    """
    if max_radius < 0:
        raise ValueError("max_radius must be >= 0")
    from pawpaw_spark.session import fixpoint_loop_conf, truncated_checkpoint

    e = (
        edges.select(
            F.col(src_col).cast("string").alias("src"),
            F.col(dst_col).cast("string").alias("dst"),
        )
        .distinct()
        .persist()
    )
    try:
        n_e = e.count()  # materializes; sizes the loop width
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        with fixpoint_loop_conf(e.sparkSession, approx_state_rows=n_e):
            regs = truncated_checkpoint(
                hll_registers(nodes, "node", b=b, group_cols=("node",))
            )
            history = regs.withColumn("radius", F.lit(0))
            for t in range(1, max_radius + 1):
                pushed = (
                    e.join(regs, e["dst"] == regs["node"])
                    .select(
                        F.col("src").alias("node"), "bucket", "max_rho"
                    )
                )
                nxt = truncated_checkpoint(
                    hll_merge(regs.union(pushed), group_cols=("node",))
                )
                changed = nxt.join(
                    regs, ["node", "bucket", "max_rho"], "left_anti"
                )
                if changed.isEmpty():
                    # fixpoint: later radii are identical relabelings
                    for tt in range(t, max_radius + 1):
                        history = history.union(
                            regs.withColumn("radius", F.lit(tt))
                        )
                    break
                regs = nxt
                history = history.union(regs.withColumn("radius", F.lit(t)))
        return history.select("radius", "node", "bucket", "max_rho")
    finally:
        e.unpersist()


def neighborhood_function(
    edges: DataFrame,
    b: int = 8,
    max_radius: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Approximate neighborhood function -> (radius, n_pairs_est):
    N(t) = Σ_v |ball(v, t)| estimated from the HyperBall registers
    (relative error ~1.04/sqrt(2^b) per ball). N(0) = #nodes exactly;
    the curve's saturation point is the graph's effective diameter
    (:func:`effective_diameter`)."""
    hist = hyperball_registers(
        edges, b=b, max_radius=max_radius, src_col=src_col, dst_col=dst_col
    )
    per_ball = hll_estimate(hist, b=b, group_cols=("radius", "node"))
    return (
        per_ball.groupBy("radius")
        .agg(F.sum("n_distinct_est").alias("n_pairs_est"))
        .orderBy("radius")
    )


def harmonic_centrality(
    edges: DataFrame,
    b: int = 8,
    max_radius: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    reverse: bool = True,
    correction: bool = True,
) -> DataFrame:
    """Approximate harmonic centrality per node -> (node,
    harmonic_est): H(v) = Σ_{u != v, d(u,v) <= max_radius} 1/d(u, v),
    estimated from the HyperBall register history (the application
    Boldi & Vigna built HyperBall FOR — exact H is all-pairs BFS,
    O(V·E), dead at scale; this is max_radius joins + aggregations).

    ``reverse=True`` (default) propagates along REVERSED edges so the
    radius-t ball of v is {u : d(u -> v) <= t} — the standard
    incoming-distance harmonic centrality; ``reverse=False`` gives
    the outgoing variant.

    H(v) = Σ_t (|ball(v,t)| - |ball(v,t-1)|)/t over the per-radius
    cardinality estimates. The combination is a PIVOT — one conditional
    max per radius (max_radius+1 values per node, each present exactly
    once by hyperball_registers' fixpoint relabeling) — then one fixed
    left-to-right expression, so with ``correction=False`` the whole
    number chain is deterministic IEEE-754 on any engine (the contract
    oracle replays it bit-level); with the default correction the
    small-ball estimates are accurate (~1.04/sqrt(2^b) relative) and
    increments are clamped at 0 against branch-switch dips."""
    from functools import reduce

    if max_radius < 1:
        raise ValueError("max_radius must be >= 1")
    s_col, d_col = (dst_col, src_col) if reverse else (src_col, dst_col)
    hist = hyperball_registers(
        edges, b=b, max_radius=max_radius, src_col=s_col, dst_col=d_col
    )
    per_ball = hll_estimate(
        hist, b=b, group_cols=("radius", "node"), correction=correction
    )
    wide = per_ball.groupBy("node").agg(
        *[
            F.max(
                F.when(F.col("radius") == t, F.col("n_distinct_est"))
            ).alias(f"e{t}")
            for t in range(max_radius + 1)
        ]
    )
    h = reduce(
        lambda a, c: a + c,
        [
            F.greatest(
                F.col(f"e{t}") - F.col(f"e{t-1}"), F.lit(0.0)
            ) / F.lit(float(t))
            for t in range(1, max_radius + 1)
        ],
    )
    return wide.select("node", h.cast("double").alias("harmonic_est"))


def closeness_centrality(
    edges: DataFrame,
    b: int = 8,
    max_radius: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    reverse: bool = True,
    correction: bool = True,
) -> DataFrame:
    """Approximate (truncated) closeness centrality per node ->
    (node, reach_est, closeness_est): C(v) = reach(v) / sum_dist(v)
    with reach(v) = |{u != v : d <= max_radius}| and sum_dist(v) =
    sum of d(u, v) over those u, both estimated from the same
    HyperBall register history as :func:`harmonic_centrality` — the
    reciprocal-of-average-distance form (bounded [0, 1], robust to
    the truncation radius; multiply by reach/(n-1) for Lin's index).

    Same determinism contract as harmonic: the per-radius increments
    g_t = max(e_t - e_{t-1}, 0) combine in one fixed left-to-right
    expression (reach = sum g_t, sum_dist = sum t*g_t), so with
    ``correction=False`` every double is bit-identical cross-engine
    and the ``kg_closeness`` contract oracle replays propagation and
    estimation end to end. Nodes with an empty truncated ball
    (sum_dist = 0) report closeness 0.0."""
    from functools import reduce

    if max_radius < 1:
        raise ValueError("max_radius must be >= 1")
    s_col, d_col = (dst_col, src_col) if reverse else (src_col, dst_col)
    hist = hyperball_registers(
        edges, b=b, max_radius=max_radius, src_col=s_col, dst_col=d_col
    )
    per_ball = hll_estimate(
        hist, b=b, group_cols=("radius", "node"), correction=correction
    )
    wide = per_ball.groupBy("node").agg(
        *[
            F.max(
                F.when(F.col("radius") == t, F.col("n_distinct_est"))
            ).alias(f"e{t}")
            for t in range(max_radius + 1)
        ]
    )
    gains = [
        F.greatest(F.col(f"e{t}") - F.col(f"e{t-1}"), F.lit(0.0))
        for t in range(1, max_radius + 1)
    ]
    reach = reduce(lambda a, c: a + c, gains)
    sum_dist = reduce(
        lambda a, c: a + c,
        [g * F.lit(float(t)) for t, g in enumerate(gains, start=1)],
    )
    return wide.select(
        "node",
        reach.cast("double").alias("reach_est"),
        F.when(sum_dist > 0, reach / sum_dist)
        .otherwise(F.lit(0.0))
        .cast("double")
        .alias("closeness_est"),
    )


def effective_diameter(
    nf: DataFrame, alpha: float = 0.9
) -> float:
    """Smallest radius whose neighborhood-function value reaches
    ``alpha`` of the largest measured one, linearly interpolated
    between radii (the standard HyperBall/ANF definition). ``nf`` is
    :func:`neighborhood_function` output — max_radius+1 rows, so the
    collect is metadata-sized by construction."""
    rows = sorted(
        (r["radius"], r["n_pairs_est"]) for r in nf.collect()
    )
    if not rows:
        raise ValueError("empty neighborhood function")
    target = alpha * rows[-1][1]
    prev_r, prev_n = rows[0]
    if prev_n >= target:
        return float(prev_r)
    for r, n in rows[1:]:
        if n >= target:
            if n == prev_n:
                return float(r)
            return prev_r + (target - prev_n) / (n - prev_n) * (r - prev_r)
        prev_r, prev_n = r, n
    return float(rows[-1][0])


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    group_cols: tuple[str, ...] = (),
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) ->
    (group..., row, col, cnt): ``depth`` independent hash rows, each
    mapping a value to ``md5(row || ':' || value) mod width``; ``cnt``
    sums occurrences (or ``weight_col``).

    The frequency twin of :func:`hll_registers`: exact per-value
    counts need a data-sized shuffle, the sketch needs
    ``groups x depth x width`` rows — point lookups then OVERESTIMATE
    true counts by at most the collision mass (min over rows, the CMS
    guarantee: error <= 2N/width with prob 1 - 2^-depth). Same
    portability contract: md5 positions and integer sums are
    bit-identical on any engine/partitioning, so sketches are at-rest
    artifacts any engine can build, merge (cell-wise SUM — exact, the
    CMS linearity law), and query. Only present cells appear (absent
    cell == 0).
    """
    if depth < 1 or width < 2:
        raise ValueError("depth must be >= 1 and width >= 2")
    v = F.col(value_col).cast("string")
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    gcols = [F.col(g) for g in group_cols]
    rows = df.filter(v.isNotNull()).select(
        *gcols,
        F.explode(
            F.array(*[F.lit(r) for r in range(depth)])
        ).alias("row"),
        v.alias("_v"),
        w.alias("_w"),
    )
    col = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("row"), F.col("_v"))), 1, 15
            ),
            16, 10,
        ).cast("long")
        % F.lit(width)
    ).alias("col")
    return (
        rows.select(*[F.col(g) for g in group_cols], "row", col, "_w")
        .groupBy(*group_cols, "row", "col")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_lookup(
    cms: DataFrame,
    values: DataFrame,
    value_col: str = "v",
    depth: int = 4,
    width: int = 1024,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Point-query a count-min sketch -> (group..., value, est): the
    MIN over the sketch's ``depth`` rows of the cell each hash maps
    the value to (absent cell = 0 — a value whose every cell is
    missing estimates 0). ``depth``/``width`` must match the build
    (they parameterize the hash chain, so a mismatch silently queries
    the wrong cells — pass the build's values).

    One explode + one equi-join on (row, col) against the sketch —
    querying never touches the data the sketch summarizes.
    """
    v = F.col(value_col).cast("string")
    probes = values.select(
        *[F.col(g) for g in group_cols],
        F.explode(
            F.array(*[F.lit(r) for r in range(depth)])
        ).alias("row"),
        v.alias("value"),
    ).withColumn(
        "col",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("row"), F.col("value"))), 1, 15
            ),
            16, 10,
        ).cast("long")
        % F.lit(width),
    )
    keys = [*group_cols, "row", "col"]
    return (
        probes.join(cms, on=keys, how="left")
        .groupBy(*group_cols, "value")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est")
        )
    )


# ----------------------------------------------------------------- bloom
def _bloom_pos(c, i: int, m_bits: int):
    """Hash i of value c -> bit position in [0, m_bits): first 15 md5
    hex digits (< 2^60, sign-safe) of ``i ':' value``, mod m.  Portable
    to any engine with md5 (the HLL discipline)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), c)), 1, 15), 16, 10
        ).cast("long")
        % F.lit(int(m_bits))
    )


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> DataFrame:
    """Build a Bloom filter (Bloom 1970) over a column -> the packed
    word table (word_idx, word): 32 bits per word so every mask stays
    a small positive int64 on engines that CHECK shift overflow
    (DuckDB raises on 1<<63).  Spark ships bloom_filter_agg
    internally, but like the HLL case its sketch is opaque engine
    bytes — this one is a PORTABLE DataFrame you can store, union
    (bitwise OR merge), broadcast into probe joins, and replay
    value-level cross-engine.

    The classic 100 TB use is semi-join pruning: build over the small
    side's join keys (the filter is <= m_bits/32 rows no matter the
    input), broadcast, and drop non-matching rows at the scan before
    the shuffle — false positives only cost wasted shuffle rows, never
    correctness (no false negatives, pinned by test).

    One scan + one (word_idx)-keyed partial aggregation; the shuffle
    carries at most k_hashes rows per input row and the result is
    metadata-sized."""
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two >= 64")
    if not 1 <= k_hashes <= 16:
        raise ValueError("k_hashes must be in [1, 16]")
    v = F.col(col).cast("string")
    positions = df.select(
        F.explode(
            F.array(*[_bloom_pos(v, i, m_bits) for i in range(k_hashes)])
        ).alias("pos")
    )
    return (
        positions.select(
            (F.col("pos") / 32).cast("long").alias("word_idx"),
            # pow instead of shiftleft: exact for 2^(<32) in double,
            # and the column-typed shift amount stays portable
            F.pow(F.lit(2.0), (F.col("pos") % 32).cast("double"))
            .cast("long")
            .alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").cast("long").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    out_col: str = "might_contain",
) -> DataFrame:
    """Membership probe -> ``df`` + boolean ``out_col``: true iff ALL
    k hash bits are set.  k chained BROADCAST left joins against the
    word table (map-side, no shuffle of the probed data, row identity
    preserved without needing an id column); a missing word row means
    an all-zero word."""
    out = df
    v = F.col(col).cast("string")
    flags = []
    for i in range(k_hashes):
        pos = _bloom_pos(v, i, m_bits)
        b = bloom.select(
            F.col("word_idx").alias(f"__bw{i}"), F.col("word").alias(f"__w{i}")
        )
        out = out.join(
            F.broadcast(b),
            (pos / 32).cast("long") == F.col(f"__bw{i}"),
            "left",
        )
        flags.append(
            F.coalesce(F.col(f"__w{i}"), F.lit(0)).bitwiseAND(
                F.pow(F.lit(2.0), (pos % 32).cast("double")).cast("long")
            )
            != 0
        )
    hit = flags[0]
    for fl in flags[1:]:
        hit = hit & fl
    return out.select(*df.columns, hit.alias(out_col))


# ------------------------------------------------- exact order statistics
def exact_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    step_bits: int = 12,
    weight_col: str | None = None,
) -> DataFrame:
    """EXACT type-1 quantiles (k-th smallest, k = ceil(p*n)) of a
    non-negative int64 column WITHOUT a global sort — the classic
    radix-refinement selection: per round, bucket the candidate range
    by the next ``step_bits`` bits (ONE partial aggregation whose
    result is at most ``|probs| * 2^step_bits`` rows — metadata-sized
    and INDEPENDENT of data size), walk the collected histogram to find
    the bucket containing each target rank, recurse into it.  ~3-5
    rounds cover any int64 range; every arithmetic step is integer, so
    results are bit-exact at any partitioning and engine.

    Why not ``approxQuantile``: its Greenwald-Khanna sketch is
    approximate and engine-internal; why not ``ORDER BY`` + offset: a
    total sort of 100 TB for one scalar.  This is the shape that
    scales: histogram shuffles never exceed the bucket count.

    Ranks use exact rational arithmetic (``Fraction(str(p))``) —
    ``ceil(0.9 * n)`` in float is OFF BY ONE whenever ``0.9 * n``
    lands epsilon above an integer, which is a real bug class this
    implementation pins tests against.

    Input contract: values must be >= 0 (raises otherwise; shift
    arithmetic on negatives would reorder).  The input is scanned
    once per round — cache upstream if scans are expensive.  Runs
    EAGERLY and returns a small (p, value) DataFrame.

    ``weight_col`` (int64, strictly positive; raises otherwise)
    switches to WEIGHTED type-1 quantiles: the k-th smallest by
    CUMULATIVE weight, k = ceil(p * total_weight) — equivalent to
    repeating each row weight times, at no extra cost (every count in
    the histogram walk becomes a weight sum, still exact int64; e.g.
    the token-weighted median document length).
    """
    from fractions import Fraction
    from math import ceil

    if not probs:
        raise ValueError("probs must be non-empty")
    if not all(0 < p <= 1 for p in probs):
        raise ValueError("each prob must be in (0, 1]")
    if not 1 <= step_bits <= 20:
        raise ValueError("step_bits must be in [1, 20]")
    v = F.col(col).cast("long")
    if weight_col is None:
        w = F.lit(1).cast("long")
    else:
        w = F.col(weight_col).cast("long")
    stats = df.filter(v.isNotNull()).select(
        F.sum(w).alias("n"),
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
        (F.min(w) if weight_col is not None else F.lit(1)).alias("wlo"),
        # F.min/F.sum skip NULLs, so a NULL weight would silently
        # contribute zero mass — count them separately and raise.
        (
            F.count(F.lit(1)) - F.count(w)
            if weight_col is not None
            else F.lit(0)
        ).alias("wnull"),
    ).collect()[0]
    n, lo, hi = stats.n, stats.lo, stats.hi
    if weight_col is not None and stats.wnull:
        raise ValueError(
            f"exact_quantiles: {stats.wnull} row(s) have NULL weight "
            "(weights must be strictly positive and non-NULL)"
        )
    if weight_col is not None and stats.wlo is not None and stats.wlo <= 0:
        raise ValueError(
            "exact_quantiles: weights must be strictly positive"
        )
    if not n:
        raise ValueError("exact_quantiles: no non-null rows")
    if lo < 0:
        raise ValueError("exact_quantiles: negative values unsupported")
    ranks = {p: min(n, ceil(Fraction(str(p)) * n)) for p in probs}

    bits = max(int(hi).bit_length(), 1)
    shifts = list(range(0, bits, step_bits))[::-1]  # e.g. [24, 12, 0]
    state = {p: (0, ranks[p]) for p in probs}  # prefix at PREV shift, rank
    prev_shift = None
    for s in shifts:
        bases = sorted({b for b, _ in state.values()})
        d = df.filter(v.isNotNull()).select(v.alias("v"), w.alias("w"))
        if prev_shift is not None:
            d = d.filter(
                F.shiftright(F.col("v"), prev_shift).isin(bases)
            )
            pref = F.shiftright(F.col("v"), prev_shift)
        else:
            pref = F.lit(0)
        hist = (
            d.groupBy(
                pref.alias("pref"),
                F.shiftright(F.col("v"), s).alias("key"),
            )
            .agg(F.sum("w").alias("c"))
            .collect()
        )
        by_pref: dict = {}
        for r in hist:
            by_pref.setdefault(r.pref, []).append((r.key, r.c))
        for p, (base, rank) in state.items():
            cum = 0
            for key, c in sorted(by_pref.get(base, [])):
                if cum + c >= rank:
                    state[p] = (key, rank - cum)
                    break
                cum += c
            else:  # pragma: no cover - rank <= n by construction
                raise RuntimeError("exact_quantiles: rank walk overflow")
        prev_shift = s
    out = [(float(p), int(state[p][0])) for p in probs]
    return df.sparkSession.createDataFrame(out, "p double, value long")
