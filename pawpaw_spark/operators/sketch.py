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
) -> DataFrame:
    """Registers -> (group..., n_distinct_est double).

    Standard bias-corrected raw estimate ``alpha * m^2 / sum(2^-M)``
    with the linear-counting small-range correction (``m * ln(m/V)``
    when the raw estimate <= 2.5m and V = zero registers > 0). The
    harmonic denominator is EXACT: terms are scaled by ``2^(64-b+1)``
    so each is an integer (absent buckets contribute the full
    ``2^(64-b+1)``), summed in DECIMAL(38,0); only the final
    divide/log touch float64.

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
    zeros = (F.lit(m) - F.col("present")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
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
