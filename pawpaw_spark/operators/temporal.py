"""Temporal joins Spark's DataFrame API lacks: as-of join and
interval (range) containment join.

Both are everyday analytics primitives (enrich each event with the
latest prior state; attribute events to campaign/session windows) that
naive Spark spells as inequality theta-joins — which Catalyst can only
execute as BroadcastNestedLoopJoin (small side only) or a cartesian
product. These operators re-express them as EQUI-joins + window
functions, the shapes that scale:

* ``asof_join`` — the classic union-then-window trick: tag both inputs,
  union, one window pass per key carries the latest right-side payload
  forward onto each left row. ONE shuffle (by key), no join at all,
  and the window state is one payload struct — the same plan at 100 TB
  as at 100 rows. (pandas has ``merge_asof``; DuckDB has ``ASOF JOIN``
  — the contract oracle uses it.)
* ``range_join_binned`` — intervals are replicated onto fixed-width
  bins, points key into exactly one bin, the join becomes an equi-join
  on (keys..., bin) with a residual containment predicate. Replication
  factor = interval_len / bin_width + 1, chosen by the caller to trade
  duplication against bucket selectivity — the standard distributed
  interval-join design (and what AQE can skew-split, unlike a nested
  loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    prefix: str = "right_",
    tolerance=None,
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right_ts <= left_ts`` within the same ``on`` key (backward
    inclusive — pandas ``merge_asof`` / DuckDB ``ASOF JOIN ... >=``
    semantics). Left rows without a prior right row keep nulls
    (left-join semantics).

    ``right_cols`` (default: every right column except the keys)
    arrive prefixed with ``prefix``. ``tolerance`` (a Column interval
    or literal, e.g. ``F.expr("INTERVAL 1 HOUR")``) nulls matches
    older than ``left_ts - tolerance``.

    Ties: multiple right rows at the same (key, ts) collapse to the
    lexicographically greatest payload struct BEFORE the window pass —
    an explicit deterministic rule, where a raw window would pick a
    partition-order-dependent row.

    Shape: union + one window over (key, ts) — one shuffle, no join
    node anywhere in the plan. Skewed keys behave exactly like any
    windowed aggregation (salt upstream if one key dominates).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    # the matched timestamp is always emitted as {prefix}{right_ts};
    # leaving it in right_cols would emit that column twice
    right_cols = [c for c in right_cols if c != right_ts]
    payload = F.struct(
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    # deterministic tie collapse: one payload per (keys, ts)
    r2 = (
        right.select(*keys, F.col(right_ts).alias("_ats"), payload.alias("_p"))
        .groupBy(*keys, "_ats")
        .agg(F.max("_p").alias("_p"))
        .withColumn("_tag", F.lit(0))
    )
    # carry the whole left row through the union as one struct
    l2 = left.select(
        *keys,
        F.col(left_ts).alias("_ats"),
        F.lit(None).cast(r2.schema["_p"].dataType).alias("_p"),
        F.lit(1).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    r3 = r2.withColumn("_lrow", F.lit(None).cast(l2.schema["_lrow"].dataType))
    u = l2.unionByName(r3)
    # right rows sort before left rows at equal ts (_tag 0 < 1):
    # backward-INCLUSIVE match
    win = (
        W.partitionBy(*keys)
        .orderBy("_ats", "_tag")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    matched = F.last("_p", ignorenulls=True).over(win)
    out = (
        u.withColumn("_m", matched)
        .filter(F.col("_tag") == 1)
        .select("_lrow", "_m", "_ats")
    )
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        out = out.withColumn(
            "_m",
            F.when(F.col("_m._ts") >= F.col("_ats") - tol, F.col("_m")),
        )
    cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    cols += [F.col("_m._ts").alias(f"{prefix}{right_ts}")]
    cols += [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols]
    return out.select(*cols)


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str] | None,
    point_col: str,
    start_col: str,
    stop_col: str,
    bin_width_seconds: int = 86400,
) -> DataFrame:
    """Containment join: every (point, interval) pair with
    ``start <= point < stop`` (half-open) sharing the ``on`` keys —
    as an EQUI-join on (keys..., bin) instead of the nested-loop plan
    Catalyst gives an inequality join.

    Intervals are exploded onto every ``bin_width_seconds``-wide bin
    they touch; a point lives in exactly one bin, so no post-join
    dedup is needed. Pick the bin width near the TYPICAL interval
    length: replication factor is ``len/width + 1`` while a too-wide
    bin degrades bucket selectivity back toward the cartesian join.
    Timestamp columns are binned on their epoch-microsecond value;
    plain numerics work too (``bin_width_seconds`` is then in the
    column's own unit).

    Output: all point columns + all interval columns (caller aliases
    collisions beforehand).
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    if set(points.columns) & set(intervals.columns) - set(keys):
        raise ValueError(
            "points and intervals share non-key column names — alias them "
            f"first: {sorted(set(points.columns) & set(intervals.columns) - set(keys))}"
        )
    wid = int(bin_width_seconds) * 1_000_000

    # unix_micros for timestamps (NTZ cast through LTZ — the session-tz
    # shift is IDENTICAL for points and intervals, so bins stay aligned
    # and the residual predicate compares original values); plain
    # numerics scale by the same 1e6 so bin_width_seconds keeps one
    # meaning
    def micros(df, c):
        dt = dict(df.dtypes)[c]
        if dt.startswith("timestamp"):
            return F.unix_micros(F.col(c).cast("timestamp_ltz"))
        return F.col(c).cast("long") * 1_000_000

    p = points.withColumn("_bin", F.floor(micros(points, point_col) / wid))
    i = intervals.withColumn(
        "_bins",
        F.sequence(
            F.floor(micros(intervals, start_col) / wid),
            F.floor(micros(intervals, stop_col) / wid),
        ),
    ).withColumn("_bin", F.explode("_bins")).drop("_bins")
    cond = [p["_bin"] == i["_bin"]] + [p[k] == i[k] for k in keys]
    out = (
        p.join(i, cond)
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(stop_col))
        )
        .drop(i["_bin"])
        .drop("_bin")
    )
    for k in keys:
        out = out.drop(i[k])
    return out


def sequence_motifs(
    events: DataFrame,
    k: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    sep: str = " > ",
) -> DataFrame:
    """Per-user consecutive event-type k-grams -> global (motif, n)
    counts: the sequential-pattern slot of event analytics (what did
    users do in a row), the exact-counting core of PrefixSpan-style
    mining restricted to CONTIGUOUS patterns — the variant that needs
    one window pass instead of a candidate-growth loop, and the one
    that scales: lead() over a (user)-partitioned (ts, tiebreak)
    order + one count aggregation, no self-joins, no explosion beyond
    one row per event.

    The tiebreak column makes the order TOTAL — equal timestamps
    otherwise make motif counts partitioning-dependent, which is the
    same determinism bug class the repo pins everywhere else.  Motifs
    shorter than k (session tails) are dropped.
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(tiebreak_col)
    )
    parts = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, k)
    ]
    motif = F.concat_ws(sep, *parts)
    return (
        events.select(
            motif.alias("motif"),
            F.lead(type_col, k - 1).over(w).isNotNull().alias("__full"),
        )
        .filter(F.col("__full"))
        .groupBy("motif")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
