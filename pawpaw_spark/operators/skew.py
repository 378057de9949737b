"""Skew-defusing join helpers.

AQE's skew-join splitting handles most hot keys at runtime, but it only
kicks in for SORT-MERGE joins over materialized shuffle stats, and a
single mega-key inside one shuffle partition can still pin a straggler
(AQE splits a partition's FILES, not one key's hash bucket on the
build side of a broadcast-hash join fallback).  Salting is the explicit
fix: replicate the small side R times, scatter the big side's hot rows
across the R replicas, and the hottest reduce task shrinks by ~R.

``salted_join`` packages the pattern with the correctness argument in
one place: each big-side row carries exactly ONE salt value, and every
small-side row exists at ALL R salt values, so the (keys + salt)
equi-join matches exactly the pairs the plain (keys) join would — for
inner and left-outer joins the result multiset is IDENTICAL (each left
row meets each matching right row exactly once).  Right/full outer
joins would see the R-fold replication on unmatched right rows and are
rejected.

Reference: no counterpart (pawpaw is single-process); this is part of
the engine's 100 TB operational tier like storage.py's salted writes
(operators/segment.py:160 cites the same skew doctrine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["salted_join"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` (big, possibly hot-keyed) with ``right``
    (small enough to replicate ``n_salts`` x, too big or too dynamic to
    broadcast) -> the same rows as ``left.join(right, on, how)``, with
    the hottest key's reduce work spread over ``n_salts`` tasks.

    The salt is ``xxhash64(all left columns) mod n_salts`` —
    deterministic (re-runs produce identical partitioning, no RNG in
    the plan) and uniform across a hot key's rows regardless of key
    distribution.  The right side explodes a ``sequence(0, R-1)``
    literal: R small-side copies, one shuffle each side, no broadcast
    required.  ``how`` must be ``inner`` or ``left`` (see module doc).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} "
            "(right/full outer would replicate unmatched right rows)"
        )
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    keys = [on] if isinstance(on, str) else list(on)
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"non-key columns {sorted(overlap)} exist on both sides; "
            "rename before joining (the salted join returns a flat "
            "column set)"
        )
    salted_l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)),
    )
    salted_r = right.withColumn(
        "__rep", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumnRenamed("__rep", "__salt")
    return salted_l.join(salted_r, keys + ["__salt"], how).drop("__salt")
