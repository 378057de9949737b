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
    """Fixed-width lowercase hex threshold for a keep-fraction."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * _SPACE), _SPACE - 1), "08x")


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
