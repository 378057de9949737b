"""Edit-distance similarity join — PassJoin segment blocking.

Finds all string pairs within Levenshtein distance ``k`` WITHOUT the
O(n^2) cross product: Li, Deng & Feng's PassJoin (VLDB 2012) pigeonhole
scheme.  Split every string into ``k+1`` contiguous segments; any pair
within ``k`` edits leaves at least one segment UNTOUCHED, and an
untouched segment appears in the other string verbatim, shifted by at
most the number of edits before it (<= k).  So candidate generation is
an EQUI-join — (source-length, segment-slot, segment-text) keys — never
a similarity predicate, and every true pair is guaranteed captured
(lossless blocking; the verify step is exact, so the result is exact).

Scale shape (the 100 TB analysis):

* index side emits k+1 rows per string; probe side emits
  O((2k+1)^2 * (k+1)) short substrings per string — both constant
  per-row fan-outs, generated JVM-side (``transform``/``sequence``
  column expressions, no Python);
* the candidate join is a hash equi-join on (l, i, seg) — segment keys
  carry the source length AND the slot index, so only same-slot
  same-length-class segments collide.  Identifier corpora make these
  keys selective; a pathological shared-prefix corpus can still hot-key
  one segment, and ``max_key_freq`` (OPTIONAL — it trades recall for a
  bound, so it is off by default and loud in the docstring) drops
  segment keys whose index-side frequency exceeds the cap;
* verification touches candidate PAIRS only: ids are deduplicated
  before the two text-fetch joins, and ``levenshtein`` (JVM codegen)
  is the exact filter.

Reference behavior spec: pawpaw has no similarity join; this is part of
the entity-linking enrichment tier (`operators/linking.py` minhash
blocking is set-similarity; PassJoin covers the EDIT-distance band
where token sets are identical but spellings drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["edit_distance_pairs"]


def _seg_exprs(k: int, l: str = "l") -> tuple[str, str]:
    """SQL fragments (functions of the length expression ``l`` and the
    lambda variable ``i``) for the even partition of a length-``l``
    string into ``m = k+1`` segments: the first ``m - l % m`` segments
    have length ``l div m``, the rest ``l div m + 1`` — 0-based char
    start and length of segment ``i``."""
    m = k + 1
    seg_len = (
        f"(CASE WHEN i < {m} - ({l}) % {m} THEN ({l}) DIV {m} "
        f"ELSE ({l}) DIV {m} + 1 END)"
    )
    seg_start = f"(i * (({l}) DIV {m}) + greatest(0, i - ({m} - ({l}) % {m})))"
    return seg_start, seg_len


def edit_distance_pairs(
    df: DataFrame,
    k: int = 1,
    id_col: str = "id",
    text_col: str = "text",
    max_key_freq: int | None = None,
) -> DataFrame:
    """All pairs of rows with ``levenshtein(text_a, text_b) <= k`` ->
    ``(id_a, id_b, distance)`` with ``id_a < id_b`` (string order),
    exact and total: PassJoin lossless segment blocking + exact
    verification, no cross product anywhere in the plan.

    ``max_key_freq`` (default None = exact) drops candidate-join keys
    whose index-side frequency exceeds the cap — a skew guard for
    adversarial shared-affix corpora that SACRIFICES the guarantee for
    those keys; leave it off unless a hot key is observed.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    if k == 0:
        # degenerate band: exact-duplicate join on the full text
        a = df.select(
            F.col(id_col).cast("string").alias("id_a"),
            F.col(text_col).alias("_t"),
        )
        b = df.select(
            F.col(id_col).cast("string").alias("id_b"),
            F.col(text_col).alias("_t"),
        )
        return (
            a.join(b, "_t")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.lit(0).alias("distance"))
        )

    seg_start, seg_len = _seg_exprs(k)
    ix_start, ix_len = _seg_exprs(k, l="char_length(t)")
    base = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).cast("string").alias("t"),
    ).filter(F.col("t").isNotNull())

    # -- index side: the k+1 segments of each string -------------------
    # key = (source length l, slot i, segment text); the slot's char
    # start is a function of (l, i), so it need not travel.
    index = base.select(
        "id",
        F.explode(
            F.expr(
                f"""
                transform(sequence(0, {k}), i ->
                  named_struct(
                    'l', char_length(t),
                    'i', i,
                    'seg', CASE WHEN {ix_len} = 0 THEN ''
                                ELSE substring(t, {ix_start} + 1, {ix_len})
                           END))
                """
            )
        ).alias("s"),
    ).select("id", "s.l", "s.i", "s.seg")

    if max_key_freq is not None:
        hot = (
            index.groupBy("l", "i", "seg")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_key_freq)
            .select("l", "i", "seg")
        )
        index = index.join(F.broadcast(hot), ["l", "i", "seg"], "left_anti")

    # -- probe side: candidate substrings ------------------------------
    # for every plausible partner length l in [len-k, len+k] and slot i,
    # the slot's segment (computed FOR l) may sit in THIS string shifted
    # by at most k: enumerate those starts. sequence() is descending
    # when hi < lo, so the window is guarded to an empty array instead.
    probe = base.select(
        "id",
        F.explode(
            F.expr(
                f"""
                flatten(transform(
                  sequence(greatest(0, char_length(t) - {k}),
                           char_length(t) + {k}), l ->
                  flatten(transform(sequence(0, {k}), i ->
                    CASE WHEN {seg_len} = 0 THEN
                      array(named_struct('l', l, 'i', i, 'seg', ''))
                    WHEN least(char_length(t) - {seg_len},
                               {seg_start} + {k})
                         >= greatest(0, {seg_start} - {k}) THEN
                      transform(
                        sequence(greatest(0, {seg_start} - {k}),
                                 least(char_length(t) - {seg_len},
                                       {seg_start} + {k})),
                        p -> named_struct('l', l, 'i', i,
                               'seg', substring(t, p + 1, {seg_len})))
                    ELSE
                      CAST(array() AS array<struct<l:int,i:int,seg:string>>)
                    END))))
                """
            )
        ).alias("s"),
    ).select(F.col("id").alias("id_p"), "s.l", "s.i", "s.seg")

    # -- candidates: equi-join, then dedup to id pairs BEFORE any text
    # travels (the fan-out rows carry only short segments + ints)
    cand = (
        index.join(probe, ["l", "i", "seg"])
        .filter(F.col("id") != F.col("id_p"))
        .select(
            F.least("id", "id_p").alias("id_a"),
            F.greatest("id", "id_p").alias("id_b"),
        )
        .distinct()
    )

    # -- exact verify: two equi-joins fetch the texts, JVM levenshtein
    ta = base.select(F.col("id").alias("id_a"), F.col("t").alias("_ta"))
    tb = base.select(F.col("id").alias("id_b"), F.col("t").alias("_tb"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("distance", F.levenshtein("_ta", "_tb"))
        .filter(F.col("distance") <= k)
        .select("id_a", "id_b", "distance")
    )
