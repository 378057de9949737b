"""Sorted-neighborhood blocking vs a brute-force rank oracle."""

import random

from pawpaw_spark.operators.linking import sorted_neighborhood_pairs


def _brute(rows, w):
    order = sorted((k, i) for i, k in rows)
    out = set()
    for x in range(len(order)):
        for d in range(1, w + 1):
            if x + d < len(order):
                out.add((order[x][1], order[x + d][1], d))
    return out


def _run(spark, rows, w, n_parts=None):
    df = spark.createDataFrame([(i, k) for i, k in rows], ["id", "key"])
    if n_parts:
        df = df.repartition(n_parts)
    got = {
        (r["id_a"], r["id_b"], r["d"])
        for r in sorted_neighborhood_pairs(
            df, "key", id_col="id", window=w
        ).collect()
    }
    return got


class TestSortedNeighborhood:
    def test_matches_bruteforce_with_heavy_ties(self, spark):
        rng = random.Random(77)
        # only 5 distinct keys over 200 rows: the id tiebreak carries
        # the total order through massive tie runs
        rows = [(f"r{i:03d}", f"k{rng.randint(0, 4)}") for i in range(200)]
        for w in (1, 3, 7):
            assert _run(spark, rows, w) == _brute(rows, w)

    def test_pair_count_closed_form(self, spark):
        rows = [(f"r{i:03d}", f"key{i % 13:02d}") for i in range(150)]
        w = 4
        got = _run(spark, rows, w)
        n = len(rows)
        assert len(got) == n * w - w * (w + 1) // 2

    def test_partitioning_invariance(self, spark):
        rows = [(f"r{i:03d}", f"z{(i * 37) % 50:02d}") for i in range(120)]
        assert _run(spark, rows, 3, n_parts=1) == _run(
            spark, rows, 3, n_parts=7
        )

    def test_adjacent_duplicates_surface(self, spark):
        rows = [("a1", "smith john"), ("a2", "smith jon"),
                ("b1", "smyth john"), ("c9", "zzz")]
        got = _run(spark, rows, 1)
        # sort order: smith john, smith jon, smyth john, zzz
        assert ("a1", "a2", 1) in got
        assert ("a2", "b1", 1) in got

    def test_no_cartesian_in_plan(self, spark):
        df = spark.createDataFrame(
            [(f"r{i}", f"k{i}") for i in range(10)], ["id", "key"]
        )
        plan = (
            sorted_neighborhood_pairs(df, "key")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestRangePartitionPersist:
    def test_cache_handle_attached_and_releasable(self, spark):
        # Round-5 ADVICE: the repartitionByRange frame must be
        # persisted so the offsets job and the rank join see the SAME
        # sampled range boundaries; the handle is attached for
        # cached_scope / release_session_caches like every operator
        # cache, so long sessions stay bounded.
        from pawpaw_spark.operators.dedup import unpersist_attached

        rows = [(i, f"k{i % 7:02d}") for i in range(50)]
        df = spark.createDataFrame(rows, ["id", "key"])
        out = sorted_neighborhood_pairs(df, "key", id_col="id", window=2)
        handles = getattr(out, "_pawpaw_cached", [])
        assert len(handles) == 1
        out.count()
        assert handles[0].storageLevel.useMemory
        unpersist_attached(out)
        assert not handles[0].storageLevel.useMemory

    def test_rank_consistency_many_partitions(self, spark):
        # With an unpersisted range frame the two jobs can sample
        # DIFFERENT boundaries; brute-force equality over a spread of
        # input partitionings is the observable invariant.
        rng = random.Random(41)
        rows = [
            (f"i{i:03d}", f"{rng.randint(0, 999):03d}") for i in range(300)
        ]
        for p in (2, 4, 8):
            assert _run(spark, rows, 3, n_parts=p) == _brute(rows, 3)
