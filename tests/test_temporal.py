"""Temporal joins (operators/temporal.py): as-of join vs a pure-Python
reference (and pandas.merge_asof semantics), binned range join vs
brute-force containment, plus plan guards (equi-join, never a nested
loop)."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from pawpaw_spark.operators.temporal import asof_join, range_join_binned


def py_asof(left, right):
    """left/right: (key, ts, val). For each left row, latest right with
    right.ts <= left.ts on the same key; ties at equal (key, ts) pick
    the max (ts, val) payload — the operator's documented collapse."""
    best = {}
    for k, ts, v in right:
        cur = best.setdefault(k, {})
        cur[ts] = max(cur.get(ts, (ts, v)), (ts, v))
    out = []
    for k, ts, v in left:
        cands = [(t2, pv) for t2, pv in best.get(k, {}).items() if t2 <= ts]
        match = max(cands)[1] if cands else None
        out.append((k, ts, v, match))
    return out


class TestAsof:
    def test_basic_backward_inclusive(self, spark):
        left = [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d")]
        right = [(1, 10, "r10"), (1, 15, "r15"), (1, 1, "r1"), (3, 2, "rx")]
        l = spark.createDataFrame(left, "k: long, ts: long, v: string")
        r = spark.createDataFrame(right, "k: long, ts: long, rv: string")
        got = {
            (x.k, x.ts): x.right_rv
            for x in asof_join(l, r, on="k", left_ts="ts", right_ts="ts").collect()
        }
        want = {
            (k, ts): (m[1] if m else None) for k, ts, v, m in py_asof(left, right)
        }
        assert got == want

    def test_tolerance(self, spark):
        l = spark.createDataFrame([(1, 100, "a")], "k: long, ts: long, v: string")
        r = spark.createDataFrame([(1, 10, "old")], "k: long, ts: long, rv: string")
        wide = asof_join(l, r, on="k", left_ts="ts", tolerance=F.lit(1000)).collect()[0]
        narrow = asof_join(l, r, on="k", left_ts="ts", tolerance=F.lit(50)).collect()[0]
        assert wide.right_rv == "old" and narrow.right_rv is None

    def test_tie_collapse_is_deterministic(self, spark):
        l = spark.createDataFrame([(1, 10, "a")], "k: long, ts: long, v: string")
        r = spark.createDataFrame(
            [(1, 10, "x"), (1, 10, "z"), (1, 10, "y")], "k: long, ts: long, rv: string"
        )
        for _ in range(3):
            assert asof_join(l, r, on="k", left_ts="ts").collect()[0].right_rv == "z"

    def test_no_join_node_in_plan(self, spark):
        l = spark.createDataFrame([(1, 10, "a")], "k: long, ts: long, v: string")
        r = spark.createDataFrame([(1, 5, "x")], "k: long, ts: long, rv: string")
        plan = asof_join(l, r, on="k", left_ts="ts")._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan  # union + window only

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(st.tuples(st.integers(0, 3), st.integers(0, 30), st.integers(0, 9)),
                 min_size=1, max_size=15),
        st.lists(st.tuples(st.integers(0, 3), st.integers(0, 30), st.integers(0, 9)),
                 min_size=0, max_size=15),
    )
    def test_property_vs_reference(self, spark, left, right):
        l = spark.createDataFrame(
            [(k, t, str(v)) for k, t, v in left], "k: long, ts: long, v: string"
        )
        r = spark.createDataFrame(
            [(k, t, str(v)) for k, t, v in right], "k: long, ts: long, rv: string"
        ) if right else spark.createDataFrame([], "k: long, ts: long, rv: string")
        rows = asof_join(l, r, on="k", left_ts="ts").collect()
        ref = py_asof(
            [(k, t, str(v)) for k, t, v in left],
            [(k, t, str(v)) for k, t, v in right],
        )
        want = {}
        for k, ts, v, m in ref:
            want.setdefault((k, ts, v), m[1] if m else None)
        for x in rows:
            assert x.right_rv == want[(x.k, x.ts, x.v)]


class TestRangeJoin:
    def _ref(self, points, intervals):
        return {
            (p, i)
            for p, (kp, tp) in enumerate(points)
            for i, (ki, s, e) in enumerate(intervals)
            if kp == ki and s <= tp < e
        }

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(st.tuples(st.integers(0, 2), st.integers(0, 500)), min_size=1, max_size=12),
        st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 500), st.integers(0, 200)),
            min_size=1, max_size=8,
        ),
        st.sampled_from([1, 7, 100]),
    )
    def test_property_vs_brute(self, spark, pts, ints, width):
        points = [(k, t) for k, t in pts]
        intervals = [(k, s, s + d) for k, s, d in ints]
        p = spark.createDataFrame(
            [(i, k, t) for i, (k, t) in enumerate(points)], "pid: long, k: long, t: long"
        )
        iv = spark.createDataFrame(
            [(i, k, s, e) for i, (k, s, e) in enumerate(intervals)],
            "iid: long, k: long, s: long, e: long",
        )
        got = {
            (r.pid, r.iid)
            for r in range_join_binned(
                p, iv, on="k", point_col="t", start_col="s", stop_col="e",
                bin_width_seconds=width,
            ).collect()
        }
        assert got == self._ref(points, intervals)

    def test_no_nested_loop(self, spark):
        p = spark.createDataFrame([(1, 1, 5)], "pid: long, k: long, t: long")
        iv = spark.createDataFrame([(1, 1, 0, 10)], "iid: long, k: long, s: long, e: long")
        plan = range_join_binned(
            p, iv, on="k", point_col="t", start_col="s", stop_col="e", bin_width_seconds=7
        )._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan

    def test_column_collision_raises(self, spark):
        p = spark.createDataFrame([(1, 1)], "x: long, k: long")
        iv = spark.createDataFrame([(1, 0, 10, 2)], "k: long, s: long, e: long, x: long")
        with pytest.raises(ValueError, match="alias"):
            range_join_binned(p, iv, on="k", point_col="x", start_col="s", stop_col="e")


class TestAsofDefaults:
    def test_default_right_cols_excludes_ts(self, spark):
        l = spark.createDataFrame([(1, 10, "a")], "k: long, ts: long, v: string")
        r = spark.createDataFrame([(1, 5, "x")], "k: long, ts: long, rv: string")
        out = asof_join(l, r, on="k", left_ts="ts")
        assert out.columns == ["k", "ts", "v", "right_ts", "right_rv"]
        row = out.collect()[0]
        assert row.right_ts == 5 and row.right_rv == "x"


class TestSequenceMotifs:
    def _run(self, spark, rows, k):
        from pawpaw_spark.operators.temporal import sequence_motifs

        df = spark.createDataFrame(
            rows, "user_id long, ts long, event_id long, event_type string"
        )
        return {
            r.motif: r.n
            for r in sequence_motifs(
                df, k=k, ts_col="ts", tiebreak_col="event_id"
            ).collect()
        }

    def test_hand_sessions(self, spark):
        rows = [
            (1, 1, 1, "view"), (1, 2, 2, "click"), (1, 3, 3, "buy"),
            (1, 4, 4, "view"),
            (2, 1, 5, "view"), (2, 2, 6, "click"), (2, 3, 7, "buy"),
        ]
        got = self._run(spark, rows, 3)
        assert got == {
            "view > click > buy": 2,
            "click > buy > view": 1,
        }

    def test_tie_break_is_total(self, spark):
        # equal ts: event_id orders (click before view at ts=5)
        rows = [
            (1, 5, 10, "click"), (1, 5, 11, "view"), (1, 6, 12, "buy"),
        ]
        assert self._run(spark, rows, 2) == {
            "click > view": 1,
            "view > buy": 1,
        }

    def test_short_sessions_dropped(self, spark):
        rows = [(1, 1, 1, "view"), (2, 1, 2, "view"), (2, 2, 3, "buy")]
        assert self._run(spark, rows, 3) == {}

    def test_mirror_random(self, spark):
        import random

        rng = random.Random(3)
        rows = [
            (u, rng.randrange(10), i, rng.choice("abc"))
            for i, u in enumerate(rng.choices(range(4), k=60))
        ]
        got = self._run(spark, rows, 2)
        sessions = {}
        for u, ts, eid, t in rows:
            sessions.setdefault(u, []).append((ts, eid, t))
        expect = {}
        for evs in sessions.values():
            evs.sort()
            for a, b in zip(evs, evs[1:]):
                m = f"{a[2]} > {b[2]}"
                expect[m] = expect.get(m, 0) + 1
        assert got == expect

    def test_k_validation(self, spark):
        import pytest as _pt

        from pawpaw_spark.operators.temporal import sequence_motifs

        df = spark.createDataFrame([(1, 1, 1, "a")], "user_id long, ts long, event_id long, event_type string")
        with _pt.raises(ValueError, match="k must"):
            sequence_motifs(df, k=1)
