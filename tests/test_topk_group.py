"""Grouped top-k vs a Python reference; plan has no window sort."""

import random

import pytest

from pawpaw_spark.operators.sampling import topk_per_group


def _brute(rows, k, descending=True):
    by = {}
    for g, v, i in rows:
        by.setdefault(g, []).append((v, i))
    out = set()
    for g, vs in by.items():
        vs.sort(key=lambda t: ((-t[0]) if descending else t[0], t[1]))
        for v, i in vs[:k]:
            out.add((g, v, i))
    return out


class TestTopkPerGroup:
    def test_matches_bruteforce_with_ties(self, spark):
        rng = random.Random(17)
        rows = [
            (f"g{rng.randint(0, 6)}", rng.randint(0, 9), f"id{i:03d}")
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "grp string, val long, id string")
        for k in (1, 3, 10):
            got = {
                (r["grp"], r["val"], r["id"])
                for r in topk_per_group(
                    df, "grp", "val", k, tiebreak_col="id"
                ).collect()
            }
            assert got == _brute(rows, k)

    def test_ascending(self, spark):
        rows = [("a", 5, "x"), ("a", 1, "y"), ("a", 3, "z")]
        df = spark.createDataFrame(rows, "grp string, val long, id string")
        got = {
            r["id"]
            for r in topk_per_group(
                df, "grp", "val", 2, tiebreak_col="id",
                descending=False,
            ).collect()
        }
        assert got == {"y", "z"}

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", "s", "x")],
                                   "grp string, val string, id string")
        with pytest.raises(ValueError, match="tiebreak"):
            topk_per_group(df, "grp", "val", 2)
        with pytest.raises(ValueError, match="numeric"):
            topk_per_group(df, "grp", "val", 2, tiebreak_col="id")

    def test_no_window_sort_in_plan(self, spark):
        df = spark.createDataFrame(
            [("a", i, f"x{i}") for i in range(20)],
            "grp string, val long, id string",
        )
        out = topk_per_group(df, "grp", "val", 3, tiebreak_col="id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "partial" in plan.lower() or "HashAggregate" in plan


class TestTopkRound5Regressions:
    def test_null_order_rows_excluded(self, spark):
        # NULL __o structs sort FIRST, so unfiltered they'd win slots.
        rows = [("g", None, "n1"), ("g", 5, "a"), ("g", 7, "b"),
                ("g", 6, "c"), ("h", None, "n2")]
        df = spark.createDataFrame(rows, "grp string, val long, id string")
        out = topk_per_group(df, "grp", "val", 2, tiebreak_col="id")
        got = sorted(r["id"] for r in out.collect())
        assert got == ["b", "c"]

    def test_salt_invariance(self, spark):
        rng = random.Random(23)
        rows = [
            (f"g{rng.randint(0, 2)}", rng.randint(0, 9), f"i{i:03d}")
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "grp string, val long, id string")
        expect = _brute(rows, 4)
        for s in (1, 3, 16):
            got = {
                (r["grp"], r["val"], r["id"])
                for r in topk_per_group(
                    df, "grp", "val", 4, tiebreak_col="id", salts=s
                ).collect()
            }
            assert got == expect, s

    def test_two_level_agg_no_window(self, spark):
        df = spark.createDataFrame(
            [("a", i, f"x{i}") for i in range(20)],
            "grp string, val long, id string",
        )
        out = topk_per_group(df, "grp", "val", 3, tiebreak_col="id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
