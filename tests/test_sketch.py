"""HyperLogLog register sketch vs a pure-Python bit-chain mirror,
estimate accuracy vs exact distinct counts, and the merge law."""

import hashlib

import pytest
from hypothesis import given, settings, strategies as st

from pawpaw_spark.operators.sketch import hll_estimate, hll_merge, hll_registers


def py_registers(vals, b):
    regs = {}
    for v in vals:
        h = hashlib.md5(str(v).encode()).hexdigest()
        hi = int(h[:8], 16)
        lo = int(h[8:16], 16)
        bucket = hi >> (32 - b)
        w = (hi & ((1 << (32 - b)) - 1)) * (1 << 32) + lo
        rho = (64 - b + 1) if w == 0 else (64 - b + 1) - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _vals_df(spark, vals):
    return spark.createDataFrame([(str(v),) for v in vals], "v string")


class TestRegisters:
    def test_matches_python(self, spark):
        vals = [f"item-{i}" for i in range(500)] + ["item-0", "item-1"]
        got = {
            r.bucket: r.max_rho
            for r in hll_registers(_vals_df(spark, vals), "v", b=6).collect()
        }
        assert got == py_registers(vals, 6)

    def test_duplicates_do_not_move_registers(self, spark):
        once = hll_registers(_vals_df(spark, ["a", "b", "c"]), "v", b=8)
        thrice = hll_registers(
            _vals_df(spark, ["a", "b", "c"] * 3), "v", b=8
        )
        assert sorted(map(tuple, once.collect())) == sorted(
            map(tuple, thrice.collect())
        )

    def test_nulls_skipped(self, spark):
        df = spark.createDataFrame([("a",), (None,), ("b",)], "v string")
        regs = hll_registers(df, "v", b=8).collect()
        assert {r.bucket: r.max_rho for r in regs} == py_registers(
            ["a", "b"], 8
        )

    def test_groups(self, spark):
        df = spark.createDataFrame(
            [("g1", "a"), ("g1", "b"), ("g2", "a")], "g string, v string"
        )
        got = {
            (r.g, r.bucket): r.max_rho
            for r in hll_registers(df, "v", b=6, group_cols=("g",)).collect()
        }
        want = {
            ("g1", k): v for k, v in py_registers(["a", "b"], 6).items()
        } | {("g2", k): v for k, v in py_registers(["a"], 6).items()}
        assert got == want

    def test_b_guard(self, spark):
        with pytest.raises(ValueError, match="b must"):
            hll_registers(_vals_df(spark, ["a"]), "v", b=3)

    @given(
        n=st.integers(1, 60),
        b=st.sampled_from([4, 8, 12]),
    )
    @settings(max_examples=10, deadline=None, derandomize=True)
    def test_property_matches_python(self, spark, n, b):
        vals = [f"v{i}" for i in range(n)]
        got = {
            r.bucket: r.max_rho
            for r in hll_registers(_vals_df(spark, vals), "v", b=b).collect()
        }
        assert got == py_registers(vals, b)


class TestEstimate:
    def _est(self, spark, vals, b):
        regs = hll_registers(_vals_df(spark, vals), "v", b=b)
        return hll_estimate(regs, b=b).collect()[0].n_distinct_est

    def test_small_range_linear_counting(self, spark):
        # n << m: the linear-counting branch, near-exact
        est = self._est(spark, [f"x{i}" for i in range(30)], b=12)
        assert est == pytest.approx(30, rel=0.02)

    def test_mid_cardinality(self, spark):
        est = self._est(spark, [f"doc-{i}" for i in range(5000)], b=12)
        # expected rel stderr 1.04/sqrt(4096) ~ 1.6%; allow 4 sigma
        assert est == pytest.approx(5000, rel=0.07)

    def test_insensitive_to_duplicates(self, spark):
        vals = [f"d{i}" for i in range(800)]
        a = self._est(spark, vals, b=10)
        bb = self._est(spark, vals * 5, b=10)
        assert a == bb

    def test_grouped(self, spark):
        rows = [("g1", f"a{i}") for i in range(200)] + [
            ("g2", f"b{i}") for i in range(40)
        ]
        df = spark.createDataFrame(rows, "g string, v string")
        regs = hll_registers(df, "v", b=10, group_cols=("g",))
        got = {
            r.g: r.n_distinct_est
            for r in hll_estimate(regs, b=10, group_cols=("g",)).collect()
        }
        assert got["g1"] == pytest.approx(200, rel=0.15)
        assert got["g2"] == pytest.approx(40, rel=0.15)


class TestMerge:
    def test_merge_equals_union_sketch(self, spark):
        a = [f"a{i}" for i in range(300)]
        b = [f"b{i}" for i in range(300)] + a[:100]
        ra = hll_registers(_vals_df(spark, a), "v", b=8)
        rb = hll_registers(_vals_df(spark, b), "v", b=8)
        merged = sorted(
            map(tuple, hll_merge(ra.unionByName(rb)).collect())
        )
        direct = sorted(
            map(tuple, hll_registers(_vals_df(spark, a + b), "v", b=8).collect())
        )
        assert merged == direct

    def test_estimate_over_unioned_sketches_is_merge_safe(self, spark):
        """hll_estimate collapses duplicate (group, bucket) rows first
        (the merge law), so estimating a UNION of stored sketches
        without an explicit hll_merge cannot corrupt the denominator."""
        from pawpaw_spark.operators.sketch import hll_estimate, hll_registers

        a = [f"a{i}" for i in range(300)]
        b = [f"b{i}" for i in range(200)] + a[:150]
        ra = hll_registers(_vals_df(spark, a), "v", b=8)
        rb = hll_registers(_vals_df(spark, b), "v", b=8)
        via_union = hll_estimate(ra.unionByName(rb), b=8).collect()[0][0]
        direct = hll_estimate(
            hll_registers(_vals_df(spark, a + b), "v", b=8), b=8
        ).collect()[0][0]
        assert via_union == direct
        assert via_union > 0


def py_cms(vals, depth, width, weights=None):
    import hashlib
    from collections import Counter

    c = Counter()
    for i, v in enumerate(vals):
        w = 1 if weights is None else weights[i]
        for r in range(depth):
            h = hashlib.md5(f"{r}:{v}".encode()).hexdigest()
            c[(r, int(h[:15], 16) % width)] += w
    return dict(c)


class TestCountMin:
    def test_cells_match_python(self, spark):
        from pawpaw_spark.operators.sketch import cms_build

        vals = [f"t{i % 7}" for i in range(100)]
        got = {
            (r.row, r.col): r.cnt
            for r in cms_build(
                _vals_df(spark, vals), "v", depth=3, width=64
            ).collect()
        }
        assert got == py_cms(vals, 3, 64)

    def test_lookup_overestimates_never_under(self, spark):
        from collections import Counter

        from pawpaw_spark.operators.sketch import cms_build, cms_lookup

        vals = [f"w{i % 11}" for i in range(220)] + ["hot"] * 50
        truth = Counter(vals)
        cms = cms_build(_vals_df(spark, vals), "v", depth=4, width=32)
        qs = spark.createDataFrame(
            [(v,) for v in truth], "v string"
        )
        est = {
            r.value: r.est
            for r in cms_lookup(cms, qs, depth=4, width=32).collect()
        }
        for v, t in truth.items():
            assert est[v] >= t  # CMS one-sided guarantee
        # a generous width bound: hot key stays well-separated
        assert est["hot"] >= 50

    def test_absent_value_estimates_from_empty_cells(self, spark):
        from pawpaw_spark.operators.sketch import cms_build, cms_lookup

        cms = cms_build(_vals_df(spark, ["a", "b"]), "v", depth=3, width=512)
        qs = spark.createDataFrame([("zzz-not-there",)], "v string")
        est = cms_lookup(cms, qs, depth=3, width=512).collect()[0].est
        # with width >> n the min row is almost surely an absent cell
        assert est == 0

    def test_merge_is_cellwise_sum(self, spark):
        from pyspark.sql import functions as F

        from pawpaw_spark.operators.sketch import cms_build

        a = [f"x{i % 5}" for i in range(40)]
        b = [f"x{i % 3}" for i in range(21)]
        ca = cms_build(_vals_df(spark, a), "v", depth=3, width=64)
        cb = cms_build(_vals_df(spark, b), "v", depth=3, width=64)
        merged = {
            (r.row, r.col): r.cnt
            for r in ca.unionByName(cb)
            .groupBy("row", "col")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        }
        direct = {
            (r.row, r.col): r.cnt
            for r in cms_build(
                _vals_df(spark, a + b), "v", depth=3, width=64
            ).collect()
        }
        assert merged == direct

    def test_weighted(self, spark):
        from pawpaw_spark.operators.sketch import cms_build

        df = spark.createDataFrame(
            [("a", 5), ("a", 2), ("b", 1)], "v string, w long"
        )
        got = {
            (r.row, r.col): r.cnt
            for r in cms_build(
                df, "v", depth=2, width=64, weight_col="w"
            ).collect()
        }
        assert got == py_cms(["a", "a", "b"], 2, 64, weights=[5, 2, 1])

    def test_guards(self, spark):
        from pawpaw_spark.operators.sketch import cms_build

        with pytest.raises(ValueError, match="depth"):
            cms_build(_vals_df(spark, ["a"]), "v", depth=0)


def py_bloom(values, m_bits, k):
    import hashlib

    words = {}
    for x in values:
        for i in range(k):
            pos = (
                int(hashlib.md5(f"{i}:{x}".encode()).hexdigest()[:15], 16)
                % m_bits
            )
            words[pos // 32] = words.get(pos // 32, 0) | (1 << (pos % 32))
    return words


def py_bloom_probe(x, words, m_bits, k):
    import hashlib

    for i in range(k):
        pos = (
            int(hashlib.md5(f"{i}:{x}".encode()).hexdigest()[:15], 16) % m_bits
        )
        if not words.get(pos // 32, 0) & (1 << (pos % 32)):
            return False
    return True


class TestBloom:
    M, K = 256, 3

    def _build(self, spark, values):
        from pawpaw_spark.operators.sketch import bloom_build

        df = spark.createDataFrame([(v,) for v in values], "v string")
        return bloom_build(df, "v", m_bits=self.M, k_hashes=self.K)

    def test_words_match_mirror(self, spark):
        values = [f"key_{i}" for i in range(40)]
        got = {r.word_idx: r.word for r in self._build(spark, values).collect()}
        assert got == py_bloom(values, self.M, self.K)

    def test_no_false_negatives_and_mirror_probe(self, spark):
        from pawpaw_spark.operators.sketch import bloom_probe

        members = [f"key_{i}" for i in range(40)]
        bloom = self._build(spark, members)
        probes = members + [f"other_{i}" for i in range(60)]
        pdf = spark.createDataFrame([(v,) for v in probes], "v string")
        got = {
            r.v: r.might_contain
            for r in bloom_probe(
                pdf, bloom, "v", m_bits=self.M, k_hashes=self.K
            ).collect()
        }
        assert all(got[m] for m in members)  # never a false negative
        words = py_bloom(members, self.M, self.K)
        for v in probes:
            assert got[v] == py_bloom_probe(v, words, self.M, self.K)
        # the tiny filter must produce SOME false positives, or the
        # probe branch isn't exercised
        assert any(got[o] for o in probes[40:])
        assert not all(got[o] for o in probes[40:])

    def test_union_merge(self, spark):
        from pyspark.sql import functions as F

        a = self._build(spark, ["x1", "x2"])
        b = self._build(spark, ["x3"])
        merged = (
            a.union(b)
            .groupBy("word_idx")
            .agg(F.expr("bit_or(word)").cast("long").alias("word"))
        )
        direct = self._build(spark, ["x1", "x2", "x3"])
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_validation(self, spark):
        import pytest as _pt

        from pawpaw_spark.operators.sketch import bloom_build

        df = spark.createDataFrame([("a",)], "v string")
        with _pt.raises(ValueError, match="power of two"):
            bloom_build(df, "v", m_bits=100)
        with _pt.raises(ValueError, match="k_hashes"):
            bloom_build(df, "v", k_hashes=0)


class TestExactQuantiles:
    def _run(self, spark, values, probs, **kw):
        from pawpaw_spark.operators.sketch import exact_quantiles

        df = spark.createDataFrame([(v,) for v in values], "v long")
        return {
            r.p: r.value
            for r in exact_quantiles(df, "v", probs, **kw).collect()
        }

    @staticmethod
    def _mirror(values, p):
        from fractions import Fraction
        from math import ceil

        s = sorted(values)
        k = min(len(s), ceil(Fraction(str(p)) * len(s)))
        return s[k - 1]

    def test_small_exact(self, spark):
        vals = [5, 1, 9, 3, 7]
        got = self._run(spark, vals, [0.2, 0.5, 1.0])
        assert got == {0.2: 1, 0.5: 5, 1.0: 9}

    def test_duplicates_and_skew(self, spark):
        vals = [0] * 50 + [10] * 40 + [2**40] * 10
        got = self._run(spark, vals, [0.5, 0.9, 0.95])
        assert got == {0.5: 0, 0.9: 10, 0.95: 2**40}

    def test_float_ceil_trap(self, spark):
        # 0.9 * 110 = 99.00000000000001 in float -> ceil 100: the wrong
        # element. Rational rank arithmetic must pick index 99 (1-based).
        vals = list(range(110))
        got = self._run(spark, vals, [0.9])
        assert got == {0.9: self._mirror(vals, 0.9)} == {0.9: 98}

    def test_matches_mirror_random(self, spark):
        import random

        rng = random.Random(7)
        vals = [rng.randrange(0, 2**50) for _ in range(300)]
        probs = [0.01, 0.25, 0.5, 0.75, 0.99]
        got = self._run(spark, vals, probs)
        assert got == {p: self._mirror(vals, p) for p in probs}

    def test_single_value(self, spark):
        assert self._run(spark, [42], [0.5, 1.0]) == {0.5: 42, 1.0: 42}

    def test_validation(self, spark):
        import pytest as _pt

        from pawpaw_spark.operators.sketch import exact_quantiles

        df = spark.createDataFrame([(1,)], "v long")
        with _pt.raises(ValueError, match="prob"):
            exact_quantiles(df, "v", [0.0])
        with _pt.raises(ValueError, match="non-empty"):
            exact_quantiles(df, "v", [])
        neg = spark.createDataFrame([(-1,)], "v long")
        with _pt.raises(ValueError, match="negative"):
            exact_quantiles(neg, "v", [0.5])
        empty = spark.createDataFrame([], "v long")
        with _pt.raises(ValueError, match="no non-null"):
            exact_quantiles(empty, "v", [0.5])


class TestWeightedQuantiles:
    def _brute(self, pairs, probs):
        from fractions import Fraction
        from math import ceil

        expanded = sorted(
            v for v, w in pairs for _ in range(w)
        )
        W = len(expanded)
        return {
            p: expanded[min(W, ceil(Fraction(str(p)) * W)) - 1]
            for p in probs
        }

    def test_matches_expanded_bruteforce(self, spark):
        import random

        from pawpaw_spark.operators.sketch import exact_quantiles

        rng = random.Random(7)
        pairs = [
            (rng.randint(0, 10**9), rng.randint(1, 9))
            for _ in range(500)
        ]
        probs = [0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
        df = spark.createDataFrame(pairs, "v long, w long")
        got = {
            r["p"]: r["value"]
            for r in exact_quantiles(
                df, "v", probs, weight_col="w"
            ).collect()
        }
        assert got == {float(p): v for p, v in
                       self._brute(pairs, probs).items()}

    def test_unit_weights_equal_unweighted(self, spark):
        from pawpaw_spark.operators.sketch import exact_quantiles

        vals = [(i * 37 % 1000, 1) for i in range(300)]
        df = spark.createDataFrame(vals, "v long, w long")
        a = exact_quantiles(df, "v", [0.5, 0.9]).collect()
        b = exact_quantiles(df, "v", [0.5, 0.9], weight_col="w").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_nonpositive_weight_raises(self, spark):
        import pytest

        from pawpaw_spark.operators.sketch import exact_quantiles

        df = spark.createDataFrame([(1, 0)], "v long, w long")
        with pytest.raises(ValueError, match="strictly positive"):
            exact_quantiles(df, "v", [0.5], weight_col="w")


class TestQuantileNullWeightGuard:
    def test_null_weight_raises(self, spark):
        from pawpaw_spark.operators.sketch import exact_quantiles

        df = spark.createDataFrame(
            [(1, 1), (2, None), (3, 2)], "v long, w long"
        )
        with pytest.raises(ValueError, match="NULL weight"):
            exact_quantiles(df, "v", [0.5], weight_col="w")
