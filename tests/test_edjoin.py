"""Edit-distance similarity join (PassJoin) vs a brute-force oracle."""

import random

import pytest

from pawpaw_spark.operators.edjoin import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    """Textbook DP Levenshtein (the oracle)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(rows, k):
    out = set()
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1 :]:
            d = _lev(ta, tb)
            if d <= k:
                a, b = sorted([ia, ib])
                out.add((a, b, d))
    return out


def _run(spark, rows, k, **kw):
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in edit_distance_pairs(df, k=k, **kw).collect()
    }
    return got


class TestEdJoin:
    def test_planted_mutations_k1(self, spark):
        base = [f"symbol_{i:04d}" for i in range(40)]
        rows = [(f"b{i}", s) for i, s in enumerate(base)]
        # one substitution, one deletion, one insertion
        rows += [("s0", "Xymbol_0000"), ("d0", "symbol_000"),
                 ("i0", "symbol_00007")]
        got = _run(spark, rows, k=1)
        assert got == _brute(rows, 1)
        # the planted typos are all found against their sources
        assert ("b0", "s0", 1) in got
        assert ("b0", "d0", 1) in got
        assert ("b7", "i0", 1) in got

    @pytest.mark.parametrize("k", [1, 2, 3])
    def test_random_corpus_matches_bruteforce(self, spark, k):
        rng = random.Random(1234 + k)
        alphabet = "abcde"
        rows = []
        for i in range(120):
            n = rng.randint(0, 9)
            rows.append((f"r{i:03d}", "".join(rng.choice(alphabet)
                                              for _ in range(n))))
        # small alphabet + short strings => dense near-pair structure,
        # exercising zero-length segments, the empty string, and ties
        got = _run(spark, rows, k=k)
        assert got == _brute(rows, k)

    def test_alignment_guarantee_every_edit_position(self, spark):
        # one edit planted at EVERY position of a 12-char string: the
        # pigeonhole guarantee must hold at every alignment
        s = "abcdefghijkl"
        rows = [("base", s)]
        for p in range(len(s)):
            rows.append((f"sub{p:02d}", s[:p] + "Z" + s[p + 1 :]))
            rows.append((f"del{p:02d}", s[:p] + s[p + 1 :]))
            rows.append((f"ins{p:02d}", s[:p] + "Z" + s[p:]))
        got = _run(spark, rows, k=1)
        assert got == _brute(rows, 1)
        for p in range(len(s)):
            for tag in ("sub", "del", "ins"):
                a, b = sorted(["base", f"{tag}{p:02d}"])
                assert (a, b, 1) in got

    def test_k0_exact_duplicates(self, spark):
        rows = [("a", "xx"), ("b", "xx"), ("c", "xy"), ("d", "")]
        assert _run(spark, rows, k=0) == {("a", "b", 0)}

    def test_k2_deep_band(self, spark):
        rows = [("a", "kitten"), ("b", "sitting"), ("c", "mitten"),
                ("d", "kitte"), ("e", "bitten")]
        got = _run(spark, rows, k=2)
        assert got == _brute(rows, 2)
        assert ("a", "d", 1) in got  # deletion
        assert ("a", "c", 1) in got  # substitution
        # kitten->sitting is 3 edits: must NOT appear at k=2
        assert not any({x[0], x[1]} == {"a", "b"} for x in got)

    def test_max_key_freq_guard_drops_hot_keys(self, spark):
        # 30 identical strings: every segment key has frequency 30;
        # a cap of 5 removes them from candidate generation entirely
        rows = [(f"h{i}", "hothothot") for i in range(30)]
        assert _run(spark, rows, k=1, max_key_freq=5) == set()
        # and without the cap the full clique comes back
        full = _run(spark, rows, k=1)
        assert len(full) == 30 * 29 // 2

    def test_no_cartesian_in_plan(self, spark):
        df = spark.createDataFrame(
            [(f"r{i}", f"text_{i}") for i in range(10)], ["id", "text"]
        )
        plan = edit_distance_pairs(df, k=2)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
