"""Rendezvous hashing + transitive reduction vs Python references."""

import hashlib
import random

import pytest

from pawpaw_spark.operators.graph_query import transitive_reduction
from pawpaw_spark.operators.sampling import rendezvous_assign


def _py_hrw(key, shards):
    return max(
        shards,
        key=lambda s: (hashlib.md5(f"{s}|{key}".encode()).hexdigest(), s),
    )


class TestRendezvous:
    def test_matches_python_argmax(self, spark):
        shards = ["nodeA", "nodeB", "nodeC", "nodeD", "nodeE"]
        rows = [(f"doc{i}",) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id string")
        got = {
            r["doc_id"]: r["shard"]
            for r in rendezvous_assign(df, shards).collect()
        }
        for (k,) in rows:
            assert got[k] == _py_hrw(k, shards)

    def test_minimal_disruption_on_shard_removal(self, spark):
        shards = ["s1", "s2", "s3", "s4"]
        rows = [(f"doc{i}",) for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id string")
        full = {
            r["doc_id"]: r["shard"]
            for r in rendezvous_assign(df, shards).collect()
        }
        less = {
            r["doc_id"]: r["shard"]
            for r in rendezvous_assign(df, shards[:-1]).collect()
        }
        moved = [k for k in full if full[k] != less[k]]
        # ONLY keys that lived on the removed shard move
        assert all(full[k] == "s4" for k in moved)
        assert set(moved) == {k for k, s in full.items() if s == "s4"}

    def test_validation(self, spark):
        df = spark.createDataFrame([("a",)], "doc_id string")
        with pytest.raises(ValueError):
            rendezvous_assign(df, [])
        with pytest.raises(ValueError):
            rendezvous_assign(df, ["x", "x"])


def _py_reduction(edges):
    es = {e for e in set(edges) if e[0] != e[1]}
    nodes = {n for e in es for n in e}
    adj = {n: set() for n in nodes}
    for a, b in es:
        adj[a].add(b)

    def reach(u):
        # nodes reachable from u via >= 1 edge
        seen, stack = set(), [u]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        return seen

    out = set()
    for a, b in es:
        # redundant iff some OTHER out-neighbor of a reaches b
        two_plus = any(
            mid != b and (b == mid or b in reach(mid)) for mid in adj[a]
        )
        if not two_plus:
            out.add((a, b))
    return out


class TestTransitiveReduction:
    def test_diamond_plus_shortcut(self, spark):
        edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
                 ("a", "d")]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {
            (r["src"], r["dst"])
            for r in transitive_reduction(df).collect()
        }
        assert got == {("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")}

    def test_chain_untouched(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "d")]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {
            (r["src"], r["dst"])
            for r in transitive_reduction(df).collect()
        }
        assert got == set(edges)

    def test_random_dags_match_bruteforce(self, spark):
        rng = random.Random(31337)
        for trial in range(3):
            n = 12
            edges = [
                (f"n{i:02d}", f"n{j:02d}")
                for i in range(n)
                for j in range(i + 1, n)
                if rng.random() < 0.3
            ]
            if not edges:
                continue
            df = spark.createDataFrame(edges, ["src", "dst"])
            got = {
                (r["src"], r["dst"])
                for r in transitive_reduction(df).collect()
            }
            assert got == _py_reduction(edges), f"trial {trial}"

    def test_cycle_raises(self, spark):
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
        )
        with pytest.raises(ValueError, match="DAG"):
            transitive_reduction(df).collect()
