"""4-clique census vs brute-force enumeration."""

import itertools
import random

from pawpaw_spark.operators.graph import four_clique_count


def _brute(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in es for n in e})
    count = {n: 0 for n in nodes}
    for quad in itertools.combinations(nodes, 4):
        if all(
            tuple(sorted(p)) in es for p in itertools.combinations(quad, 2)
        ):
            for n in quad:
                count[n] += 1
    return count


def _run(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["node"]: r["n_k4"]
        for r in four_clique_count(df).collect()
    }


def _clique(tag, k):
    nodes = [f"{tag}{i}" for i in range(k)]
    return [(a, b) for a, b in itertools.combinations(nodes, 2)]


class TestFourClique:
    def test_single_k4(self, spark):
        got = _run(spark, _clique("a", 4))
        assert got == {f"a{i}": 1 for i in range(4)}

    def test_k5_membership(self, spark):
        # every node of K5 sits in C(4,3) = 4 distinct K4s
        got = _run(spark, _clique("a", 5))
        assert got == {f"a{i}": 4 for i in range(5)}

    def test_k4_minus_edge_is_zero(self, spark):
        edges = _clique("a", 4)[:-1]
        got = _run(spark, edges)
        assert set(got.values()) == {0}

    def test_shared_node_two_cliques(self, spark):
        edges = _clique("a", 4) + _clique("b", 4)
        # glue: rename b0 -> a0 so the two K4s share one node
        edges = [
            tuple("a0" if n == "b0" else n for n in e) for e in edges
        ]
        got = _run(spark, edges)
        assert got["a0"] == 2
        assert got["a1"] == 1 and got["b1"] == 1

    def test_random_graphs_match_bruteforce(self, spark):
        rng = random.Random(4242)
        for trial in range(3):
            n = 14
            p = 0.45
            edges = [
                (f"n{i}", f"n{j}")
                for i in range(n)
                for j in range(i + 1, n)
                if rng.random() < p
            ]
            # duplicates + reversed + self loops must not change counts
            edges += [(b, a) for a, b in edges[::3]]
            edges += [("n0", "n0")]
            assert _run(spark, edges) == _brute(edges), f"trial {trial}"

    def test_directed_multi_edges_collapse(self, spark):
        edges = _clique("a", 4)
        edges += [(b, a) for a, b in edges] + edges
        got = _run(spark, edges)
        assert got == {f"a{i}": 1 for i in range(4)}
