"""Sum message passing vs a Python reference."""

import random

from pawpaw_spark.operators.graph import neighborhood_agg


def _py(edges, feats, rounds):
    es = sorted(set(edges))
    state = dict(feats)
    for _ in range(rounds):
        inc = {}
        for s, d in es:
            if s in state:
                inc[d] = inc.get(d, 0) + state[s]
        state = {
            n: v + inc.get(n, 0) for n, v in state.items()
        }
    return state


def _run(spark, edges, feats, rounds):
    e = spark.createDataFrame(edges, ["src", "dst"])
    f = spark.createDataFrame(list(feats.items()), ["node", "feat"])
    return {
        r["node"]: r["feat"]
        for r in neighborhood_agg(e, f, rounds=rounds).collect()
    }


class TestNeighborhoodAgg:
    def test_chain_path_counts(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "d")]
        feats = {n: 1 for n in "abcd"}
        got = _run(spark, edges, feats, 3)
        assert got == _py(edges, feats, 3)
        # all-ones init on a chain: round k at node d counts paths
        assert got["a"] == 1

    def test_random_graph_matches_reference(self, spark):
        rng = random.Random(99)
        nodes = [f"n{i}" for i in range(25)]
        edges = [
            (a, b)
            for a in nodes
            for b in nodes
            if a != b and rng.random() < 0.12
        ]
        feats = {n: rng.randint(0, 9) for n in nodes}
        for rounds in (0, 1, 2, 4):
            assert _run(spark, edges, feats, rounds) == _py(
                edges, feats, rounds
            )

    def test_duplicate_edges_collapse(self, spark):
        edges = [("a", "b")] * 5
        feats = {"a": 3, "b": 1}
        got = _run(spark, edges, feats, 1)
        assert got == {"a": 3, "b": 4}

    def test_missing_feature_endpoints_ignored(self, spark):
        edges = [("ghost", "a"), ("a", "b")]
        feats = {"a": 2, "b": 1}
        got = _run(spark, edges, feats, 1)
        assert got == {"a": 2, "b": 3}
