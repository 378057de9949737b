"""Sampled-source Brandes betweenness: pure-Python Brandes mirror on
fixed and random graphs, truncation semantics, and edge cases."""

from collections import deque

import pytest
from hypothesis import given, settings, strategies as st

from pawpaw_spark.operators.graph import betweenness_sampled


def _py_brandes(edges, sources, max_depth=16):
    """Textbook Brandes (2001) restricted to the given sources, BFS
    truncated at max_depth."""
    adj: dict = {}
    nodes = set()
    for u, v in set(edges):
        adj.setdefault(u, []).append(v)
        nodes.add(u)
        nodes.add(v)
    bc = {v: 0.0 for v in nodes}
    for s in sources:
        if s not in nodes:
            continue
        sigma = {s: 1}
        dist = {s: 0}
        preds: dict = {s: []}
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            if dist[u] >= max_depth:
                continue
            for w in adj.get(u, []):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0
                    preds[w] = []
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
        for v in order:
            if v != s:
                bc[v] += delta[v]
    return bc


def _run(spark, edges, sources, max_depth=16):
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in sources], "node string")
    out = betweenness_sampled(e, s, max_depth=max_depth)
    return {r.node: r.bc for r in out.collect()}


class TestBetweenness:
    def test_path_graph(self, spark):
        # a -> b -> c -> d from source a: b and c are intermediates
        edges = [("a", "b"), ("b", "c"), ("c", "d")]
        got = _run(spark, edges, ["a"])
        assert got == {"a": 0.0, "b": 2.0, "c": 1.0, "d": 0.0}

    def test_diamond_sigma_split(self, spark):
        # two shortest paths a->d; b and c each carry half a dependency
        edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
                 ("d", "e")]
        got = _run(spark, edges, ["a"])
        ref = _py_brandes(edges, ["a"])
        assert got == pytest.approx(ref)
        assert got["b"] == pytest.approx(1.0)  # (1+delta_d)/2 = (1+1)/2

    def test_multi_source_and_absent_seed(self, spark):
        edges = [("a", "b"), ("b", "c"), ("x", "b")]
        got = _run(spark, edges, ["a", "x", "ghost"])
        ref = _py_brandes(edges, ["a", "x"])
        assert got == pytest.approx(ref)

    def test_truncation(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
        got = _run(spark, edges, ["a"], max_depth=2)
        ref = _py_brandes(edges, ["a"], max_depth=2)
        assert got == pytest.approx(ref)
        # beyond-horizon pairs are not counted
        assert got["c"] < _py_brandes(edges, ["a"])["c"]

    def test_cycle_and_guard(self, spark):
        edges = [("a", "b"), ("b", "a"), ("b", "c")]
        got = _run(spark, edges, ["a", "b"])
        assert got == pytest.approx(_py_brandes(edges, ["a", "b"]))
        with pytest.raises(ValueError, match="max_depth"):
            _run(spark, edges, ["a"], max_depth=0)

    @settings(max_examples=3, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=3, max_size=18,
    ), st.sets(st.integers(0, 7), min_size=1, max_size=3))
    def test_random_graphs_match_reference(self, spark, raw, seeds):
        edges = [(f"n{a}", f"n{b}") for a, b in raw if a != b]
        if not edges:
            return
        sources = [f"n{s}" for s in seeds]
        got = _run(spark, edges, sources, max_depth=8)
        ref = _py_brandes(edges, sources, max_depth=8)
        assert got == pytest.approx(ref)
