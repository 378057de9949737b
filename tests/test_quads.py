"""GRAPH-clause quad matching vs a brute-force binding oracle."""

import itertools

import pytest

from pawpaw_spark.operators.graph_query import match_quads

QUADS = [
    # graph g1: a chain  x -CALLS-> y -CALLS-> z,  y -TAG-> hot
    ("x", "CALLS", "y", "g1"),
    ("y", "CALLS", "z", "g1"),
    ("y", "TAG", "hot", "g1"),
    # graph g2: the same first hop, but the second hop differs
    ("x", "CALLS", "y", "g2"),
    ("y", "CALLS", "w", "g2"),
    ("q", "TAG", "hot", "g2"),
    # default graph (NULL label): must be invisible to GRAPH ?g
    ("x", "CALLS", "d", None),
    ("d", "CALLS", "z", None),
]


def _qdf(spark):
    return spark.createDataFrame(
        QUADS, "subj string, pred string, obj string, graph string"
    )


def _brute(pattern, graphs=None):
    """All bindings of pattern within a single graph, graph bound."""
    out = set()
    names = sorted({g for *_, g in QUADS if g is not None})
    for g in names if graphs is None else graphs:
        rows = [q[:3] for q in QUADS if q[3] == g]
        var_names = sorted(
            {t[1:] for tr in pattern for t in tr if t and t.startswith("?")}
        )
        for combo in itertools.product(rows, repeat=len(pattern)):
            env = {}
            ok = True
            for (s, p, o), (ts, tp, to) in zip(combo, pattern):
                for term, val in ((ts, s), (tp, p), (to, o)):
                    if term is None:
                        continue
                    if term.startswith("?"):
                        if env.setdefault(term[1:], val) != val:
                            ok = False
                    elif term != val:
                        ok = False
                if not ok:
                    break
            if ok:
                out.add(tuple(env[v] for v in var_names) + (g,))
    return out


class TestMatchQuads:
    def test_variable_graph_chain_stays_in_graph(self, spark):
        pat = [("?a", "CALLS", "?b"), ("?b", "CALLS", "?c")]
        got = {
            (r["a"], r["b"], r["c"], r["g"])
            for r in match_quads(_qdf(spark), pat, "?g").collect()
        }
        assert got == _brute(pat)
        # both chains exist wholly within their graphs
        assert got == {("x", "y", "z", "g1"), ("x", "y", "w", "g2")}
        # default-graph rows never bind a named-graph variable
        assert not any("d" in t for t in got)

    def test_variable_graph_no_cross_graph_join(self, spark):
        # y TAG hot lives in g1 only; g2's x->y must not borrow it
        pat = [("?a", "CALLS", "?b"), ("?b", "TAG", "hot")]
        got = {
            (r["a"], r["b"], r["g"])
            for r in match_quads(_qdf(spark), pat, "?g").collect()
        }
        assert got == _brute(pat)
        assert got == {("x", "y", "g1")}

    def test_variable_graph_disjoint_triples_product_per_graph(self, spark):
        pat = [("?a", "CALLS", "?b"), ("?t", "TAG", "hot")]
        got = {
            (r["a"], r["b"], r["t"], r["g"])
            for r in match_quads(_qdf(spark), pat, "?g").collect()
        }
        assert got == _brute(pat)
        # g2's TAG row pairs with g2's CALLS rows only
        assert ("x", "y", "q", "g2") in got
        assert ("x", "y", "y", "g1") in got
        assert ("x", "y", "q", "g1") not in got

    def test_constant_graph_delegates_full_features(self, spark):
        # a property path INSIDE a constant graph is allowed
        got = {
            (r["a"], r["b"])
            for r in match_quads(
                _qdf(spark), [("?a", "CALLS+", "?b")], "g1"
            ).collect()
        }
        assert got == {("x", "y"), ("y", "z"), ("x", "z")}

    def test_default_graph_none(self, spark):
        got = {
            (r["a"], r["b"])
            for r in match_quads(
                _qdf(spark), [("?a", "CALLS", "?b")], None
            ).collect()
        }
        assert got == {("x", "d"), ("d", "z")}

    def test_neq_under_variable_graph(self, spark):
        pat = [("?a", "CALLS", "?b"), ("?b", "CALLS", "?c")]
        got = {
            (r["a"], r["c"], r["g"])
            for r in match_quads(
                _qdf(spark), pat, "?g", neq=[("?a", "?c")]
            ).collect()
        }
        assert got == {(a, c, g) for a, b, c, g in _brute(pat) if a != c}

    def test_raises(self, spark):
        q = _qdf(spark)
        with pytest.raises(ValueError, match="path predicate"):
            match_quads(q, [("?a", "CALLS+", "?b")], "?g")
        with pytest.raises(ValueError, match="MINUS"):
            match_quads(
                q, [("?a", "CALLS", "?b")], "?g",
                minus=[[("?b", "TAG", "?t")]],
            )
        with pytest.raises(ValueError, match="reused"):
            match_quads(q, [("?a", "CALLS", "?g")], "?g")

    def test_optional_scopes_to_active_graph(self, spark):
        # the TAG is on y only in g1: g2's chain keeps a NULL ?t
        pat = [("?a", "CALLS", "?b")]
        got = {
            (r["a"], r["b"], r["t"], r["g"])
            for r in match_quads(
                _qdf(spark), pat, "?g",
                optional=[[("?b", "TAG", "?t")]],
            ).collect()
        }
        assert ("x", "y", "hot", "g1") in got
        assert ("x", "y", None, "g2") in got  # no cross-graph borrow
        assert ("y", "w", None, "g2") in got

    def test_not_exists_scopes_to_active_graph(self, spark):
        # drop bindings whose ?b is TAGged in the SAME graph only
        pat = [("?a", "CALLS", "?b")]
        got = {
            (r["a"], r["b"], r["g"])
            for r in match_quads(
                _qdf(spark), pat, "?g",
                not_exists=[[("?b", "TAG", "?t")]],
            ).collect()
        }
        # g1: x->y dropped (y tagged in g1); y->z kept
        # g2: x->y KEPT (y tagged only in g1), y->w kept
        assert got == {("y", "z", "g1"), ("x", "y", "g2"),
                       ("y", "w", "g2")}
