"""Basic-graph-pattern matcher vs a brute-force pure-Python binder:
fixed motifs (paths, wedges, triangles, constants, self loops) and a
hypothesis sweep over random graphs × random connected patterns."""

import itertools

import pytest
from hypothesis import given, settings, strategies as st

from pawpaw_spark.operators.graph_query import match_pattern, path_pairs
from pyspark.sql import functions as F


def py_match(triples, pattern, neq=(), distinct=True):
    """Brute-force: enumerate every assignment of edges to pattern
    triples, keep consistent variable bindings."""
    is_var = lambda t: isinstance(t, str) and t.startswith("?")
    var_order = []
    for t in pattern:
        for x in t:
            if is_var(x) and x[1:] not in var_order:
                var_order.append(x[1:])
    out = []
    for combo in itertools.product(triples, repeat=len(pattern)):
        env = {}
        ok = True
        for (ps, pp, po), (es, ep, eo) in zip(pattern, combo):
            for term, val in ((ps, es), (pp, ep), (po, eo)):
                if term is None:
                    continue
                if is_var(term):
                    v = term[1:]
                    if env.setdefault(v, val) != val:
                        ok = False
                elif term != val:
                    ok = False
            if not ok:
                break
        if not ok:
            continue
        if any(env[a[1:]] == env[b[1:]] for a, b in neq):
            continue
        out.append(tuple(env[v] for v in var_order))
    return set(out) if distinct else sorted(out)


def edges_df(spark, triples):
    return spark.createDataFrame(
        list(triples), "subj string, pred string, obj string"
    )


G1 = [
    ("f1", "DEFINES", "a"),
    ("f1", "DEFINES", "b"),
    ("f2", "DEFINES", "c"),
    ("a", "CALLS", "c"),
    ("b", "CALLS", "c"),
    ("c", "CALLS", "a"),
    ("c", "CALLS", "c"),
]


class TestFixedMotifs:
    def run(self, spark, pattern, neq=(), **kw):
        got = {
            tuple(r)
            for r in match_pattern(
                edges_df(spark, G1), pattern, neq=neq, **kw
            ).collect()
        }
        want = py_match(G1, pattern, neq=neq)
        assert got == want and got  # non-vacuous

    def test_two_hop_path(self, spark):
        self.run(spark, [("?x", "CALLS", "?y"), ("?y", "CALLS", "?z")])

    def test_wedge_neq(self, spark):
        self.run(
            spark,
            [("?a", "CALLS", "?s"), ("?b", "CALLS", "?s")],
            neq=[("?a", "?b")],
        )

    def test_cross_file_dependency(self, spark):
        self.run(
            spark,
            [
                ("?f", "DEFINES", "?s"),
                ("?s", "CALLS", "?t"),
                ("?g", "DEFINES", "?t"),
            ],
            neq=[("?f", "?g")],
        )

    def test_constant_endpoint(self, spark):
        self.run(spark, [("?f", "DEFINES", "?s"), ("?s", "CALLS", "c")])

    def test_pred_variable(self, spark):
        self.run(spark, [("f1", "?p", "?x")])

    def test_pred_wildcard_unbound(self, spark):
        got = {
            tuple(r)
            for r in match_pattern(
                edges_df(spark, G1), [("c", None, "?x")]
            ).collect()
        }
        assert got == {("a",), ("c",)}

    def test_self_loop_var(self, spark):
        got = {
            tuple(r)
            for r in match_pattern(
                edges_df(spark, G1), [("?x", "CALLS", "?x")]
            ).collect()
        }
        assert got == {("c",)}

    def test_cyclic_triangle(self, spark):
        tri = [("a", "E", "b"), ("b", "E", "c"), ("c", "E", "a"),
               ("a", "E", "c")]
        pattern = [("?x", "E", "?y"), ("?y", "E", "?z"), ("?z", "E", "?x")]
        got = {
            tuple(r)
            for r in match_pattern(edges_df(spark, tri), pattern).collect()
        }
        assert got == py_match(tri, pattern)

    def test_multiplicity_collapses_when_distinct(self, spark):
        dup = [("a", "E", "b"), ("a", "E", "b")]
        df = edges_df(spark, dup)
        assert match_pattern(df, [("?x", "E", "?y")]).count() == 1
        assert (
            match_pattern(df, [("?x", "E", "?y")], distinct=False).count()
            == 2
        )


class TestValidation:
    def test_disconnected_raises(self, spark):
        with pytest.raises(ValueError, match="disconnected"):
            match_pattern(
                edges_df(spark, G1),
                [("?a", "CALLS", "?b"), ("?c", "DEFINES", "?d")],
            )

    def test_disconnected_opt_in(self, spark):
        pattern = [("?a", "CALLS", "?s"), ("?f", "DEFINES", "?d")]
        got = {
            tuple(r)
            for r in match_pattern(
                edges_df(spark, G1), pattern, allow_product=True
            ).collect()
        }
        assert got == py_match(G1, pattern)

    def test_empty_pattern_raises(self, spark):
        with pytest.raises(ValueError, match="at least one"):
            match_pattern(edges_df(spark, G1), [])

    def test_all_constant_pattern_raises(self, spark):
        with pytest.raises(ValueError, match="binds no variables"):
            match_pattern(edges_df(spark, G1), [("a", "CALLS", "c")])

    def test_constant_triple_existence_holds(self, spark):
        # ('a','CALLS','c') exists in G1 -> acts as a no-op constraint
        pattern = [("a", "CALLS", "c"), ("?f", "DEFINES", "?s")]
        got = {
            tuple(r)
            for r in match_pattern(edges_df(spark, G1), pattern).collect()
        }
        assert got == py_match(G1, pattern) and got

    def test_constant_triple_existence_fails(self, spark):
        # no such edge -> whole pattern is unsatisfiable
        pattern = [("a", "CALLS", "zzz"), ("?f", "DEFINES", "?s")]
        assert match_pattern(edges_df(spark, G1), pattern).count() == 0

    def test_constant_triple_wildcard_pred(self, spark):
        pattern = [("c", None, "a"), ("?f", "DEFINES", "?s")]
        got = {
            tuple(r)
            for r in match_pattern(edges_df(spark, G1), pattern).collect()
        }
        assert got == py_match(G1, pattern) and got

    def test_wildcard_pred_not_counted_as_constant(self, spark):
        # ('c', None, '?x') has 1 real constant; ('?f','DEFINES','s-zz')
        # has 2 -> the latter must seed the join tree even though the
        # wildcard triple textually has two non-var terms
        from pawpaw_spark.operators.graph_query import _order_triples

        pattern = [("c", None, "?x"), ("?x", "DEFINES", "zz")]
        assert _order_triples(pattern, False)[0] == ("?x", "DEFINES", "zz")

    def test_neq_unknown_var_raises(self, spark):
        with pytest.raises(ValueError, match="not in the required pattern"):
            match_pattern(
                edges_df(spark, G1),
                [("?a", "CALLS", "?b")],
                neq=[("?a", "?zz")],
            )

    def test_no_cartesian_in_connected_plan(self, spark):
        df = match_pattern(
            edges_df(spark, G1),
            [("?f", "DEFINES", "?s"), ("?s", "CALLS", "?t")],
        )
        physical = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in physical
        assert "BroadcastNestedLoopJoin" not in physical


@st.composite
def graph_and_pattern(draw):
    nodes = ["a", "b", "c", "d"]
    preds = ["P", "Q"]
    triples = draw(
        st.lists(
            st.tuples(
                st.sampled_from(nodes),
                st.sampled_from(preds),
                st.sampled_from(nodes),
            ),
            min_size=1,
            max_size=12,
            unique=True,
        )
    )
    # connected 2-triple pattern sharing ?m
    shapes = [
        [("?x", "P", "?m"), ("?m", "Q", "?y")],
        [("?x", "P", "?m"), ("?y", "P", "?m")],
        [("?m", "P", "?x"), ("?m", "Q", "?y")],
        [("?x", "?p", "?m"), ("?m", "Q", "?y")],
    ]
    return triples, draw(st.sampled_from(shapes))


class TestProperty:
    @settings(max_examples=12, deadline=None)
    @given(gp=graph_and_pattern())
    def test_matches_bruteforce(self, spark, gp):
        triples, pattern = gp
        got = {
            tuple(r)
            for r in match_pattern(edges_df(spark, triples), pattern).collect()
        }
        assert got == py_match(triples, pattern)


def py_match_optional(triples, pattern, optional):
    """Brute-force OPTIONAL mirror: required bindings via enumeration,
    each group's solutions (consistent with the required binding)
    cross-multiplied, no-solution groups contribute one all-None row.
    Output column order = required mention order, then each group's
    new variables in mention order (the engine's contract)."""
    is_var = lambda t: isinstance(t, str) and t.startswith("?")

    def envs(pat, base):
        outs = []
        for combo in itertools.product(triples, repeat=len(pat)):
            env = dict(base)
            ok = True
            for (ps, pp, po), (es, ep, eo) in zip(pat, combo):
                for term, val in ((ps, es), (pp, ep), (po, eo)):
                    if term is None:
                        continue
                    if is_var(term):
                        if env.setdefault(term[1:], val) != val:
                            ok = False
                    elif term != val:
                        ok = False
                if not ok:
                    break
            if ok:
                outs.append(env)
        return outs

    req_order = []
    for t in pattern:
        for x in t:
            if is_var(x) and x[1:] not in req_order:
                req_order.append(x[1:])
    group_new = []
    seen = set(req_order)
    for grp in optional:
        order = []
        for t in grp:
            for x in t:
                if is_var(x) and x[1:] not in seen:
                    seen.add(x[1:])
                    order.append(x[1:])
        group_new.append(order)

    rows = set()
    for env in envs(pattern, {}):
        per = []
        for grp, new in zip(optional, group_new):
            sols = envs(grp, env)
            proj = {tuple(s[v] for v in new) for s in sols}
            per.append(sorted(proj) or [tuple(None for _ in new)])
        for combo in itertools.product(*per):
            rows.add(
                tuple(env[v] for v in req_order)
                + tuple(x for c in combo for x in c)
            )
    return rows


G2 = G1 + [("f3", "DEFINES", "d")]  # d is defined but calls nothing


class TestOptional:
    def _run(self, spark, triples, pattern, optional, **kw):
        return {
            tuple(r)
            for r in match_pattern(
                edges_df(spark, triples), pattern, optional=optional, **kw
            ).collect()
        }

    def test_unmatched_rows_keep_nulls(self, spark):
        pattern = [("?f", "DEFINES", "?s")]
        optional = [[("?s", "CALLS", "?t")]]
        got = self._run(spark, G2, pattern, optional)
        want = py_match_optional(G2, pattern, optional)
        assert got == want
        assert ("f3", "d", None) in got

    def test_multi_triple_group(self, spark):
        # callee AND the file defining it, as one optional unit
        pattern = [("?f", "DEFINES", "?s")]
        optional = [[("?s", "CALLS", "?t"), ("?g", "DEFINES", "?t")]]
        got = self._run(spark, G2, pattern, optional)
        assert got == py_match_optional(G2, pattern, optional)

    def test_two_groups_product_and_nulls(self, spark):
        pattern = [("?f", "DEFINES", "?s")]
        optional = [[("?s", "CALLS", "?t")], [("?x", "CALLS", "?s")]]
        got = self._run(spark, G2, pattern, optional)
        assert got == py_match_optional(G2, pattern, optional)
        # d calls nothing and nothing calls d: both groups null
        assert ("f3", "d", None, None) in got

    def test_optional_with_neq_on_required(self, spark):
        pattern = [("?f", "DEFINES", "?s"), ("?s", "CALLS", "?t")]
        optional = [[("?g", "DEFINES", "?t")]]
        got = self._run(spark, G2, pattern, optional, neq=[("?s", "?t")])
        base = py_match_optional(G2, pattern, optional)
        want = {r for r in base if r[1] != r[2]}
        assert got == want

    def test_guards(self, spark):
        e = edges_df(spark, G1)
        with pytest.raises(ValueError, match="shares no variable"):
            match_pattern(
                e, [("?f", "DEFINES", "?s")],
                optional=[[("?x", "CALLS", "?y")]],
            )
        with pytest.raises(ValueError, match="two ?groups"):
            match_pattern(
                e, [("?f", "DEFINES", "?s")],
                optional=[[("?s", "CALLS", "?t")],
                          [("?t", "CALLS", "?s")]],
            )
        with pytest.raises(ValueError, match="binds no variables"):
            match_pattern(
                e, [("?f", "DEFINES", "?s")],
                optional=[[("a", "CALLS", "c")]],
            )
        with pytest.raises(ValueError, match="required pattern"):
            match_pattern(
                e, [("?f", "DEFINES", "?s")],
                optional=[[("?s", "CALLS", "?t")]],
                neq=[("?s", "?t")],
            )
        with pytest.raises(ValueError, match=">= 1 triple"):
            match_pattern(e, [("?f", "DEFINES", "?s")], optional=[[]])

    @given(
        triples=st.lists(
            st.tuples(
                st.sampled_from("abcd"),
                st.sampled_from(["P", "Q"]),
                st.sampled_from("abcd"),
            ),
            min_size=1,
            max_size=12,
        )
    )
    @settings(max_examples=15, deadline=None, derandomize=True)
    def test_property_one_group(self, spark, triples):
        pattern = [("?x", "P", "?y")]
        optional = [[("?y", "Q", "?z")]]
        got = self._run(spark, triples, pattern, optional)
        assert got == py_match_optional(triples, pattern, optional)


class TestStatsOrdering:
    def test_rare_predicate_seeds_tree(self):
        from pawpaw_spark.operators.graph_query import _order_triples

        pattern = [("?x", "COMMON", "?y"), ("?y", "RARE", "?z")]
        counts = {"COMMON": 100000, "RARE": 3}
        got = _order_triples(pattern, False, counts)
        assert got[0] == ("?y", "RARE", "?z")
        # constants-count heuristic alone cannot tell them apart
        assert _order_triples(pattern, False)[0] == pattern[0]

    def test_constant_endpoint_discounts(self):
        from pawpaw_spark.operators.graph_query import _order_triples

        # same predicate: the triple with a constant endpoint is the
        # smaller estimated slice
        pattern = [("?x", "E", "?y"), ("?y", "E", "zz")]
        got = _order_triples(pattern, False, {"E": 1000})
        assert got[0] == ("?y", "E", "zz")

    def test_path_scores_larger_than_any_slice(self):
        from pawpaw_spark.operators.graph_query import _order_triples

        pattern = [("?x", "E+", "?y"), ("?y", "F", "?z")]
        got = _order_triples(pattern, False, {"E": 10, "F": 900})
        assert got[0] == ("?y", "F", "?z")

    def test_results_identical_with_stats(self, spark):
        e = edges_df(spark, G1)
        pat = [
            ("?f", "DEFINES", "?s"),
            ("?s", "CALLS", "?t"),
            ("?g", "DEFINES", "?t"),
        ]
        a = {tuple(r) for r in match_pattern(e, pat, neq=[("?f", "?g")]).collect()}
        b = {
            tuple(r)
            for r in match_pattern(
                e, pat, neq=[("?f", "?g")], collect_stats=True
            ).collect()
        }
        assert a == b and a

    def test_optional_group_with_stats(self, spark):
        e = edges_df(spark, G1)
        pat = [("?f", "DEFINES", "?s")]
        opt = [[("?s", "CALLS", "?t"), ("?g", "DEFINES", "?t")]]
        a = {
            tuple(r)
            for r in match_pattern(e, pat, optional=opt).collect()
        }
        b = {
            tuple(r)
            for r in match_pattern(
                e, pat, optional=opt, collect_stats=True
            ).collect()
        }
        assert a == b and a


class TestNegatedPropertySet:
    TRIPLES = [
        ("a", "knows", "b"),
        ("a", "likes", "c"),
        ("b", "hates", "c"),
        ("c", "knows", "d"),
    ]

    def _pairs(self, spark, expr):
        from pawpaw_spark.operators.graph_query import path_pairs

        df = spark.createDataFrame(
            self.TRIPLES, "subj string, pred string, obj string"
        )
        return {(r.src, r.dst) for r in path_pairs(df, expr).collect()}

    def test_single_negation(self, spark):
        assert self._pairs(spark, "!knows") == {("a", "c"), ("b", "c")}

    def test_set_negation(self, spark):
        assert self._pairs(spark, "!(knows|likes)") == {("b", "c")}

    def test_nps_in_sequence(self, spark):
        # a -likes-> c -knows-> d : first hop must avoid knows
        assert ("a", "d") in self._pairs(spark, "!knows/knows")

    def test_nps_with_closure(self, spark):
        got = self._pairs(spark, "!hates+")
        assert ("a", "d") in got  # a->b (knows) -> ... c->d
        assert ("b", "c") not in got

    def test_parse_ast(self):
        from pawpaw_spark.operators.graph_query import parse_path

        assert parse_path("!(b|a|a)") == ("nps", ("a", "b"))
        assert parse_path("!p") == ("nps", ("p",))
        assert parse_path("!p*")[0] == "star"

    def test_parse_errors(self):
        import pytest as _pt

        from pawpaw_spark.operators.graph_query import parse_path

        with _pt.raises(ValueError, match="after '!'"):
            parse_path("!")
        with _pt.raises(ValueError, match="negated set"):
            parse_path("!(a|)")
        with _pt.raises(ValueError, match="'\\|' or '\\)'"):
            parse_path("!(a b)")


class TestAnchoredPathSeeding:
    """Round-5: constant-anchored +/* closures run as a seeded
    frontier (O(reachable)), not the full O(closure) pair table."""

    def _edges(self, spark, rows):
        return spark.createDataFrame(
            [(s, "CALLS", o) for s, o in rows],
            "subj string, pred string, obj string",
        )

    def _rand_rows(self, seed=3, n=18, m=40):
        import random

        rng = random.Random(seed)
        return list({
            (f"n{rng.randint(0, n)}", f"n{rng.randint(0, n)}")
            for _ in range(m)
        })

    def test_anchored_equals_filtered_full(self, spark):
        edges = self._edges(spark, self._rand_rows())
        for expr in ("CALLS+", "CALLS*", "^CALLS+", "^CALLS*"):
            full = path_pairs(edges, expr)
            for anchor in ("n1", "n5", "nowhere"):
                got_s = {
                    tuple(r)
                    for r in path_pairs(
                        edges, expr, anchor_src=anchor
                    ).filter(F.col("src") == anchor).collect()
                }
                want_s = {
                    tuple(r)
                    for r in full.filter(F.col("src") == anchor).collect()
                }
                assert got_s == want_s, (expr, anchor, "src")
                got_d = {
                    tuple(r)
                    for r in path_pairs(
                        edges, expr, anchor_dst=anchor
                    ).filter(F.col("dst") == anchor).collect()
                }
                want_d = {
                    tuple(r)
                    for r in full.filter(F.col("dst") == anchor).collect()
                }
                assert got_d == want_d, (expr, anchor, "dst")

    def test_match_pattern_anchored_results_unchanged(self, spark):
        edges = self._edges(spark, self._rand_rows(seed=9))
        full = path_pairs(edges, "CALLS+")
        want = {
            (r["dst"],)
            for r in full.filter(F.col("src") == "n2").select("dst").collect()
        }
        got = {
            tuple(r)
            for r in match_pattern(
                edges, [("n2", "CALLS+", "?x")]
            ).collect()
        }
        assert got == want

    def test_seeded_frontier_skips_deep_components(self, spark):
        # Behavioral plan-shape proof: a 40-hop chain needs 40
        # semi-naive rounds for the FULL closure, but the anchored
        # query's reachable set from the 3-node side converges in 2 —
        # with max_rounds=8 the full evaluation raises while the
        # anchored one succeeds, so the anchor genuinely seeded the
        # frontier instead of filtering the full closure.
        chain = [(f"c{i}", f"c{i+1}") for i in range(40)]
        small = [("a", "b"), ("b", "c")]
        edges = self._edges(spark, chain + small)
        with pytest.raises(RuntimeError, match="did not converge"):
            path_pairs(edges, "CALLS+", max_rounds=8).count()
        got = {
            tuple(r)
            for r in match_pattern(
                edges, [("a", "CALLS+", "?x")], path_max_rounds=8
            ).collect()
        }
        assert got == {("b",), ("c",)}
        # dst-anchored: who reaches 'c' (reverse radius 2)
        got = {
            tuple(r)
            for r in match_pattern(
                edges, [("?x", "CALLS+", "c")], path_max_rounds=8
            ).collect()
        }
        assert got == {("a",), ("b",)}

    def test_anchored_star_identity_only_for_graph_terms(self, spark):
        edges = self._edges(spark, [("a", "b")])
        got = {
            tuple(r)
            for r in path_pairs(edges, "CALLS*", anchor_src="a")
            .filter(F.col("src") == "a").collect()
        }
        assert got == {("a", "a"), ("a", "b")}
        # a constant absent from the graph gets NO zero-length pair
        got = path_pairs(edges, "CALLS*", anchor_src="zz") \
            .filter(F.col("src") == "zz").collect()
        assert got == []

    def test_anchored_radius_equal_to_max_rounds_converges(self, spark):
        # Review regression: emptiness must be checked AFTER each
        # expansion — a reachable set of hop radius == max_rounds
        # previously raised one round early.
        chain = [(f"c{i}", f"c{i+1}") for i in range(8)]
        edges = self._edges(spark, chain)
        got = {
            tuple(r)
            for r in path_pairs(
                edges, "CALLS+", anchor_src="c0", max_rounds=8
            ).collect()
        }
        assert got == {("c0", f"c{i}") for i in range(1, 9)}

    def test_anchored_with_square_falls_back_to_doubling(self, spark):
        # square=True promises log-round convergence; the linear
        # seeded frontier cannot honor it, so anchoring must not
        # regress a query that converges only by recursive doubling.
        chain = [(f"c{i}", f"c{i+1}") for i in range(40)]
        edges = self._edges(spark, chain)
        got = match_pattern(
            edges, [("c0", "CALLS+", "?x")],
            path_max_rounds=8, path_square=True,
        ).count()
        assert got == 40
