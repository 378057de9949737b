"""SPARQL text front-end: parse + execute equivalence against direct
match_pattern/construct calls, full-feature queries, and the error
surface."""

import pytest

from pawpaw_spark.operators.graph_query import construct, match_pattern
from pawpaw_spark.operators.sparql import parse_sparql, sparql


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _t(df):
    return {tuple(r) for r in df.collect()}


KG = [
    ("f1", "DEFINES", "s1"),
    ("f2", "DEFINES", "s2"),
    ("f3", "DEFINES", "s3"),
    ("s1", "REFERENCES", "s2"),
    ("s2", "REFERENCES", "s3"),
    ("s3", "REFERENCES", "missing"),
    ("s3", "REFERENCES", "s1"),
    ("s1", "type", "Sym"),
]


class TestParse:
    def test_select_plan(self):
        plan = parse_sparql(
            "SELECT DISTINCT ?f ?s WHERE { ?f DEFINES ?s . "
            "OPTIONAL { ?s REFERENCES ?t } "
            "FILTER NOT EXISTS { ?x REFERENCES ?s } "
            "FILTER ( ?f != ?s ) }"
        )
        assert plan["form"] == "select"
        assert plan["vars"] == ["f", "s"] and plan["distinct"]
        assert plan["pattern"] == [("?f", "DEFINES", "?s")]
        assert plan["optional"] == [[("?s", "REFERENCES", "?t")]]
        assert plan["not_exists"] == [[("?x", "REFERENCES", "?s")]]
        assert plan["neq"] == [("?f", "?s")]

    def test_construct_plan_and_sugar(self):
        plan = parse_sparql(
            'CONSTRUCT { ?s a Thing . ?s LABEL "a b" } WHERE '
            "{ ?s <REFERENCES> ?t }"
        )
        assert plan["form"] == "construct"
        assert plan["template"] == [
            ("?s", "type", "Thing"),
            ("?s", "LABEL", "a b"),
        ]
        assert plan["pattern"] == [("?s", "REFERENCES", "?t")]

    def test_errors(self):
        for q, msg in [
            ("ASK WHERE { ?s P ?o }", "SELECT or CONSTRUCT"),
            ("SELECT ?x { ?s P ?o }", "expects .vars or"),
            ("SELECT x WHERE { ?s P ?o }", "expects .vars"),
            ("SELECT ?x WHERE { ?s P ?o", "unclosed"),
            ("SELECT ?x WHERE { }", "binds no triples"),
            ("SELECT ?x WHERE { ?s P ?o . } trailing", "trailing"),
            ("SELECT ?x WHERE { FILTER ( ?a = ?b ) ?s P ?o }", "!="),
            (
                "SELECT ?x WHERE { ?s P ?o . FILTER ( a != ?b ) }",
                "FILTER supports only",
            ),
            (
                "SELECT ?x WHERE { OPTIONAL { OPTIONAL { ?a P ?b } } }",
                "nested OPTIONAL",
            ),
        ]:
            with pytest.raises(ValueError, match=msg):
                parse_sparql(q)


class TestExec:
    def test_select_equivalence(self, spark):
        e = _triples(spark, KG)
        q = sparql(
            e,
            "SELECT ?f ?t WHERE { ?f DEFINES ?s . ?s REFERENCES ?t . "
            "FILTER NOT EXISTS { ?g DEFINES ?t } }",
        )
        direct = match_pattern(
            e,
            [("?f", "DEFINES", "?s"), ("?s", "REFERENCES", "?t")],
            not_exists=[[("?g", "DEFINES", "?t")]],
        ).select("f", "t")
        assert _t(q) == _t(direct) == {("f3", "missing")}

    def test_optional_and_star(self, spark):
        e = _triples(spark, KG)
        q = sparql(
            e,
            "SELECT * WHERE { ?s REFERENCES ?t . "
            "OPTIONAL { ?g DEFINES ?t } }",
        )
        assert set(q.columns) == {"s", "t", "g"}
        got = _t(q)
        assert ("s3", "missing", None) in got
        assert ("s1", "s2", "f2") in got

    def test_path_predicate(self, spark):
        e = _triples(spark, KG)
        q = sparql(e, "SELECT ?x WHERE { s1 REFERENCES+ ?x }")
        assert _t(q) == {("s2",), ("s3",), ("missing",), ("s1",)}

    def test_a_keyword_and_type_pred(self, spark):
        e = _triples(spark, KG)
        assert _t(sparql(e, "SELECT ?x WHERE { ?x a Sym }")) == {("s1",)}

    def test_construct_equivalence(self, spark):
        e = _triples(spark, KG)
        q = sparql(
            e,
            "CONSTRUCT { ?t CALLED_BY ?s } WHERE { ?s REFERENCES ?t }",
        )
        direct = construct(
            e, [("?s", "REFERENCES", "?t")], [("?t", "CALLED_BY", "?s")]
        )
        assert _t(q) == _t(direct)
        assert ("s2", "CALLED_BY", "s1") in _t(q)

    def test_bag_vs_distinct(self, spark):
        # two distinct defining files for the same (s, t) binding: the
        # ?s ?t projection has a duplicate under bag semantics
        e = _triples(
            spark,
            KG + [("f9", "DEFINES", "s1")],
        )
        q_txt = "SELECT ?s ?t WHERE { ?f DEFINES ?s . ?s REFERENCES ?t }"
        set_rows = sparql(e, q_txt).count()
        bag_rows = sparql(e, q_txt, bag=True).count()
        assert bag_rows == set_rows + 1
        # DISTINCT in the text wins over bag=True
        assert (
            sparql(e, q_txt.replace("SELECT", "SELECT DISTINCT"), bag=True)
            .count()
            == set_rows
        )

    def test_unbound_select_var_raises(self, spark):
        e = _triples(spark, KG)
        with pytest.raises(ValueError, match="not bound"):
            sparql(e, "SELECT ?zz WHERE { ?s REFERENCES ?t }")
