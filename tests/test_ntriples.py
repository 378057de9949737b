"""N-Triples serialization: format pinned against a pure-Python
serializer, parse pinned as the exact inverse (roundtrip identity on
hypothesis-generated nasty strings), guards raise."""

import pytest
from pyspark.sql import functions as F
from hypothesis import given, settings, strategies as st

from pawpaw_spark.operators.ntriples import from_ntriples, to_ntriples


def py_ntriple(subj, pred, obj, base="pawpaw:", obj_literal=False):
    def esc(s):
        return (
            s.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
        )

    o = f'"{esc(obj)}"' if obj_literal else f"<{base}{obj}>"
    return f"<{base}{subj}> <{base}{pred}> {o} ."


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )


NASTY = [
    'he said "hi\\there"\nnew\rline\\n end',
    "",
    "\\\\n double-escaped lookalike",
    "tab\tallowed raw",
    "unicode: ǅ µ 語",
    'trailing backslash \\',
    '\\"',
]


class TestSerialize:
    def test_matches_python_serializer_literal(self, spark):
        rows = [(f"doc/{i}", "HAS_TEXT", t) for i, t in enumerate(NASTY)]
        got = {
            r.line
            for r in to_ntriples(_df(spark, rows), obj_literal=True).collect()
        }
        want = {py_ntriple(*r, obj_literal=True) for r in rows}
        assert got == want

    def test_matches_python_serializer_iri(self, spark):
        rows = [("a", "CALLS", "b"), ("sym:f_1", "DEFINES", "doc/2#3-9")]
        got = {r.line for r in to_ntriples(_df(spark, rows)).collect()}
        assert got == {py_ntriple(*r) for r in rows}

    def test_unsafe_iri_raises(self, spark):
        with pytest.raises(Exception, match="IRI-safe"):
            to_ntriples(_df(spark, [("bad id", "P", "o")])).collect()
        with pytest.raises(Exception, match="IRI-safe"):
            to_ntriples(_df(spark, [("s", "P", 'o"quote')])).collect()


class TestParse:
    def test_roundtrip_fixed(self, spark):
        rows = [(f"doc/{i}", "HAS_TEXT", t) for i, t in enumerate(NASTY)]
        back = from_ntriples(
            to_ntriples(_df(spark, rows), obj_literal=True)
        )
        got = {(r.subj, r.pred, r.obj, r.obj_is_literal) for r in back.collect()}
        assert got == {(s, p, o, True) for s, p, o in rows}

    def test_roundtrip_iri_and_foreign_base(self, spark):
        line = '<http://x/a> <http://x/P> <http://x/b> .'
        r = from_ntriples(
            spark.createDataFrame([(line,)], "line string")
        ).first()
        # foreign base is preserved verbatim, not stripped
        assert (r.subj, r.pred, r.obj, r.obj_is_literal) == (
            "http://x/a", "http://x/P", "http://x/b", False
        )

    def test_strict_raises_lenient_filters(self, spark):
        bad = spark.createDataFrame([("not a triple",)], "line string")
        with pytest.raises(Exception, match="malformed"):
            from_ntriples(bad).collect()
        assert from_ntriples(bad, strict=False).count() == 0

    def test_empty_literal_vs_empty_iri(self, spark):
        lines = spark.createDataFrame(
            [('<pawpaw:s> <pawpaw:p> "" .',), ("<pawpaw:s> <pawpaw:p> <> .",)],
            "line string",
        )
        got = {(r.obj, r.obj_is_literal) for r in from_ntriples(lines).collect()}
        assert got == {("", True), ("", False)}

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.text(
                # printable-ish plus the escape-relevant chars; NUL
                # excluded (documented: cannot occur in N-Triples)
                alphabet=st.characters(
                    blacklist_categories=("Cs",), blacklist_characters="\x00"
                ),
                max_size=40,
            ),
            min_size=1,
            max_size=8,
        )
    )
    def test_property_roundtrip(self, spark, texts):
        rows = [(f"d/{i}", "T", t) for i, t in enumerate(texts)]
        back = from_ntriples(
            to_ntriples(_df(spark, rows), obj_literal=True)
        )
        got = sorted((r.subj, r.obj) for r in back.collect())
        assert got == sorted((s, o) for s, _, o in rows)


class TestKgPipelineRoundtrip:
    def test_real_edge_table_roundtrips(self, spark):
        """The actual KG edge vocabulary (CONTAINS / HAS_SEGMENT /
        DEFINES / REFERENCES node ids with @commit and #span suffixes)
        survives serialize -> parse identically — the interchange path
        jobs/build_kg.py --ntriples exports."""
        from pawpaw_spark.corpus import source_df
        from pawpaw_spark.operators.triples import build_edges_fused

        edges = (
            build_edges_fused(source_df(spark, n_files=8, seed=7))
            .select("subj", "pred", "obj")
        )
        want = {(r.subj, r.pred, r.obj) for r in edges.collect()}
        back = from_ntriples(to_ntriples(edges))
        got = {(r.subj, r.pred, r.obj) for r in back.collect()}
        assert got == want and len(got) > 100
        assert back.filter(F.col("obj_is_literal")).count() == 0


from pawpaw_spark.operators.ntriples import from_nquads, to_nquads


def py_nquad(subj, pred, obj, graph, base="pawpaw:", obj_literal=False):
    t = py_ntriple(subj, pred, obj, base=base, obj_literal=obj_literal)
    if graph is None:
        return t
    return t[:-2] + f" <{base}{graph}> ."


def _qdf(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, graph string"
    )


class TestNQuads:
    def test_matches_python_serializer(self, spark):
        rows = [("s1", "P", "o1", "g1"), ("s2", "P", "o2", None)]
        got = {
            r["line"] for r in to_nquads(_qdf(spark, rows)).collect()
        }
        assert got == {py_nquad(*r) for r in rows}

    def test_literal_objects_with_graph(self, spark):
        rows = [(f"s{i}", "HAS_TEXT", t, "g0") for i, t in enumerate(NASTY)]
        got = {
            r["line"]
            for r in to_nquads(_qdf(spark, rows), obj_literal=True).collect()
        }
        assert got == {
            py_nquad(s, p, o, g, obj_literal=True) for s, p, o, g in rows
        }

    def test_roundtrip_identity_mixed_graphs(self, spark):
        rows = [
            ("s1", "P", NASTY[0], "g1"),
            ("s2", "P", NASTY[5], None),
            ("s3", "Q", "", "g2"),
            ("s4", "Q", 'x <g9>', None),  # literal that LOOKS like a quad
        ]
        back = from_nquads(
            to_nquads(_qdf(spark, rows), obj_literal=True)
        )
        got = {
            (r.subj, r.pred, r.obj, r.graph) for r in back.collect()
        }
        assert got == set(rows)
        assert back.filter(~F.col("obj_is_literal")).count() == 0

    def test_parses_ntriples_as_null_graph(self, spark):
        tri = _df(spark, [("a", "P", "b"), ("c", "P", "d")])
        back = from_nquads(to_ntriples(tri))
        got = {(r.subj, r.pred, r.obj, r.graph) for r in back.collect()}
        assert got == {("a", "P", "b", None), ("c", "P", "d", None)}

    def test_iri_object_quad_and_triple_disambiguation(self, spark):
        lines = spark.createDataFrame(
            [
                ("<pawpaw:s> <pawpaw:p> <pawpaw:o> <pawpaw:g> .",),
                ("<pawpaw:s> <pawpaw:p> <pawpaw:o> .",),
            ],
            "line string",
        )
        got = {
            (r.subj, r.obj, r.graph, r.obj_is_literal)
            for r in from_nquads(lines).collect()
        }
        assert got == {("s", "o", "g", False), ("s", "o", None, False)}

    def test_strict_raises_lenient_filters(self, spark):
        bad = spark.createDataFrame(
            [("<pawpaw:s> <pawpaw:p> <pawpaw:o> <g> extra .",)],
            "line string",
        )
        with pytest.raises(Exception):
            from_nquads(bad).collect()
        assert from_nquads(bad, strict=False).count() == 0

    @settings(max_examples=25, deadline=None)
    @given(
        texts=st.lists(
            st.text(
                st.characters(
                    blacklist_categories=("Cs",), min_codepoint=1
                ),
                max_size=40,
            ),
            min_size=1,
            max_size=6,
        )
    )
    def test_property_roundtrip(self, spark, texts):
        rows = [
            (f"s{i}", "P", t, f"g{i % 2}" if i % 3 else None)
            for i, t in enumerate(texts)
        ]
        back = from_nquads(to_nquads(_qdf(spark, rows), obj_literal=True))
        got = {(r.subj, r.obj, r.graph) for r in back.collect()}
        assert got == {(s, o, g) for s, p, o, g in rows}
