"""Turtle serialization — operators/turtle.py: emitted-form checks,
roundtrip identity (incl. hostile literals), strict-mode errors."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pawpaw_spark.operators.turtle import from_turtle, to_turtle


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, is_lit boolean"
    )


def _roundtrip(spark, rows, **kw):
    ttl = to_turtle(_edges(spark, rows), literal_col="is_lit", **kw)
    back = from_turtle(ttl)
    return {tuple(r) for r in back.collect()}


class TestEmit:
    def test_prefix_header_and_grouping(self, spark):
        rows = [
            ("n1", "DEFINES", "s1", False),
            ("n1", "REFERENCES", "s2", False),
            ("n2", "DEFINES", "s3", False),
        ]
        lines = sorted(
            r.line for r in to_turtle(_edges(spark, rows), literal_col="is_lit").collect()
        )
        assert "@prefix pw: <pawpaw:> ." in lines
        assert "pw:n1 pw:DEFINES pw:s1 ; pw:REFERENCES pw:s2 ." in lines
        assert "pw:n2 pw:DEFINES pw:s3 ." in lines

    def test_type_renders_as_a(self, spark):
        rows = [("n1", "type", "File", False)]
        lines = {r.line for r in to_turtle(_edges(spark, rows), literal_col="is_lit").collect()}
        assert "pw:n1 a pw:File ." in lines

    def test_unsafe_local_falls_back_to_iri(self, spark):
        rows = [("sym:f_3", "DEFINES", "doc/7@0", False)]
        lines = {r.line for r in to_turtle(_edges(spark, rows), literal_col="is_lit").collect()}
        assert "<pawpaw:sym:f_3> pw:DEFINES <pawpaw:doc/7@0> ." in lines

    def test_literal_escaped(self, spark):
        rows = [("n1", "HAS_SRC", 'a "b"\\c\nd', True)]
        lines = {r.line for r in to_turtle(_edges(spark, rows), literal_col="is_lit").collect()}
        assert 'pw:n1 pw:HAS_SRC "a \\"b\\"\\\\c\\nd" .' in lines

    def test_unsafe_id_raises(self, spark):
        from py4j.protocol import Py4JJavaError

        rows = [("bad id", "p", "o", False)]
        with pytest.raises(Exception, match="IRI-safe"):
            try:
                to_turtle(_edges(spark, rows), literal_col="is_lit").collect()
            except Py4JJavaError as e:  # unwrap for the match
                raise RuntimeError(str(e)) from e


class TestRoundtrip:
    def test_mixed_forms(self, spark):
        rows = [
            ("n1", "DEFINES", "s1", False),
            ("n1", "type", "File", False),
            ("sym:f_3", "REFERENCES", "doc/7@0", False),
            ("n1", "HAS_SRC", 'line1\nline2 ; "quoted" . \\slash', True),
            ("n2", "HAS_SRC", "", True),
        ]
        assert _roundtrip(spark, rows) == {tuple(r) for r in rows}

    def test_literal_that_looks_like_terms(self, spark):
        # separators and term syntax INSIDE a literal must not split
        rows = [("n1", "p", 'x ; pw:q <pawpaw:z> . a "y"', True)]
        assert _roundtrip(spark, rows) == {tuple(r) for r in rows}

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["n1", "n2", "sym:x", "d/1@0"]),
                st.sampled_from(["p", "type", "has:part"]),
                st.text(
                    st.characters(
                        codec="ascii", exclude_characters="\x00"
                    ),
                    max_size=12,
                ),
            ),
            min_size=1,
            max_size=8,
            unique=True,
        )
    )
    def test_hypothesis_literal_roundtrip(self, spark, rows):
        rows = [(s, p, o, True) for s, p, o in rows]
        assert _roundtrip(spark, rows) == {tuple(r) for r in rows}


class TestParse:
    def test_malformed_strict_raises(self, spark):
        bad = spark.createDataFrame(
            [("@prefix pw: <pawpaw:> .",), ("pw:n1 pw:p .",)], "line string"
        )
        with pytest.raises(Exception, match="malformed"):
            from_turtle(bad).collect()

    def test_malformed_scavenge_drops(self, spark):
        doc = spark.createDataFrame(
            [
                ("@prefix pw: <pawpaw:> .",),
                ("pw:n1 pw:p .",),
                ("pw:n1 pw:p pw:o .",),
            ],
            "line string",
        )
        got = from_turtle(doc, strict=False).collect()
        assert [(r.subj, r.pred, r.obj) for r in got] == [("n1", "p", "o")]

    def test_undeclared_prefix_raises(self, spark):
        doc = spark.createDataFrame(
            [("@prefix pw: <pawpaw:> .",), ("zz:n1 pw:p pw:o .",)],
            "line string",
        )
        with pytest.raises(Exception, match="undeclared prefix"):
            from_turtle(doc).collect()

    def test_foreign_namespace_kept_when_not_declared_base(self, spark):
        doc = spark.createDataFrame(
            [
                ("@prefix ex: <http://example.org/> .",),
                ("ex:s ex:p <http://other.net/o> .",),
            ],
            "line string",
        )
        got = from_turtle(doc).collect()
        assert [(r.subj, r.pred, r.obj) for r in got] == [
            ("s", "p", "http://other.net/o")
        ]
