"""Differential tests: windowed_join / stacked_reduce vs the reference
postorators, and ontology discover vs the reference Ontology.discover —
same inputs, same rule programs, compared span-for-span."""

import pytest
from pyspark.sql import functions as F

from pawpaw_spark.operators.consolidate import stacked_reduce, windowed_join
from pawpaw_spark.operators.ontology import Ontology, discover, discovery_counts, vocab_node
from pawpaw_spark.operators.segment import segment
from pawpaw_spark.rules import RuleSet, extract

DOCS = {
    "mixed": "one 1 2 two 3 4 5 three 6",
    "digits": "7 8 9 10 11",
    "words": "alpha beta gamma",
    "single": "42",
    "empty": " ",
}

TOK_RULES = RuleSet.of(extract(r"(?P<tok>\S+)"), name="tok")


def _src(spark):
    rows = [
        {"repo": "r", "path": k, "commit": "c", "lang": "text", "content": v, "sha256": None}
        for k, v in DOCS.items()
    ]
    from pawpaw_spark.schemas import SOURCE_SCHEMA

    return spark.createDataFrame(rows, schema=SOURCE_SCHEMA)


def _doc_id(name):
    return f"r/{name}@c"


def _ref_token_stream(pawpaw_ref, text):
    import regex

    itor = pawpaw_ref.arborform.Extract(regex.compile(r"(?P<tok>\S+)"))
    return itor(pawpaw_ref.Ito(text))


def _collect(df):
    out = {}
    for r in sorted(df.collect(), key=lambda r: (r.doc_id, r.ord)):
        out.setdefault(r.doc_id, []).append((r.start, r.stop, r.desc, r.n_merged))
    return out


class TestWindowedJoin:
    @pytest.mark.parametrize("window_size", [2, 3])
    def test_vs_reference(self, spark, pawpaw_ref, window_size):
        def pred_rows(window):  # all-digit window merges
            return all(str(w["value"]).isdigit() for w in window)

        segs = segment(_src(spark), TOK_RULES.of(
            extract(r"(?P<tok>\S+)", value_for=("tok",)), name="tokv"
        ))
        got = _collect(windowed_join(segs, window_size, pred_rows, desc="joined"))

        ref = pawpaw_ref
        wj = ref.arborform.WindowedJoin(
            window_size, lambda w: all(str(i).isdigit() for i in w), desc="joined"
        )
        for name, text in DOCS.items():
            stream = list(_ref_token_stream(ref, text))
            expected = []
            for ito in wj._transform(iter(stream)):
                n = window_size if ito.desc == "joined" else 1
                expected.append((ito.start, ito.stop, ito.desc, n))
            assert got.get(_doc_id(name), []) == expected, name


class TestStackedReduce:
    def test_vs_reference(self, spark, pawpaw_ref):
        def push(stack, r):
            return str(r["value"]).isdigit()

        def pop(stack, r):
            return not str(r["value"]).isdigit()

        def reduce_rows(stack):
            return {"start": stack[0]["start"], "stop": stack[-1]["stop"], "desc": "run"}

        segs = segment(_src(spark), RuleSet.of(
            extract(r"(?P<tok>\S+)", value_for=("tok",)), name="tokv"
        ))
        got = _collect(stacked_reduce(segs, reduce_rows, push, pop))

        ref = pawpaw_ref
        sr = ref.arborform.StackedReduce(
            reduce_func=lambda stack: ref.Ito.join(*stack, desc="run"),
            push_predicate=lambda stack, ito: str(ito).isdigit(),
            pop_predicate=lambda stack, ito: not str(ito).isdigit(),
        )
        for name, text in DOCS.items():
            stream = list(_ref_token_stream(ref, text))
            expected = [
                (i.start, i.stop, i.desc) for i in sr._transform(iter(stream))
            ]
            got_spans = [(a, b, d) for a, b, d, _n in got.get(_doc_id(name), [])]
            assert got_spans == expected, name

    def test_no_pop_predicate_reduces_tail(self, spark):
        segs = segment(_src(spark), RuleSet.of(
            extract(r"(?P<tok>\S+)", value_for=("tok",)), name="tokv"
        ))
        out = stacked_reduce(
            segs,
            lambda stack: {"start": stack[0]["start"], "stop": stack[-1]["stop"], "desc": "all"},
            lambda stack, r: True,
            None,
        )
        got = _collect(out)
        # every doc with tokens folds into exactly one group
        for name, text in DOCS.items():
            if text.split():
                assert len(got[_doc_id(name)]) == 1, name


ONTO_DOCS = {
    "legal": "The power and the right of the state. congress has power.",
    "nums": "pi is 3 and e is 2 and the law of 7",
    "none": "nothing relevant here",
}


def _make_ontology():
    return Ontology(
        {
            "legal": Ontology(
                {
                    "power": vocab_node(r"\bpower\b"),
                    "rights": vocab_node(r"\bright(s)?\b"),
                },
                rules=[extract(r"(?P<hit>\blaw\b|\bstate\b|\bcongress\b)", desc="hit")],
            ),
            "math": vocab_node(r"\d+", desc="hit"),
        }
    )


def _ref_ontology(pawpaw_ref):
    import regex

    from pawpaw.ontology import Ontology as O

    def ex(pat):
        return pawpaw_ref.arborform.Extract(regex.compile(pat), desc=lambda m, gk: "hit")

    return O(
        {
            "legal": O(
                {
                    "power": O(rules=[ex(r"(?P<hit>\bpower\b)")]),
                    "rights": O(rules=[ex(r"(?P<hit>\bright(s)?\b)")]),
                },
                rules=[ex(r"(?P<hit>\blaw\b|\bstate\b|\bcongress\b)")],
            ),
            "math": O(rules=[ex(r"(?P<hit>\d+)")]),
        }
    )


class TestOntology:
    def test_discover_vs_reference(self, spark, pawpaw_ref):
        rows = [
            {"repo": "r", "path": k, "commit": "c", "lang": "text", "content": v, "sha256": None}
            for k, v in ONTO_DOCS.items()
        ]
        from pawpaw_spark.schemas import SOURCE_SCHEMA

        src = spark.createDataFrame(rows, schema=SOURCE_SCHEMA)
        got = {}
        for r in discover(src, _make_ontology()).collect():
            got.setdefault((r.doc_id, tuple(r.path)), set()).add((r.start, r.stop))

        ref_onto = _ref_ontology(pawpaw_ref)
        for name, text in ONTO_DOCS.items():
            discoveries = ref_onto.discover(pawpaw_ref.Ito(text))
            for path, itos in discoveries.flatten().items():
                expected = {(i.start, i.stop) for i in itos}
                assert got.get((_doc_id(name), path), set()) == expected, (name, path)

    def test_counts_shape(self, spark):
        rows = [
            {"repo": "r", "path": k, "commit": "c", "lang": "text", "content": v, "sha256": None}
            for k, v in ONTO_DOCS.items()
        ]
        from pawpaw_spark.schemas import SOURCE_SCHEMA

        src = spark.createDataFrame(rows, schema=SOURCE_SCHEMA)
        counts = {r.path: r.n_hits for r in discovery_counts(src, _make_ontology()).collect()}
        assert counts["legal/power"] == 2
        assert counts["math"] == 3


def test_partition_local_equals_grouped(spark):
    """partition_local=True (shuffle-free) must produce exactly the
    grouped-mode rows when docs are partition-contiguous (segment()
    output)."""
    from pawpaw_spark.rules import RuleSet, extract
    from pawpaw_spark.operators.segment import segment

    segs = segment(_src(spark), RuleSet.of(
        extract(r"(?P<num>(?<!\S)\d+(?!\S))|(?P<tok>\S+)"), name="t"
    ))

    def doc_rows(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.doc_id, []).append((r.ord, r.start, r.stop, r.desc, r.n_merged))
        return {k: sorted(v) for k, v in out.items()}

    wj = lambda pl: windowed_join(
        segs, 2, lambda w: all(x["desc"] == "num" for x in w), desc="j", partition_local=pl
    )
    assert doc_rows(wj(True)) == doc_rows(wj(False))

    sr = lambda pl: stacked_reduce(
        segs,
        lambda st: {"start": st[0]["start"], "stop": st[-1]["stop"], "desc": "run"},
        lambda st, r: r["desc"] == "num",
        lambda st, r: r["desc"] != "num",
        partition_local=pl,
    )
    assert doc_rows(sr(True)) == doc_rows(sr(False))
