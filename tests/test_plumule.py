"""plumule conformance: DataFrame-compiled queries vs the reference
engine run on identical trees (the reference's own 854-line axis matrix
test file is the model — tests/query/test_query_and_traversal.py)."""

import pytest
from pyspark.sql import functions as F

from pawpaw_spark.corpus import CANONICAL
from pawpaw_spark.operators.segment import segment
from pawpaw_spark.oracle import pawpaw_tree
from pawpaw_spark.plans.plumule import PlumuleEngine, parse_query
from pawpaw_spark.rulesets import CANONICAL_RULES, PHRASE_PAT
from pawpaw_spark.rules import RuleSet, extract, split

DOCS = {
    "canon": CANONICAL,
    "multi": "one 1 two 22\n\nthree 333 four 4\n\nfive 55 six 6",
    "single": "word 7",
    "empty_matches": "no digits words only",
}

RULES = RuleSet.of(
    split(r"\n\n", desc="para"),
    extract(PHRASE_PAT, on="para"),
    name="plumule-test",
)

QUERIES = [
    "*",
    "-*",
    "**",
    "-**",
    "***",
    "-***",
    "*/..",
    "**/....",
    "**/...",
    "**/-...",
    "**/.",
    "**/../><",
    "**[d:word]",
    "**[d:word,number]",
    "**[~d:char]",
    "**[d:char]&[i:0]",
    "**[d:char]&[i:1-3]",
    "**[d:char]&[i:2-]",
    "**[d:word]/*",
    "**[d:phrase]/*[d:number]",
    "**[s:nine]",
    "**[lcs:twelve]",
    "**[scfsw:t]",
    "**[sew:n]",
    "**[ssw:t]&[sew:n]",
    "**[d:word]&[i:0]",
    "**[d:word]|[d:number]",
    "**[d:word]^[ssw:t]",
    "**[~d:char]&([ssw:t]|[sew:n])",
    "**[d:word]{*[d:char]}",
    "**[d:phrase]{*[d:number]&[s:9]}",
    "**[d:word]~{*[s:w]}",
    "**[d:phrase]{*[d:word]}&{*[d:number]}",
    "**[d:word]/<",
    "**[d:word]/>",
    "**[d:number]/<<",
    "**[d:number]/->>",
    # <<< / >>> tested from single-node streams only: the reference's
    # implementation has a loop-variable leak that applies these axes to
    # just the LAST stream node (untested upstream; its own test suite
    # only queries them from a single node). We implement the documented
    # per-node semantics instead — see plumule.py docstring.
    "**[d:number]&[i:0]/<<<",
    "**[d:number]&[i:0]/-<<<",
    "**[d:number]&[i:0]/>>>",
    "**[d:number]&[i:0]/->>>",
    "**[d:word]&[i:0]/>>>[d:digit]",
    "*[i:0]/<<<",
    "*[i:0]/>>>",
    "**!",
    "..!",
    "**[d:digit]/..!!",
    "**[d:digit]/-..!!",
    "*[i:0]/**",
    # deeper matrix: reversed axes x or_self, nesting, chains
    "-**!",
    "-*!!",
    "**[d:char]/-..",
    "**[d:word]/-<<!",
    "**[d:word]/>>!!",
    "**[d:number]/->>!",
    "**[d:phrase]{*[d:word]{*[d:char]&[i:0]}}",
    "**[d:phrase]~{*[d:number]&[s:9]}",
    "**[d:word]{>[d:number]}",
    "**[d:number]{<[d:word]}",
    "**[d:phrase]/*/..",
    "**/../../..",
    "*[d:para]/**[d:digit]",
    "**[d:char]&[i:0-2,5-]",
    "**[~d:word&~d:number]",
    "**[lcs:nine]|[lcs:ten]",
    "**[d:word]/.",
    "**/></><",
    "-***!",
]


@pytest.fixture(scope="module")
def engine(spark):
    rows = [
        {"repo": "r", "path": k, "commit": "c", "lang": "text", "content": v, "sha256": None}
        for k, v in DOCS.items()
    ]
    from pawpaw_spark.schemas import SOURCE_SCHEMA

    src = spark.createDataFrame(rows, schema=SOURCE_SCHEMA)
    segs = segment(src, RULES, include_root=True).cache()
    source = src.select(
        F.concat_ws("@", F.concat_ws("/", "repo", "path"), "commit").alias("doc_id"), "content"
    )
    return PlumuleEngine(segs, source=source)


@pytest.fixture(scope="module")
def ref_trees(pawpaw_ref):
    return {k: pawpaw_tree(pawpaw_ref, v, RULES) for k, v in DOCS.items()}


def _doc_id(name):
    return f"r/{name}@c"


@pytest.mark.parametrize("query", QUERIES)
def test_query_matrix(engine, ref_trees, query):
    got_rows = engine.find_all(query).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r.doc_id, r.ord)):
        got.setdefault(r.doc_id, []).append((r.start, r.stop, r.desc))
    for name, root in ref_trees.items():
        try:
            expected = [(i.start, i.stop, i.desc) for i in root.find_all(query)]
        except UnboundLocalError:
            # reference crashes on <<< / >>> when the incoming stream is
            # empty (loop-var leak, _query.py:260); our engine returns []
            expected = []
        assert got.get(_doc_id(name), []) == expected, f"doc={name} q={query!r}"


def test_values_filter(engine, ref_trees, pawpaw_ref):
    values = {"x": "nine", "y": "13"}
    eng = PlumuleEngine(engine.segments, engine.source, values=values)
    q = "**[v:x,y]"
    got_rows = eng.find_all(q).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r.doc_id, r.ord)):
        got.setdefault(r.doc_id, []).append((r.start, r.stop, r.desc))
    for name, root in ref_trees.items():
        expected = [(i.start, i.stop, i.desc) for i in root.find_all(q, values=values)]
        assert got.get(_doc_id(name), []) == expected, name


def test_predicates_filter(engine, ref_trees):
    preds_spark = {"long": lambda df: (F.col("g_stop") - F.col("g_start")) > 4}
    preds_ref = {"long": lambda ec: (ec.ito.stop - ec.ito.start) > 4}
    eng = PlumuleEngine(engine.segments, engine.source, predicates=preds_spark)
    q = "**[p:long]"
    got_rows = eng.find_all(q).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r.doc_id, r.ord)):
        got.setdefault(r.doc_id, []).append((r.start, r.stop, r.desc))
    for name, root in ref_trees.items():
        expected = [(i.start, i.stop, i.desc) for i in root.find_all(q, predicates=preds_ref)]
        assert got.get(_doc_id(name), []) == expected, name


def test_find_returns_first_per_doc(engine, ref_trees):
    q = "**[d:word]"
    got = {r.doc_id: (r.start, r.stop) for r in engine.find(q).collect()}
    for name, root in ref_trees.items():
        exp = root.find(q)
        if exp is None:
            assert _doc_id(name) not in got
        else:
            assert got[_doc_id(name)] == (exp.start, exp.stop), name


def test_parse_errors():
    for bad in ["", "*[unknownkey:x]", "*[d:a", "*{**", "*[d:a]]",
                "**[d:phrase]{{*[d:word]}}"]:  # reference rejects too: axis-less inner phrase
        with pytest.raises(ValueError):
            q = parse_query(bad)


def test_constitution_demo_query(spark, pawpaw_ref):
    """The reference's us_constitution demo query — sections containing
    'power' or 'right' (docs/demos/us_constitution/us_constitution.py:74)
    — run over the real demo corpus with CONSTITUTION_RULES through both
    engines; span-for-span equality."""
    from pawpaw_spark.corpus import load_constitution
    from pawpaw_spark.rulesets import CONSTITUTION_RULES
    from pawpaw_spark.schemas import SOURCE_SCHEMA
    from pawpaw_spark.oracle import pawpaw_tree

    text = load_constitution()
    if text is None:
        pytest.skip("demo corpus not available")
    query = "**[d:section]{**[d:word] & [lcs:power,right]}"

    root = pawpaw_tree(pawpaw_ref, text, CONSTITUTION_RULES)
    expected = [(i.start, i.stop) for i in root.find_all(query)]
    assert expected, "demo query should match sections"

    src = spark.createDataFrame(
        [{"repo": "r", "path": "c", "commit": "0", "lang": "text",
          "content": text, "sha256": None}],
        schema=SOURCE_SCHEMA,
    )
    segs = segment(src, CONSTITUTION_RULES, include_root=True)
    source = src.select(
        F.concat_ws("@", F.concat_ws("/", "repo", "path"), "commit").alias("doc_id"),
        "content",
    )
    eng = PlumuleEngine(segs, source=source)
    got = [
        (r.start, r.stop)
        for r in sorted(eng.find_all(query).collect(), key=lambda r: r.ord)
    ]
    assert got == expected
