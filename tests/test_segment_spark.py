"""Spark-side segmentation: mapInPandas plumbing + invariants."""

import pytest
from pyspark.sql import functions as F

from pawpaw_spark.corpus import source_df
from pawpaw_spark.operators.segment import check_sha256_invariant, segment, with_sha256
from pawpaw_spark.rules import RuleSet, extract, split

RULES = RuleSet.of(
    split(r"\n\n", desc="para"),
    extract(r"(?P<word>[A-Za-z]+)|(?P<number>\d+)", on="para"),
)


@pytest.fixture(scope="module")
def src(spark):
    return source_df(spark, n_files=60, seed=42).cache()


def test_segment_emits_rows(spark, src):
    segs = segment(src, RULES)
    assert segs.count() > 0
    assert {"doc_id", "seg_id", "parent_id", "start", "stop", "desc", "depth",
            "rule_tag", "value", "path", "n_children", "sibling_idx", "dfs_idx"} == set(segs.columns)


def test_span_invariants(spark, src):
    """child span within parent span; spans within doc; start<=stop."""
    segs = segment(src, RULES, include_root=True).alias("c")
    bad_order = segs.filter(F.col("start") > F.col("stop")).count()
    assert bad_order == 0
    parents = segs.select(
        F.col("doc_id").alias("p_doc"),
        F.col("seg_id").alias("p_id"),
        F.col("start").alias("p_start"),
        F.col("stop").alias("p_stop"),
    ).alias("p")
    joined = segs.join(
        parents,
        (F.col("c.doc_id") == F.col("p.p_doc")) & (F.col("c.parent_id") == F.col("p.p_id")),
        "inner",
    )
    violations = joined.filter(
        (F.col("c.start") < F.col("p_start")) | (F.col("c.stop") > F.col("p_stop"))
    ).count()
    assert violations == 0


def test_sha256_invariant_passthrough(spark, src):
    # corpus already carries sha256 computed in Python; recomputation in
    # JVM must agree on every row (per-row invariant, BASELINE.json)
    assert check_sha256_invariant(src) == 0
    recomputed = with_sha256(src.drop("sha256"))
    assert check_sha256_invariant(recomputed) == 0


def test_matches_kernel_locally(spark, src):
    """Spark result == driver-side kernel run on the same docs."""
    from pawpaw_spark.kernel import segment_records

    rows = src.select("repo", "path", "commit", "content").collect()
    expected = set()
    for r in rows:
        did = f"{r.repo}/{r.path}@{r.commit}"
        for rec in segment_records(did, r.content, RULES):
            expected.add((rec["doc_id"], rec["start"], rec["stop"], rec["desc"]))
    got = {
        (r.doc_id, r.start, r.stop, r.desc)
        for r in segment(src, RULES).collect()
    }
    assert got == expected
