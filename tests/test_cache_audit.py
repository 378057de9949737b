"""Session-storage invariant: N repeated operator calls leave the
persisted-RDD registry bounded (round-2 suggestion, round-4 verdict
item #9) — the cached_scope / release_session_caches discipline
actually releases what operators persist, across the dedup, linking,
and substring cache-attaching paths."""

from pyspark.sql import functions as F

from pawpaw_spark.operators.dedup import (
    cached_scope,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    release_session_caches,
)
from pawpaw_spark.operators.linking import sorted_neighborhood_pairs


def _n_persisted(spark) -> int:
    # NOTE: the JVM ContextCleaner unpersists unreferenced RDDs
    # asynchronously (earlier tests' localCheckpoints), so the
    # baseline can only SHRINK underneath us — the boundedness
    # invariant is therefore "no growth", asserted as <= baseline.
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _docs(spark):
    rows = [
        (f"d{i}", f"some shared text body number {i % 4} with words")
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


class TestCacheAudit:
    def test_scoped_calls_leave_no_residue(self, spark):
        docs = _docs(spark)
        release_session_caches(spark)
        base = _n_persisted(spark)
        for _ in range(4):
            with cached_scope(
                minhash_dedup_pairs(docs, threshold=0.5, n_hashes=16,
                                    bands=8)
            ) as pairs:
                pairs.count()
        assert _n_persisted(spark) <= base
        reg = getattr(spark, "_pawpaw_cache_registry", [])
        assert reg == []

    def test_registry_bounded_by_live_caches_and_releasable(self, spark):
        docs = _docs(spark)
        release_session_caches(spark)
        base = _n_persisted(spark)
        outs = []
        for _ in range(3):
            out = ngram_jaccard_pairs(docs, threshold=0.2, k=3)
            out.count()
            outs.append(out)
        reg = getattr(spark, "_pawpaw_cache_registry", [])
        per_call = len(reg) / 3
        assert per_call >= 1  # the operator does persist internally
        # releasing drops BOTH the registry and the JVM storage back
        n = release_session_caches(spark)
        assert n == len(reg) or reg == []
        assert getattr(spark, "_pawpaw_cache_registry", []) == []
        assert _n_persisted(spark) <= base

    def test_sorted_neighborhood_participates(self, spark):
        release_session_caches(spark)
        base = _n_persisted(spark)
        df = spark.createDataFrame(
            [(f"i{i}", f"k{i % 5}") for i in range(30)], ["id", "key"]
        )
        for _ in range(3):
            with cached_scope(
                sorted_neighborhood_pairs(df, "key", id_col="id", window=2)
            ) as pairs:
                pairs.count()
        assert _n_persisted(spark) <= base
        assert getattr(spark, "_pawpaw_cache_registry", []) == []

    def test_double_release_is_noop(self, spark):
        docs = _docs(spark)
        release_session_caches(spark)
        with cached_scope(
            minhash_dedup_pairs(docs, threshold=0.5, n_hashes=16, bands=8)
        ) as pairs:
            pairs.count()
        assert release_session_caches(spark) == 0
