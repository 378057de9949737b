"""Local mirror of the driver's correctness gate: every queries() entry
runs on Spark and (when an oracle exists) on DuckDB over the same
parquet; compare row count, column names, and order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c] if isinstance(row, dict) else row[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_and_matches_oracle(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    spark_rows = df.collect()
    cols = df.columns
    assert len(spark_rows) >= 0  # smoke: runs, stable schema

    if name not in ORACLES:
        return

    res = ddb.execute(ORACLES[name])
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    assert sorted(cols) == sorted(o_cols), f"{name}: column mismatch {cols} vs {o_cols}"

    got = _normalize([r.asDict() for r in spark_rows], cols)
    exp = _normalize(o_rows, o_cols)
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    mismatches = [(g, e) for g, e in zip(got, exp) if g != e]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    preds = {r.pred for r in rows}
    assert "CONTAINS" in preds and "HAS_SEGMENT" in preds


class TestCallEdgesMemo:
    def test_memo_survives_session_cache_release(self, spark):
        """bench/check_contract release session caches after every
        query; the shared edge table is a localCheckpoint OUTSIDE the
        registry, so it stays materialized across releases — otherwise
        every later graph query re-runs the kernel per consumer."""
        import __spark_entry__ as E
        from pawpaw_spark.operators.dedup import release_session_caches

        sf = "/root/testdata/sf0.001"
        # the UNDERLYING build must come from the Arrow kernel — the
        # checkpointed wrapper truncates its own plan, so provenance is
        # pinned on the raw builder the memo wraps
        raw_plan = E._raw_call_edges(spark, sf)._jdf.queryExecution().optimizedPlan().toString()
        assert "MapInArrow" in raw_plan, raw_plan
        E._CALL_EDGES_CACHE.clear()
        e1 = E._call_edges(spark, sf)
        e1.count()  # materializes the lazy checkpoint
        release_session_caches(spark)
        e2 = E._call_edges(spark, sf)
        assert e2 is e1  # memo hit
        # after materialization the plan is truncated to the
        # checkpointed RDD (kernel gone from the plan), and the
        # registry release did not strip the checkpoint blocks
        plan = e2._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in plan, plan
        assert "MapInArrow" not in plan, plan
        jsc = spark.sparkContext._jsc.sc()
        assert jsc.getPersistentRDDs().size() >= 1
