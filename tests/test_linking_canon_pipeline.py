"""Entity linking, canonicalization, and the resumable end-to-end pipeline."""

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pawpaw_spark.corpus import source_df
from pawpaw_spark.operators.canon import connected_components
from pawpaw_spark.operators.linking import jaro_winkler, link_symbols, symbol_mentions
from pawpaw_spark.operators.segment import segment
from pawpaw_spark.operators.triples import segment_by_lang
from pawpaw_spark.pipeline import build_kg


@pytest.fixture(scope="module")
def src(spark):
    return source_df(spark, n_files=80, seed=11).cache()


@pytest.fixture(scope="module")
def segs(spark, src):
    return segment_by_lang(src).cache()


class TestJaroWinkler:
    def test_known_values(self):
        # published JW examples (MARTHA/MARHTA = 0.9611, DWAYNE/DUANE = 0.84)
        assert abs(jaro_winkler("martha", "marhta") - 0.9611) < 0.001
        assert abs(jaro_winkler("dwayne", "duane") - 0.84) < 0.001
        assert jaro_winkler("same", "same") == 1.0
        assert jaro_winkler("abc", "xyz") == 0.0


class TestLinking:
    def test_near_duplicate_symbols_linked(self, spark, segs):
        pairs = link_symbols(segs, threshold=0.80)
        linked = {(r.a, r.b) for r in pairs.collect()}
        # the corpus plants parse_config / parseConfig / parse_cfg families
        names = {n for ab in linked for n in ab}
        fam = {n for n in names if n.lower().startswith("parse")}
        assert len(fam) >= 2, f"expected parse_* family linked, got {sorted(names)[:10]}"

    def test_mentions_distinct(self, spark, segs):
        m = symbol_mentions(segs)
        assert m.count() == m.select("name").distinct().count()


class TestConnectedComponents:
    def test_chain_and_clique(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"), ("r", "p")],
            "a string, b string",
        )
        comps = {r.node: r.comp for r in connected_components(edges).collect()}
        assert comps["a"] == comps["b"] == comps["c"] == "a"
        assert comps["x"] == comps["y"] == "x"
        assert comps["p"] == comps["q"] == comps["r"] == "p"
        assert comps["a"] != comps["x"] != comps["p"]

    def test_long_chain_converges(self, spark):
        n = 40
        edges = spark.createDataFrame(
            [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n)], "a string, b string"
        )
        comps = connected_components(edges, max_iters=60, checkpoint_every=5)
        assert comps.select("comp").distinct().count() == 1

    def test_chain_longer_than_iters_converges_via_pointer_jumping(self, spark):
        # a 100-node path has diameter 100; pointer jumping must close
        # it in O(log n) rounds — well inside max_iters=10
        n = 100
        edges = spark.createDataFrame(
            [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n - 1)], "a string, b string"
        )
        comps = connected_components(edges, max_iters=10, driver_threshold=0)
        rows = comps.collect()
        assert len(rows) == n
        assert {r.comp for r in rows} == {"n000"}

    def test_driver_and_distributed_paths_agree(self, spark):
        import random

        rng = random.Random(7)
        edges = spark.createDataFrame(
            [(f"n{rng.randint(0, 60):02d}", f"n{rng.randint(0, 60):02d}") for _ in range(80)],
            "a string, b string",
        )
        fast = {(r.node, r.comp) for r in connected_components(edges).collect()}
        dist = {
            (r.node, r.comp)
            for r in connected_components(edges, driver_threshold=0).collect()
        }
        assert fast == dist

    def test_distributed_path_stress_1m_edges(self, spark):
        """The DISTRIBUTED loop (driver cutover disabled) at ~1M edges:
        500 chains x 1000 nodes (diameter 999) plus a 500k-leaf star
        (the mega-repo skew shape). Exact labels — every node's comp is
        its component's min id — within max_iters = log2(diameter)+2
        rounds, proving the pointer-jumping bound at a size the driver
        cutover would normally shield (round-2 verdict item #7)."""
        import math

        n_chains, chain_len, n_leaves = 500, 1000, 500_000
        chain_nodes = n_chains * chain_len
        chains = spark.range(chain_nodes).filter(
            (F.col("id") % chain_len) != chain_len - 1
        ).select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
        hub = chain_nodes  # a single hot node: star skew
        star = spark.range(n_leaves).select(
            F.lit(hub).alias("a"), (F.col("id") + hub + 1).alias("b")
        )
        edges = chains.unionByName(star)
        assert edges.count() == n_chains * (chain_len - 1) + n_leaves

        budget = int(math.log2(chain_len - 1)) + 2
        labels = connected_components(
            edges, max_iters=budget, driver_threshold=0  # raises if over budget
        )
        bad_chain = labels.filter(
            (F.col("node") < chain_nodes)
            & (F.col("comp") != (F.col("node") - F.col("node") % chain_len))
        ).count()
        bad_star = labels.filter(
            (F.col("node") >= chain_nodes) & (F.col("comp") != hub)
        ).count()
        assert bad_chain == 0 and bad_star == 0
        assert labels.count() == chain_nodes + n_leaves + 1

    def test_nonconvergence_raises_not_silent(self, spark):
        import pytest

        n = 64
        edges = spark.createDataFrame(
            [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n - 1)], "a string, b string"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(edges, max_iters=1, driver_threshold=0)


class TestPipeline:
    def test_build_and_resume(self, spark, src, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("kg_out"))
        res = build_kg(spark, src, out, n_buckets=8)
        n_edges = res["edges"].count()
        n_nodes = res["nodes"].count()
        assert n_edges > 0 and n_nodes > 0

        # canonical ids: every symbol's canon is itself a symbol id
        syms = res["nodes"].filter(F.col("kind") == "symbol")
        assert syms.filter(~F.col("canon_id").startswith("sym:")).count() == 0

        # near-dup family should share a canon id
        canon_of = {
            r.node_id: r.canon_id
            for r in syms.filter(
                F.lower("node_id").rlike("sym:parse.?config")
            ).collect()
        }
        if len(canon_of) >= 2:
            assert len(set(canon_of.values())) == 1, canon_of

        # resume: second run must skip all buckets (lineage complete)
        from pawpaw_spark.lineage import LineageLog

        log1 = LineageLog(out).read(spark).count()
        res2 = build_kg(spark, src, out, n_buckets=8)
        log2 = LineageLog(out).read(spark).count()
        assert log2 == log1, "resume re-ran completed buckets"
        assert res2["edges"].count() == n_edges

    def test_resume_recomputes_changed_bucket(self, spark, src, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("kg_out2"))
        build_kg(spark, src, out, n_buckets=8)
        from pawpaw_spark.lineage import LineageLog

        before = LineageLog(out).read(spark).filter(F.col("stage") == "segments").count()
        # mutate one repo's content -> exactly its bucket(s) invalidated
        changed = src.withColumn(
            "content",
            F.when(F.col("repo") == "org0/repo0", F.concat("content", F.lit("\nx = 1\n")))
            .otherwise(F.col("content")),
        ).withColumn(
            "sha256",
            F.sha2(F.col("content").cast("binary"), 256),
        )
        build_kg(spark, changed, out, n_buckets=8)
        after = LineageLog(out).read(spark).filter(F.col("stage") == "segments").count()
        assert after > before
        assert after - before <= 2  # only the touched bucket(s), not all 8

        # the canon stage is input-global: changed content MUST invalidate
        # its checkpoint (two distinct fingerprints recorded), while an
        # unchanged third run adds nothing
        canon = LineageLog(out).read(spark).filter(F.col("stage") == "canon")
        assert canon.count() == 2
        assert canon.select("input_fingerprint").distinct().count() == 2
        build_kg(spark, changed, out, n_buckets=8)
        assert LineageLog(out).read(spark).filter(F.col("stage") == "canon").count() == 2


class TestAnalyticsStage:
    def test_node_metrics_written_and_resumed(self, spark, src, tmp_path_factory):
        import pytest as _pytest

        from pawpaw_spark.lineage import LineageLog

        out = str(tmp_path_factory.mktemp("kg_an"))
        res = build_kg(spark, src, out, n_buckets=8, analytics=True,
                       pagerank_iters=3)
        m = res["node_metrics"]
        rows = m.collect()
        assert rows, "no node metrics on a corpus with call edges"
        # metrics cover exactly the sym->sym call-graph nodes
        assert all(r.node.startswith("sym:") for r in rows)
        # PageRank mass is conserved over the whole graph
        assert sum(r["rank"] for r in rows) == _pytest.approx(1.0, abs=1e-9)
        # degrees consistent: total out == total in == #edges
        assert sum(r.out_deg for r in rows) == sum(r.in_deg for r in rows) > 0
        # every component label is a member node
        nodes = {r.node for r in rows}
        assert {r.comp for r in rows} <= nodes

        # metrics match the operators applied directly to the written edges
        from pawpaw_spark.operators.graph import kg_node_metrics

        direct = {
            r.node: (r.out_deg, r.in_deg, r["rank"], r.comp)
            for r in kg_node_metrics(res["edges_canonical"], iters=3).collect()
        }
        got = {r.node: (r.out_deg, r.in_deg, r["rank"], r.comp) for r in rows}
        assert set(got) == set(direct)
        for k in got:
            assert got[k][0] == direct[k][0] and got[k][1] == direct[k][1]
            assert got[k][3] == direct[k][3]
            assert got[k][2] == _pytest.approx(direct[k][2], rel=1e-12)

        # resume: same params -> the analytics stage is skipped wholesale
        log1 = LineageLog(out).read(spark).filter(
            F.col("stage") == "analytics"
        ).count()
        assert log1 == 1
        res2 = build_kg(spark, src, out, n_buckets=8, analytics=True,
                        pagerank_iters=3)
        log2 = LineageLog(out).read(spark).filter(
            F.col("stage") == "analytics"
        ).count()
        assert log2 == log1, "analytics stage re-ran on unchanged input"
        assert res2["node_metrics"].count() == len(rows)

        # changed parameters invalidate the checkpoint
        build_kg(spark, src, out, n_buckets=8, analytics=True,
                 pagerank_iters=4)
        log3 = LineageLog(out).read(spark).filter(
            F.col("stage") == "analytics"
        ).count()
        assert log3 == log1 + 1, "iters change did not recompute analytics"


class TestIncrementalComponents:
    def _cc(self, spark, edges):
        from pawpaw_spark.operators.canon import connected_components

        return connected_components(
            spark.createDataFrame(edges, "a string, b string")
        )

    def test_equals_full_recompute(self, spark):
        """CC(mapping(old) ∪ new) == CC(old ∪ new) — bridging edges
        merge historical components; brand-new nodes join in."""
        from pawpaw_spark.operators.canon import incremental_components

        old = [("a", "b"), ("c", "d"), ("e", "f"), ("g", "g2")]
        new = [("b", "c"), ("x", "y"), ("f", "x")]
        mapping = self._cc(spark, old)
        got = {
            r.node: r.comp
            for r in incremental_components(
                mapping, spark.createDataFrame(new, "a string, b string")
            ).collect()
        }
        want = {r.node: r.comp for r in self._cc(spark, old + new).collect()}
        assert got == want
        # the bridge really merged: a..d share one label
        assert len({got[n] for n in "abcd"}) == 1
        # untouched historical component kept its label
        assert got["g"] == "g"

    @given(
        old=st.lists(
            st.tuples(st.integers(0, 12), st.integers(0, 12)),
            min_size=1, max_size=20,
        ),
        new=st.lists(
            st.tuples(st.integers(0, 16), st.integers(0, 16)),
            min_size=1, max_size=10,
        ),
    )
    @settings(max_examples=10, deadline=None, derandomize=True)
    def test_property_equivalence(self, spark, old, new):
        from pawpaw_spark.operators.canon import incremental_components

        old = [(str(a), str(b)) for a, b in old]
        new = [(str(a), str(b)) for a, b in new]
        mapping = self._cc(spark, old)
        got = {
            r.node: r.comp
            for r in incremental_components(
                mapping, spark.createDataFrame(new, "a string, b string")
            ).collect()
        }
        want = {r.node: r.comp for r in self._cc(spark, old + new).collect()}
        assert got == want

    def test_distributed_loop_with_mapping_self_loops(self, spark):
        """driver_threshold=0 forces the distributed min-label loop —
        the path real above-threshold delta ingests take. Singleton
        mappings contribute (node, node) self-loop edges; deep new
        bridge chains must still converge."""
        from pawpaw_spark.operators.canon import incremental_components

        old = [("a", "b"), ("c", "d"), ("s", "s")]  # s: singleton self-map
        # chain bridging a-b ... c-d through 6 new nodes
        chain = [("b", "n1"), ("n1", "n2"), ("n2", "n3"), ("n3", "n4"),
                 ("n4", "n5"), ("n5", "c")]
        mapping = self._cc(spark, old)
        got = {
            r.node: r.comp
            for r in incremental_components(
                mapping,
                spark.createDataFrame(chain, "a string, b string"),
                driver_threshold=0,
            ).collect()
        }
        want = {r.node: r.comp for r in self._cc(spark, old + chain).collect()}
        assert got == want
        assert len({got[n] for n in ("a", "b", "c", "d", "n3")}) == 1
        assert got["s"] == "s"


class TestDay2Ingest:
    def test_new_repo_appends_one_bucket_and_matches_fresh_build(
        self, spark, src, tmp_path_factory
    ):
        """Corpus GROWTH (not same-input resume): day 2 adds a new
        repo. Only the new repo's bucket recomputes (old buckets skip
        via lineage), canon re-runs globally (fingerprint changed), and
        the resulting canonical tables are row-identical to a
        from-scratch build over the grown corpus."""
        from pawpaw_spark.lineage import LineageLog

        out = str(tmp_path_factory.mktemp("kg_day2"))
        res1 = build_kg(spark, src, out, n_buckets=8)
        res1["edges_canonical"].count()
        seg_rows_1 = (
            LineageLog(out).read(spark).filter(F.col("stage") == "segments").count()
        )

        delta = source_df(spark, n_files=20, seed=77).withColumn(
            "repo", F.lit("org9/new_repo")
        )
        full = src.unionByName(delta)
        res2 = build_kg(spark, full, out, n_buckets=8)
        got = sorted(
            (r.subj, r.pred, r.obj, r.doc_id)
            for r in res2["edges_canonical"]
            .select("subj", "pred", "obj", "doc_id")
            .collect()
        )

        # exactly ONE bucket re-ran in the segments stage (the new
        # repo's; every old bucket's fingerprint was unchanged)
        seg_rows_2 = (
            LineageLog(out).read(spark).filter(F.col("stage") == "segments").count()
        )
        assert seg_rows_2 == seg_rows_1 + 1, (seg_rows_1, seg_rows_2)

        fresh = str(tmp_path_factory.mktemp("kg_fresh"))
        res3 = build_kg(spark, full, fresh, n_buckets=8)
        want = sorted(
            (r.subj, r.pred, r.obj, r.doc_id)
            for r in res3["edges_canonical"]
            .select("subj", "pred", "obj", "doc_id")
            .collect()
        )
        assert got == want
        assert len(got) > 0

    def test_daily_ingest_trilogy_matches_full_batch(
        self, spark, tmp_path_factory
    ):
        """Index day-1 docs, find day-2 near-dup pairs via the delta
        pass, fold the NEW pairs into day-1's components mapping with
        incremental_components — the result must equal connected
        components over ALL pairs computed in one batch over the full
        corpus. This is the composition a production daily ingest runs
        (minhash_index_write -> minhash_dedup_delta ->
        incremental_components)."""
        from pawpaw_spark.operators.canon import (
            connected_components, incremental_components,
        )
        from pawpaw_spark.operators.dedup import (
            minhash_dedup_pairs, minhash_dedup_delta, minhash_index_write,
        )

        words = "alpha bravo charlie delta echo foxtrot golf hotel".split()
        mk = lambda i: " ".join(words[(i + j) % 8] for j in range(8)) + f" t{i}"
        day1 = [(f"h{i}", mk(i)) for i in range(8)] + [("h_dup0", mk(0))]
        day2 = [(f"n{i}", mk(i + 40)) for i in range(4)] + [
            ("n_dup_h1", mk(1)),      # links to history
            ("n_dup_n0", mk(40)),     # links within the delta
        ]
        schema = "doc_id string, text string"
        idx = str(tmp_path_factory.mktemp("trilogy") / "idx")
        d1 = spark.createDataFrame(day1, schema)
        d2 = spark.createDataFrame(day2, schema)

        minhash_index_write(d1, idx, n_hashes=64, bands=16)
        day1_pairs = minhash_dedup_pairs(
            d1, threshold=0.8, n_hashes=64, bands=16, verify="exact"
        )
        mapping1 = connected_components(day1_pairs, "a", "b")
        new_pairs = minhash_dedup_delta(d2, idx, threshold=0.8)
        got = {
            r.node: r.comp
            for r in incremental_components(
                mapping1, new_pairs.select("a", "b")
            ).collect()
        }

        full_pairs = minhash_dedup_pairs(
            spark.createDataFrame(day1 + day2, schema),
            threshold=0.8, n_hashes=64, bands=16, verify="exact",
        )
        want = {
            r.node: r.comp
            for r in connected_components(full_pairs, "a", "b").collect()
        }
        assert got == want
        # the cross-day link really merged: h1 and n_dup_h1 share a label
        assert got["h1"] == got["n_dup_h1"]
