"""Physical-plan discipline: the properties that matter at 100 TB,
asserted on the optimized plans (SURVEY.md §4 / bench design):

* filters and column pruning reach the parquet scan
* small-dimension joins broadcast (no shuffle of the big side)
* aggregations are partial (map-side combine) before the shuffle
* no cartesian products anywhere in the contract queries
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


class TestPushdown:
    def test_filter_pushed_to_scan(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        q = li.filter(F.col("l_shipdate") <= "1998-09-02").select("l_quantity")
        plan = _plan(q)
        assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan, plan

    def test_column_pruning(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        q = li.select("l_orderkey", "l_quantity")
        plan = _plan(q)
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
        assert read_schema and "l_comment" not in read_schema[0], plan

    def test_tpch_q1_scan_prunes_columns(self, spark):
        plan = _plan(E.q_tpch_q1(spark, SF))
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
        assert read_schema
        # 16-column table; the query needs 6
        assert "l_comment" not in read_schema[0] and "l_shipmode" not in read_schema[0]


class TestJoins:
    def test_topk_orders_broadcasts_customer(self, spark):
        plan = _plan(E.q_topk_orders(spark, SF))
        assert "BroadcastHashJoin" in plan, plan

    def test_no_cartesian_in_contract_queries(self, spark):
        skip = set()  # all queries must be cartesian-free
        for name, fn in E.queries().items():
            if name in skip:
                continue
            plan = _plan(fn(spark, SF))
            assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


class TestAggregation:
    def test_partial_aggregation_before_shuffle(self, spark):
        plan = _plan(E.q_dedup_distinct_texts(spark, SF))
        # partial_ aggregate functions indicate map-side combine
        assert "partial_count" in plan or "partial count" in plan.lower(), plan

    def test_whole_stage_codegen_on_scalar_path(self, spark):
        q = E.q_str_ops(spark, SF)
        q.collect()  # AQE finalizes the plan only on execution
        plan = _plan(q)
        # '*(n)' prefixes mark whole-stage-codegen'd operators in AQE plans
        assert "*(" in plan, plan


class TestExpensiveQueryPlanShape:
    """Regression guards on the top-5 bench queries' physical plans
    (round-2 verdict item #9): the properties that keep them fast at
    100 TB fail LOUDLY if a change reintroduces a shuffle, a driver
    probe, or row-at-a-time Python. Exchange-count ceilings are pinned
    to the current plans on the pinned pyspark version."""

    def _p(self, spark, name):
        return _plan(E.queries()[name](spark, SF))

    def test_ngram_jaccard_shape(self, spark):
        plan = self._p(spark, "ngram_jaccard")
        # persisted gram table actually reused by its four consumers
        assert plan.count("InMemoryTableScan") >= 4, plan
        # doc-frequency skew filter rides a broadcast, not a shuffle
        assert "BroadcastHashJoin" in plan, plan
        assert "BatchEvalPython" not in plan, "row-at-a-time Python crept in"

    def test_str_suite_is_pure_jvm_scan(self, spark):
        plan = self._p(spark, "str_suite")
        # span arithmetic is column expressions over one scan: no
        # shuffle, no Python workers at all
        assert "Exchange hashpartitioning" not in plan, plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan

    def test_codec_roundtrip_partition_local(self, spark):
        plan = self._p(spark, "codec_roundtrip")
        # encode+decode are Arrow kernels; only the final agg shuffles
        assert plan.count("MapInPandas") >= 2, plan
        assert plan.count("Exchange hashpartitioning") <= 1, plan
        assert "BatchEvalPython" not in plan, plan

    def test_minhash_dedup_shape(self, spark):
        plan = self._p(spark, "minhash_dedup")
        # signature kernel output cached, band fan-out + verify reuse it
        assert plan.count("InMemoryTableScan") >= 2, plan
        assert "BatchEvalPython" not in plan, plan
        assert plan.count("Exchange hashpartitioning") <= 3, plan

    def test_media_dimensions_is_narrow_pipeline(self, spark):
        plan = self._p(spark, "media_dimensions")
        # construct -> parse is two chained Arrow kernels over one scan:
        # no shuffle at any width
        assert "Exchange hashpartitioning" not in plan, plan
        assert plan.count("MapInPandas") >= 2, plan

    def test_simhash_neardup_shape(self, spark):
        plan = self._p(spark, "simhash_neardup")
        assert "BatchEvalPython" not in plan, plan
        # chunk-blocked equi-join only; a quadratic rewrite would
        # surface as a cartesian or a join-free cross explosion
        assert "CartesianProduct" not in plan, plan
        assert plan.count("Exchange hashpartitioning") <= 7, plan

    def test_stratified_sample_is_shuffle_free_pushed_filter(self, spark):
        plan = self._p(spark, "stratified_sample")
        # membership is a pure row predicate: no shuffle, no Python,
        # filter evaluated at/next to the scan (the harness's RoundRobin
        # test-fan-out is not part of the operator)
        import re as _re

        plan = _re.sub(r"Exchange RoundRobinPartitioning[^\n]*", "", plan)
        assert "Exchange" not in plan, plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan
        assert "Filter" in plan, plan

    def test_vocab_topk_partial_agg_and_take_ordered(self, spark):
        plan = self._p(spark, "vocab_topk")
        # hot tokens combine map-side; the k-cutoff is TakeOrdered,
        # never a global Sort of the vocabulary
        assert "partial" in plan.lower(), plan
        assert "TakeOrderedAndProject" in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_paragraph_dedup_avoids_window_sort(self, spark):
        plan = self._p(spark, "paragraph_dedup")
        # first-arrival via agg+join: a Window over paragraph content
        # would put every copy of a hot boilerplate para in one task
        assert "Window" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_bm25_search_stats_broadcast_no_python(self, spark):
        plan = self._p(spark, "bm25_search")
        # tf counts are array filters in codegen; corpus stats are a
        # 1-row aggregate joined back by broadcast — never a shuffle of
        # the corpus keyed on anything
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan

    def test_bm25_indexed_prunes_to_query_buckets(self, spark):
        plan = self._p(spark, "bm25_indexed")
        # the postings scan must be partition-pruned on tok_bucket and
        # never touch the corpus text
        assert "PartitionFilters" in plan and "tok_bucket" in plan, plan
        assert "documents.parquet" not in plan, plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan

    def test_c4_filters_single_shuffle(self, spark):
        plan = self._p(spark, "c4_filters")
        # doc construction groups orders by customer (one shuffle);
        # every line/sentence rule is a column expression after it
        assert plan.count("Exchange hashpartitioning") <= 1, plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan

    def test_kg_degrees_fused_kernel_one_agg(self, spark):
        plan = self._p(spark, "kg_degrees")
        # one Arrow kernel pass + partial-agg shuffle on (subj, pred)
        assert "MapInArrow" in plan, plan
        assert plan.count("Exchange hashpartitioning") <= 1, plan
        assert "partial_count" in plan, plan

    def test_kg_pagerank_broadcast_dangling_kernel_edges(self, spark):
        # materialize=False: the contract query checkpoints the result,
        # which would hide the internals behind a checkpoint scan
        from pawpaw_spark.operators.graph import pagerank

        # use the RAW (un-checkpointed) edge builder so the plan shows
        # the TRUE edge provenance (both the memo and a fresh lazy
        # checkpoint truncate to LogicalRDD; TestCallEdgesMemo covers
        # the memo path)
        plan = _plan(
            pagerank(E._raw_call_edges(spark, SF), iters=2, materialize=False)
        )
        # edges come from the one-pass Arrow kernel; the dangling-mass
        # term rides a 1-row broadcast (BNLJ), NEVER a cartesian; rank
        # updates are equi-joins + partial aggs
        assert "MapInArrow" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "partial" in plan.lower(), plan

    def test_kg_triangles_equi_joins_only(self, spark):
        from pawpaw_spark.operators.graph import triangle_count

        plan = _plan(
            triangle_count(E._raw_call_edges(spark, SF), materialize=False)
        )
        # wedge closure is equi-joins on node ids — a naive rewrite
        # would surface as a cartesian or a theta-join explosion
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "MapInArrow" in plan, plan

    def test_pii_scrub_is_pure_jvm_scan(self, spark):
        plan = self._p(spark, "pii_scrub")
        # construction + 4 regex families + redaction chain are column
        # expressions over ONE scan: no shuffle, no Python workers
        import re as _re

        stripped = _re.sub(r"Exchange RoundRobinPartitioning[^\n]*", "", plan)
        assert "Exchange" not in stripped, plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan

    def test_weighted_mix_broadcast_no_window(self, spark):
        plan = self._p(spark, "weighted_mix")
        # per-source counts ride a broadcast; the key is pure column
        # math — NO window (a per-source row_number would funnel a
        # billion-doc source into one partition at 100 TB)
        assert "Window" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan

    def test_minhash_delta_blocked_joins_only(self, spark):
        plan = self._p(spark, "minhash_delta")
        # delta candidates come from (band, bucket) equi-joins against
        # the at-rest index — no cartesian, no full-corpus re-shingle
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_pack_bins_single_partitioned_sort(self, spark):
        plan = self._p(spark, "pack_bins")
        # one hash-shuffle on the stream key for the window; the
        # per-bin agg rides the same partitioning (no second shuffle
        # of the full data), and there is no global sort
        assert plan.count("Exchange hashpartitioning") <= 2, plan
        assert "Exchange rangepartitioning" not in plan, plan
        assert "BatchEvalPython" not in plan, plan


class TestFusedKgPlan:
    def test_fused_build_has_no_exchange(self, spark):
        """The one-pass KG build must be a single map stage: scan ->
        arrow kernel -> output, with no shuffle anywhere (SURVEY §4;
        this is what makes the N->4N scaling near-linear)."""
        from pawpaw_spark.corpus import source_df
        from pawpaw_spark.operators.triples import build_edges_fused

        src = source_df(spark, 24, 42)
        plan = _plan(build_edges_fused(src))
        import re as _stdre

        # exempt whole RoundRobin exchange nodes (benign repartition),
        # then assert no hash/range shuffle exchange remains
        stripped = _stdre.sub(r"Exchange RoundRobinPartitioning[^\n]*", "", plan)
        assert "Exchange" not in stripped, plan
        assert "MapInArrow" in plan or "ArrowEvalPython" in plan or "PythonMapInArrow" in plan, plan


class TestFixpointLoopConf:
    """fixpoint_loop_conf: shuffle width tracks the state size, AQE is
    off inside, and BOTH confs restore on exit — including on error."""

    def test_width_and_restore(self, spark):
        from pawpaw_spark.session import fixpoint_loop_conf

        old_sp = spark.conf.get("spark.sql.shuffle.partitions")
        old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        with fixpoint_loop_conf(spark, approx_state_rows=10) as width:
            assert width == 4  # floor
            assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert spark.conf.get("spark.sql.shuffle.partitions") == old_sp
        assert spark.conf.get("spark.sql.adaptive.enabled") == old_aqe

    def test_width_caps_at_session_default(self, spark):
        from pawpaw_spark.session import fixpoint_loop_conf

        default = int(spark.conf.get("spark.sql.shuffle.partitions"))
        with fixpoint_loop_conf(spark, approx_state_rows=10**12) as width:
            assert width == default  # a huge graph gets the full width

    def test_restore_on_error(self, spark):
        import pytest

        from pawpaw_spark.session import fixpoint_loop_conf

        old_sp = spark.conf.get("spark.sql.shuffle.partitions")
        with pytest.raises(RuntimeError, match="boom"):
            with fixpoint_loop_conf(spark, approx_state_rows=10):
                raise RuntimeError("boom")
        assert spark.conf.get("spark.sql.shuffle.partitions") == old_sp
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


class TestNewKgPlans:
    """Plan discipline for the round-4 additions: HITS, walks,
    walk pairs, HLL registers, snapshot."""

    def test_kg_hits_broadcast_totals_no_cartesian(self, spark):
        from pawpaw_spark.operators.graph import hits

        plan = _plan(
            hits(E._raw_call_edges(spark, SF), iters=2, materialize=False)
        )
        # L1 totals ride 1-row broadcasts (BNLJ), never a cartesian;
        # half-steps are equi-joins + partial aggs; no Python workers
        assert "MapInArrow" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "partial" in plan.lower(), plan

    def test_random_walks_equi_joins_only(self, spark):
        from pawpaw_spark.operators.graph import random_walks

        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
        )
        starts = spark.createDataFrame([("a",)], "node string")
        walks = random_walks(e, starts, length=3)
        # localCheckpoint hides the loop; assert on the lazy pair plan
        from pawpaw_spark.operators.graph import walk_pairs

        plan = _plan(walk_pairs(walks, window=2))
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        # self-join on walk_id is an equi-join
        assert "walk_id" in plan, plan

    def test_hll_registers_single_shuffle_partial_agg(self, spark):
        plan = self._plan_of_query(spark, "hll_registers")
        assert plan.count("Exchange hashpartitioning") <= 1, plan
        assert "partial_max" in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "Join" not in plan, plan

    def test_kg_snapshot_no_window_one_struct_max(self, spark):
        plan = self._plan_of_query(spark, "kg_snapshot")
        assert "Window" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "partial_max" in plan, plan
        assert "MapInArrow" in plan, plan

    @staticmethod
    def _plan_of_query(spark, name):
        return _plan(E.queries()[name](spark, SF))


class TestDeclarativeQueryPlans:
    """Plan discipline for the property-path / negation / Datalog
    layers: negation is LEFT-ANTI equi-joins (never a filter over a
    collected set, never a cartesian), non-iterative paths stay one
    lazy join tree, and nothing drops to Python."""

    def test_not_exists_is_left_anti_equi_join(self, spark):
        plan = _plan(E.queries()["kg_dangling"](spark, SF))
        assert "LeftAnti" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_path_sequence_lazy_join_tree(self, spark):
        from pawpaw_spark.operators.graph_query import path_pairs

        # no +/* operators -> fully lazy compilation, no loop runs
        pairs = path_pairs(
            E._fused_call_triples(spark, SF),
            "DEFINES/(REFERENCES|^REFERENCES)",
        )
        plan = _plan(pairs)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        # sequence is an equi-join; alternation a union
        assert "Join" in plan and "Union" in plan, plan

    def test_datalog_neg_output_is_antijoined_aggregate(self, spark):
        plan = _plan(E.queries()["kg_datalog_neg"](spark, SF))
        # the fixpoint already ran (checkpointed deltas); the final
        # aggregation must still be partial and cartesian/Python-free
        assert "partial" in plan.lower(), plan
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_hyperball_round_partial_max(self, spark):
        plan = _plan(E.queries()["kg_hyperball"](spark, SF))
        assert "partial" in plan.lower(), plan
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan


class TestRound4ContPlanShape:
    """Plan guards for the continuation operators: SPARQL modifiers,
    tokenizer kernels, leakage split, Louvain/truss/node2vec — the
    same fail-loudly properties as TestExpensiveQueryPlanShape."""

    def _p(self, spark, name):
        return _plan(E.queries()[name](spark, SF))

    def test_sparql_agg_is_topk_not_full_sort(self, spark):
        plan = self._p(spark, "kg_sparql_agg")
        # ORDER BY + LIMIT compiles to a top-k, never a global sort
        assert "TakeOrderedAndProject" in plan, plan
        assert "partial_count" in plan, plan

    def test_sparql_union_values_broadcasts_literals(self, spark):
        plan = self._p(spark, "kg_sparql_union")
        # the VALUES literal table rides a broadcast semi join
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan

    def test_tokenizer_kernels_partial_agg_no_python(self, spark):
        for name in ("wordpiece_scores", "unigram_seed"):
            plan = self._p(spark, name)
            assert "partial_sum" in plan or "partial_count" in plan, (name, plan)
            assert "BatchEvalPython" not in plan, name
            assert "MapInPandas" not in plan, name
        # the seed top-k cut is TakeOrdered, not a full sort
        assert "TakeOrderedAndProject" in self._p(spark, "unigram_seed")

    def test_leakage_split_no_python_no_corpus_shuffle_blowup(self, spark):
        plan = self._p(spark, "leakage_split")
        assert "BatchEvalPython" not in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_louvain_round_equi_joins_only(self, spark):
        plan = self._p(spark, "kg_louvain_round")
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
        assert "partial_sum" in plan or "partial_count" in plan, plan

    def test_truss_support_equi_joins_only(self, spark):
        plan = self._p(spark, "kg_truss_support")
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_node2vec_materialized_artifact_no_python(self, spark):
        # biased_walks returns an eagerly checkpointed artifact (the
        # walk corpus is consumed many times downstream), so the final
        # plan is the materialized scan; the per-step window shape is
        # pinned by the bit-level SQL replay (kg_node2vec oracle) and
        # TestBiasedWalks
        plan = self._p(spark, "kg_node2vec")
        assert "Scan ExistingRDD" in plan, plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


class TestRound4ExtensionPlanShape:
    """Plan guards for the session's additions: SPARQL expression
    layer + DESCRIBE, sameAs fusion, Gopher filters, bigram LM."""

    def _p(self, spark, name):
        return _plan(E.queries()[name](spark, SF))

    def test_sparql_filter_bind_pure_columns_topk(self, spark):
        plan = self._p(spark, "kg_sparql_filter")
        # BIND/FILTER compile to column expressions, the page to top-k
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
        assert "CartesianProduct" not in plan, plan

    def test_sparql_subquery_equi_join(self, spark):
        plan = self._p(spark, "kg_sparql_subquery")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "partial_count" in plan or "partial_min" in plan, plan

    def test_describe_semi_joins_never_or_condition(self, spark):
        plan = self._p(spark, "kg_sparql_describe")
        # the variable resource set applies as equi-SEMI joins; an
        # OR-condition join would surface as a nested-loop product
        assert "LeftSemi" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan

    def test_sameas_fuse_broadcastable_rewrite_no_python(self, spark):
        plan = self._p(spark, "kg_sameas_fuse")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan

    def test_gopher_filters_single_projection_no_shuffle(self, spark):
        plan = self._p(spark, "gopher_filters")
        # one shuffle-free JVM projection over the scan (higher-order
        # array lambdas stay out of whole-stage codegen but are still
        # JVM expressions — the property that matters is no Python
        # and no Exchange)
        assert "Exchange" not in plan, plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
        assert plan.lstrip().startswith("Project") or "Project" in plan, plan

    def test_lm_perplexity_partial_aggs_broadcast_unigrams(self, spark):
        plan = self._p(spark, "lm_perplexity")
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
        assert "partial_count" in plan, plan
        # the vocabulary-sized unigram side broadcasts
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_graph_stats_semi_join_no_product(self, spark):
        plan = self._p(spark, "kg_graph_stats")
        # mutual-edge detection is an equi-SEMI join; the only nested-
        # loop joins are the one-row scalar assembly (broadcast, like
        # bm25_search's stats row) — a true CartesianProduct of data-
        # sized inputs must never appear
        assert "LeftSemi" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_triad_census_equi_joins_no_python(self, spark):
        plan = self._p(spark, "kg_triad_census")
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
        assert "partial_sum" in plan or "partial_count" in plan, plan

    def test_temporal_reach_materialized_no_python(self, spark):
        # the fixpoint returns a checkpointed artifact; the loop's
        # per-round shape is pinned by TestTemporalReachability
        plan = self._p(spark, "kg_temporal_reach")
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan

    def test_path_tree_materialized_no_python(self, spark):
        plan = self._p(spark, "kg_path_tree")
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan

    def test_conductance_equi_joins_partial_aggs(self, spark):
        plan = self._p(spark, "kg_conductance")
        assert "CartesianProduct" not in plan, plan
        assert "partial_count" in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_wl_colors_materialized_no_python(self, spark):
        plan = self._p(spark, "kg_wl_colors")
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


class TestRound4SessionPlanShapes:
    """Plan guards for the cont.26-35 operators: broadcast model/probe
    joins stay broadcast, nothing reintroduces row-at-a-time Python,
    and the quantile/bloom paths never global-sort."""

    def _p(self, spark, name):
        return _plan(E.queries()[name](spark, SF))

    def test_nb_confusion_broadcast_model_no_python(self, spark):
        plan = self._p(spark, "nb_confusion")
        # the |labels| x buckets model and prior tables ride broadcasts
        assert "BroadcastHashJoin" in plan, plan
        assert "BatchEvalPython" not in plan, plan
        # the only sort-merge joins are (doc,label)-keyed — data-sized
        # by construction; the corpus-x-model joins must all broadcast,
        # so no SMJ may carry a bucket column
        for line in plan.splitlines():
            if "SortMergeJoin" in line:
                assert "bucket" not in line, plan

    def test_bloom_semijoin_broadcast_probe(self, spark):
        plan = self._p(spark, "bloom_semijoin")
        # k probe joins are map-side broadcasts; the probe stream is
        # never sort-merge joined or globally sorted
        assert plan.count("BroadcastHashJoin") >= 2, plan
        assert "SortMergeJoin" not in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_exact_quantiles_no_global_sort(self, spark):
        cents = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .select(
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("cents")
            )
        )
        from pawpaw_spark.operators.sketch import exact_quantiles

        # runs eagerly; assert on the histogram-round plan instead:
        # one partial agg, no Sort/TakeOrdered anywhere in the round
        hist = (
            cents.groupBy(F.shiftright(F.col("cents"), 12).alias("k"))
            .agg(F.count(F.lit(1)))
        )
        plan = _plan(hist)
        assert "partial_count" in plan or "partial" in plan.lower(), plan
        assert "Sort " not in plan and "TakeOrdered" not in plan, plan
        # and the operator's result matches the one-liner oracle here
        out = {r.p: r.value for r in exact_quantiles(cents, "cents", [0.5]).collect()}
        import math

        vals = sorted(r.cents for r in cents.collect())
        assert out[0.5] == vals[math.ceil(0.5 * len(vals)) - 1]

    def test_turtle_roundtrip_single_group_shuffle(self, spark):
        plan = self._p(spark, "kg_turtle_roundtrip")
        # serialization shuffles once (groupBy subject); parsing is a
        # projection + explode — no Python workers anywhere
        assert "BatchEvalPython" not in plan, plan

    def test_katz_no_cartesian_no_python(self, spark):
        plan = self._p(spark, "kg_katz")
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_motifs_single_window_pass(self, spark):
        plan = self._p(spark, "event_motifs")
        # one user-partitioned window (its sort is per-partition, keyed
        # by user) + one count agg; no joins at all
        assert "Join" not in plan, plan
        assert plan.count("Window") == 1, plan

    def test_z_order_pure_codegen(self, spark):
        plan = self._p(spark, "z_order_digest")
        assert "BatchEvalPython" not in plan and "Join" not in plan, plan
        # scan prunes to exactly the two key columns (AQE hides the
        # codegen spans pre-execution, so pin pruning instead)
        rs = [l for l in plan.splitlines() if "ReadSchema" in l]
        assert rs and "o_custkey" in rs[0] and "o_orderkey" not in rs[0], plan


class TestRound4SessionPlans:
    """Plan-shape guards for the round-4 session operators."""

    def test_tpch_q6_pushdown_and_pruning(self, spark):
        plan = _plan(E.q_tpch_q6(spark, SF))
        assert "PushedFilters" in plan and "l_shipdate" in plan
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
        assert read_schema and "l_returnflag" not in read_schema[0]

    def test_tpch_q3_broadcasts_customer(self, spark):
        plan = _plan(E.q_tpch_q3(spark, SF))
        assert "BroadcastHashJoin" in plan, plan

    def test_salted_join_replicates_dimension(self, spark):
        plan = _plan(E.q_salted_join(spark, SF))
        assert "explode" in plan.lower(), plan
        assert "CartesianProduct" not in plan

    def test_snb_no_single_partition_window(self, spark):
        # the global rank must come from the two-phase lift, never a
        # single-partition window over the whole table
        plan = _plan(E.q_snb_pairs(spark, SF))
        assert "Exchange SinglePartition" not in plan, plan

    def test_shuffle_free_projections(self, spark):
        # one-pass scan operators: no DATA shuffle — the only Exchange
        # allowed is _fan's RoundRobin split of a single-row-group
        # parquet file (a no-op at scale, documented at _fan)
        for name in ("fix_mojibake", "readability", "url_normalize",
                     "hrw_shards"):
            plan = _plan(E.queries()[name](spark, SF))
            bad = [
                l for l in plan.splitlines()
                if "Exchange" in l and "RoundRobinPartitioning" not in l
            ]
            assert not bad, f"{name} shuffles: {bad}"

    def test_ed_pairs_no_nested_loop(self, spark):
        plan = _plan(E.q_ed_pairs(spark, SF))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
