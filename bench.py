#!/usr/bin/env python
"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Also measures the primary north-rule metric — KG triple throughput —
on a deterministic synthetic source corpus of the input_hint shape
(BASELINE.json), sized with the SF.

Env:
  SPARK_GRAFT_SF_DIR   default /root/testdata/sf0.1
  SPARK_GRAFT_CPUS     default 32
  BENCH_KG_FILES       override synthetic corpus size
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "extract_token_counts",
    "split_parts",
    "gaps_stats",
    "sessionize",
    "window_rolling",
    "tpch_q1",
    "topk_orders",
    "dedup_distinct_texts",
    "str_ops",
    "str_suite",
    "codec_roundtrip",
    "lang_id",
    "token_counts",
    "quality",
    "fingerprint_groups",
    "ann_topk",
    "embedding_neardup",
    "minhash_dedup",
    "dedup_groups",
    "simhash_neardup",
    "ngram_jaccard",
    "plumule_word_count",
    "kg_triples_by_pred",
    "media_frames",
    "media_dimensions",
    "media_av",
    "ontology_counts",
    "ontology_doc_hits",
    "windowed_merge",
    "stacked_runs",
    "nlp_tree_stats",
    "nlp_grammar_stats",
    "table_detect",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "paragraph_dedup",
    "stratified_sample",
    "vocab_topk",
    "corpus_profile",
    "pack_bins",
    "decontaminate",
    "repetition_stats",
    "minhash_delta",
    "bm25_search",
    "bm25_indexed",
    "c4_filters",
    "kg_degrees",
    "kg_pagerank",
    "kg_triangles",
    "kg_components",
    "kg_reachability",
    "pii_scrub",
    "weighted_mix",
    "winnow_pairs",
    "dup_spans",
    "dup_cut_text",
    "winnow_delta",
    "ann_pq_topk",
    "events_asof",
    "events_range",
    "kg_communities",
    "kg_linkpred",
    "kg_ppr",
    "kg_kcore",
    "kg_scc",
    "kg_ntriples",
    "kg_build_order",
    "tfidf_keywords",
    "doc_chunks",
    "epoch_shuffle",
    "kg_motif",
    "kg_pagerank_weighted",
    "kg_shortest_paths",
    "kg_clustering",
    "kg_cooccur",
    "kg_diff",
    "kg_hits",
    "kg_walks",
    "kg_walk_pairs",
    "kg_negatives",
    "kg_optional",
    "kg_schema",
    "kg_snapshot",
    "hll_registers",
    "cms_orders",
    "kg_datalog",
    "kg_path_closure",
    "kg_path_deps",
    "kg_hyperball",
    "kg_dangling",
    "kg_datalog_neg",
    "kg_datalog_delta",
    "kg_harmonic",
    "kg_construct",
    "kg_sparql",
    "kg_betweenness",
    "kg_rdfs",
    "kg_shacl",
    "kg_modularity",
    "bpe_pairs",
    "adopt_spans",
    "nuco",
    "kg_sparql_agg",
    "kg_sparql_union",
    "kg_sparql_filter",
    "kg_sparql_strfns",
    "kg_sparql_subquery",
    "kg_sparql_describe",
    "wordpiece_scores",
    "unigram_seed",
    "leakage_split",
    "kg_louvain_round",
    "kg_truss_support",
    "kg_node2vec",
    "kg_closeness",
    "kg_graph_stats",
    "kg_triad_census",
    "kg_temporal_reach",
    "kg_path_tree",
    "kg_conductance",
    "kg_sameas_canon",
    "kg_sameas_fuse",
    "lm_perplexity",
    "gopher_filters",
    "kg_wl_colors",
]


def force(df) -> int:
    """Execute the full plan without driver-side collection, then
    release any operator caches registered this session (gram/signature
    tables) so the persisted set stays flat across all headline
    queries — the session registry catches handles even when a
    projection dropped the per-DataFrame attribute."""
    df.write.format("noop").mode("overwrite").save()
    from pawpaw_spark.operators.dedup import release_session_caches

    release_session_caches(df.sparkSession)
    # drop dead python-side DataFrame refs NOW so the ContextCleaner can
    # reclaim finished localCheckpoint RDD blocks between queries —
    # otherwise block-manager storage grows across the 77-query sweep
    # and the tail queries pay the GC pressure of the whole session
    import gc

    gc.collect()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pawpaw_spark.session import get_spark

    spark = get_spark(app_name="pawpaw_spark_bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, cpus))

    import __spark_entry__ as E

    qs = E.queries()
    timings: dict[str, float] = {}
    t_all = time.time()

    # Warmup: JIT/codegen, parquet footers, python-worker spin-up —
    # otherwise the first queries absorb all fixed session costs and the
    # per-query attribution is meaningless. Counted in total as "warmup".
    t0 = time.time()
    spark.range(100000).selectExpr("sum(id)").collect()
    for t in ("documents", "lineitem", "events", "embeddings", "orders", "customer"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    import pandas as pd

    spark.range(64).mapInPandas(
        lambda it: (pd.DataFrame({"x": b["id"]}) for b in it), schema="x long"
    ).count()
    # warm the REAL python-worker stacks: reused workers import
    # pawpaw_spark.kernel / regex / numpy on first closure use — without
    # this, whichever query first touches each stack absorbs ~2 s of
    # per-worker import cost and the attribution is misleading
    from pawpaw_spark.operators.consolidate import windowed_join
    from pawpaw_spark.operators.dedup import minhash_signatures
    from pawpaw_spark.operators.segment import segment
    from pawpaw_spark.rules import RuleSet, extract

    warm = spark.createDataFrame(
        [(str(i), "nine 9 ten 10. Alpha beta gamma.") for i in range(64)],
        "doc_id string, content string",
    ).repartition(cpus)
    warm_segs = segment(warm, RuleSet.of(extract(r"(?P<word>[A-Za-z]+)"), name="w"))
    windowed_join(warm_segs, 3, lambda w: False, partition_local=True).count()
    minhash_signatures(warm, text_col="content", n_hashes=16).count()
    # the IVF index is a build-once artifact (persisted inverted lists);
    # building AND materializing it here keeps ann_ivf_topk timing the
    # PROBE, the steady-state cost — same argument as the parquet-footer
    # warmup. with_ivf_cluster().persist() is lazy, so without the
    # count() the first probe would still pay the assignment scan.
    _, clustered = E._ivf_index(spark, sf_dir)
    clustered.count()
    # PQ codebooks + byte-code table: the same build-once artifact
    # (ann_pq_topk times the ADC probe, not the k-means fit)
    E._pq_index(spark, sf_dir)
    # same build-once argument for the two at-rest parquet indexes:
    # history MinHash index (minhash_delta times the DELTA pass) and
    # the BM25 inverted index (bm25_indexed times the pruned probe)
    from pyspark.sql import functions as F

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    mh_key = (id(spark), "/tmp/pawpaw_mh_index_" + sf_tag)
    if mh_key not in E._MH_DELTA_INDEX:
        from pawpaw_spark.operators.dedup import minhash_index_write

        hist = E._docs(spark, sf_dir).withColumn(
            "doc_id", F.col("doc_id").cast("string")
        ).filter(F.col("doc_id").cast("long") % 2 == 0)
        minhash_index_write(hist, mh_key[1], n_hashes=64, bands=16)
        E._MH_DELTA_INDEX.add(mh_key)
    wn_key = (id(spark), "/tmp/pawpaw_winnow_index_" + sf_tag)
    if wn_key not in E._WINNOW_DELTA_INDEX:
        from pawpaw_spark.operators.substring import winnow_index_write

        wb = E._winnow_corpus(spark, sf_dir).filter(F.col("doc_id") < 1000000)
        winnow_index_write(wb, wn_key[1], k=24, w=8)
        E._WINNOW_DELTA_INDEX.add(wn_key)
    inv_key = (id(spark), "/tmp/pawpaw_inv_index_" + sf_tag)
    if inv_key not in E._INV_INDEX_BUILT:
        from pawpaw_spark.operators.search import build_inverted_index

        build_inverted_index(E._docs(spark, sf_dir), inv_key[1])
        E._INV_INDEX_BUILT.add(inv_key)
    # same build-once argument for the call-edge table the five graph
    # analytics queries share (production reads the materialized KG
    # edge store): materialize the session checkpoint here so
    # kg_pagerank times PageRank, not the segmentation kernel (which
    # kg_build / kg_triples_by_pred already time directly)
    E._call_edges(spark, sf_dir).count()
    timings["warmup"] = round(time.time() - t0, 3)
    print(f"[bench] warmup {timings['warmup']}s", file=sys.stderr, flush=True)

    # HEADLINE pins a stable warm-up-aware order for the long-lived
    # queries; anything newer in queries() is appended automatically so
    # the bench can never silently under-cover the contract again
    bench_list = HEADLINE + [k for k in qs if k not in set(HEADLINE)]
    for name in bench_list:
        t0 = time.time()
        force(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
        print(f"[bench] {name} {timings[name]}s", file=sys.stderr, flush=True)

    # --- KG triple throughput on the input_hint-shaped corpus -------------
    try:
        sf_f = float(sf)
    except ValueError:
        sf_f = 0.1
    n_files = int(os.environ.get("BENCH_KG_FILES", str(max(200, int(40000 * sf_f)))))
    from pawpaw_spark.corpus import source_df
    from pawpaw_spark.operators.triples import build_edges_fused

    src = source_df(spark, n_files=n_files, seed=42).cache()
    src.count()  # materialize outside the timed window
    t0 = time.time()
    edges = build_edges_fused(src)
    n_triples = edges.count()
    kg_secs = time.time() - t0
    timings["kg_build"] = round(kg_secs, 3)

    total = round(time.time() - t_all, 3)
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_f,
                "kg_files": n_files,
                "kg_triples": int(n_triples),
                "triples_per_sec": round(n_triples / kg_secs, 1),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
