#!/usr/bin/env python
"""spark-submit entry: build the knowledge graph from a source table.

  spark-submit --py-files pawpaw_spark.zip jobs/build_kg.py \
      --input  /data/source_parquet_or_dir \
      --output /data/kg_out \
      --buckets 4096 --link-threshold 0.82

On a real cluster the input is the Iceberg/parquet source table of
(repo, path, commit, lang, content); executor/shuffle sizing comes from
spark-submit conf (this script only sets job-semantic conf). For the
sandbox, --synthetic N generates the deterministic corpus instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default=None, help="source parquet path")
    p.add_argument("--output", required=True)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--link-threshold", type=float, default=0.82)
    p.add_argument("--synthetic", type=int, default=0, help="generate N synthetic files")
    p.add_argument(
        "--edges-mode", default="fused", choices=("fused", "relational"),
        help="edge derivation: fused one-pass kernel (default) or from the "
        "materialized segments table (single content scan)",
    )
    p.add_argument(
        "--analytics", action="store_true",
        help="also materialize node_metrics (degrees, PageRank, components) "
        "over the canonical symbol graph",
    )
    p.add_argument("--pagerank-iters", type=int, default=5)
    p.add_argument(
        "--ntriples", action="store_true",
        help="also export the edge table as W3C N-Triples text under "
        "<output>/ntriples (subj/pred/obj as IRIs; interchange with "
        "any RDF toolchain)",
    )
    p.add_argument(
        "--nquads", action="store_true",
        help="also export the edge table as W3C N-Quads text under "
        "<output>/nquads, graph label = the owning repo (edges with "
        "no provenance fall into the default graph); GRAPH-scoped "
        "SPARQL over the parse-back keeps per-repo query isolation",
    )
    p.add_argument(
        "--communities", action="store_true",
        help="also run deterministic Louvain over the symbol call "
        "graph and write (node, community) under <output>/communities",
    )
    p.add_argument(
        "--truss", type=int, default=0, metavar="K",
        help="also extract the K-truss of the symbol call graph and "
        "write its edge set under <output>/truss (cohesive cores)",
    )
    p.add_argument(
        "--sameas", default=None, metavar="PATH",
        help="parquet of owl:sameAs assertions (subj, pred, obj); fuse "
        "the identity clusters into the edge table (canonical-min "
        "rewrite, assertions consumed, set dedup) and write the result "
        "under <output>/edges_fused",
    )
    p.add_argument(
        "--owl", default=None, metavar="PATH",
        help="parquet of pD* schema triples (subj, pred, obj): "
        "(p, type, SymmetricProperty|TransitiveProperty), "
        "(p, inverseOf, q), (p, type, (Inverse)FunctionalProperty). "
        "Saturates the edge table under the OWL Horst property rules "
        "(owl.owl_property_closure), derives functional sameAs "
        "clashes, and writes base+derived under <output>/edges_owl",
    )
    p.add_argument(
        "--snapshot", action="store_true",
        help="collapse a multi-commit source to the latest row per "
        "(repo, path) before building (day-2 ingest; commit must be a "
        "sortable ordinal — see triples.latest_snapshot)",
    )
    p.add_argument(
        "--stream", action="store_true",
        help="ingest --input as a Structured Streaming file source "
        "through streaming_kg_sink (edges partitioned by "
        "(pred, batch_id), idempotent replay, per-batch metrics) "
        "instead of the batch pipeline; processes everything currently "
        "in the directory, then stops",
    )
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pawpaw_spark.session import get_spark
    from pawpaw_spark.pipeline import build_kg

    spark = get_spark(app_name="build_kg", master=args.master)

    if args.stream:
        # validate BEFORE any batch read: the stream path supplies its
        # own schema and must not pay batch file listing/footer reads
        if not args.input:
            raise SystemExit("--stream requires --input (a parquet dir)")
        if args.snapshot:
            raise SystemExit(
                "--snapshot is a batch-read collapse; with --stream, "
                "run latest_snapshot on the materialized store instead"
            )
        from pawpaw_spark.streaming.events import streaming_kg_sink

        t0 = time.time()
        stream = (
            spark.readStream.schema(
                "repo string, path string, commit string, lang string, "
                "content string"
            )
            .option("maxFilesPerTrigger", 8)
            .parquet(args.input)
        )
        q = streaming_kg_sink(
            stream,
            f"{args.output}/edges_stream",
            f"{args.output}/_stream_ckpt",
        )
        q.processAllAvailable()
        q.stop()
        # store totals, labeled as such: a RESUMED run ingests only new
        # files, so store totals divided by this run's wall time would
        # be a bogus throughput — no triples_per_sec is claimed here.
        # The store may not exist at all if every batch was empty.
        from pyspark.errors import AnalysisException
        from pyspark.sql import functions as F

        try:
            m = spark.read.parquet(f"{args.output}/edges_stream/_metrics")
            total_edges = int(
                m.agg(F.sum("n_edges").alias("e")).first()["e"] or 0
            )
            n_batches = m.select("batch_id").distinct().count()
        except AnalysisException:
            total_edges, n_batches = 0, 0
        stats = {
            "wall_sec": round(time.time() - t0, 2),
            "edges_store_total": total_edges,
            "batches_store_total": n_batches,
        }
        print(json.dumps(stats))
        spark.stop()
        return

    if args.synthetic:
        from pawpaw_spark.corpus import source_df

        source = source_df(spark, n_files=args.synthetic, seed=42)
    elif args.input:
        source = spark.read.parquet(args.input)
    else:
        raise SystemExit("one of --input / --synthetic is required")

    if args.snapshot:
        from pawpaw_spark.operators.triples import latest_snapshot

        source = latest_snapshot(source)

    t0 = time.time()
    res = build_kg(
        spark, source, args.output, n_buckets=args.buckets,
        link_threshold=args.link_threshold, edges_mode=args.edges_mode,
        analytics=args.analytics, pagerank_iters=args.pagerank_iters,
    )
    stats = {
        "wall_sec": round(time.time() - t0, 2),
        "segments": res["segments"].count(),
        "edges": res["edges"].count(),
        "nodes": res["nodes"].count(),
    }
    if args.analytics:
        stats["node_metrics"] = res["node_metrics"].count()
    if args.ntriples:
        from pawpaw_spark.operators.ntriples import to_ntriples

        # projection over the already-materialized edge table — rides
        # the scan, no shuffle; mode=overwrite keeps the job rerunnable
        to_ntriples(res["edges"]).write.mode("overwrite").text(
            f"{args.output}/ntriples"
        )
        stats["ntriples"] = stats["edges"]
    if args.nquads:
        from pyspark.sql import functions as F

        from pawpaw_spark.operators.ntriples import to_nquads

        # graph label = owning repo (doc_id is repo/path@commit);
        # provenance-free edges go to the default graph — a projection
        # over the materialized table, no shuffle
        q = res["edges"].withColumn(
            "graph",
            F.when(F.col("doc_id").isNull(), F.lit(None)).otherwise(
                F.concat(
                    F.lit("repo/"),
                    F.split(F.col("doc_id"), "/").getItem(0),
                )
            ),
        )
        to_nquads(q).write.mode("overwrite").text(f"{args.output}/nquads")
        stats["nquads"] = stats["edges"]
    if args.communities or args.truss:
        from pyspark.sql import functions as F

        refs = res["edges"].filter(F.col("pred") == "REFERENCES")
        if args.communities:
            from pawpaw_spark.operators.graph import louvain

            comm = louvain(refs, "subj", "obj")
            comm.write.mode("overwrite").parquet(
                f"{args.output}/communities"
            )
            stats["communities"] = comm.select("community").distinct().count()
        if args.truss:
            from pawpaw_spark.operators.graph import ktruss

            truss = ktruss(refs, args.truss, "subj", "obj")
            truss.write.mode("overwrite").parquet(f"{args.output}/truss")
            stats["truss_edges"] = truss.count()
    if args.sameas:
        from pawpaw_spark.operators.rdfs import sameas_fuse

        sa = spark.read.parquet(args.sameas).select("subj", "pred", "obj")
        fused = sameas_fuse(
            res["edges"].select("subj", "pred", "obj").unionByName(sa)
        )
        fused.write.mode("overwrite").parquet(f"{args.output}/edges_fused")
        stats["edges_fused"] = fused.count()
    if args.owl:
        from pawpaw_spark.operators.owl import (
            functional_sameas,
            owl_property_closure,
        )

        schema = spark.read.parquet(args.owl).select("subj", "pred", "obj")
        base = res["edges"].select("subj", "pred", "obj").unionByName(schema)
        saturated = owl_property_closure(base, include_base=True)
        saturated.write.mode("overwrite").parquet(
            f"{args.output}/edges_owl"
        )
        stats["edges_owl"] = saturated.count()
        sameas = functional_sameas(base)
        sameas.write.mode("overwrite").parquet(
            f"{args.output}/owl_sameas"
        )
        stats["owl_sameas"] = sameas.count()
    stats["triples_per_sec"] = round(stats["edges"] / stats["wall_sec"], 1)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
