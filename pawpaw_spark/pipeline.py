"""End-to-end KG build: source table -> segments -> triples -> linked &
canonicalized node/edge tables, checkpoint-resumable with lineage.

This is the spark-submit entry surface (jobs/build_kg.py wraps it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pawpaw_spark.lineage import LineageLog, bucket_key, run_stage
from pawpaw_spark.operators.canon import canonicalize_nodes, rewrite_edges_canonical
from pawpaw_spark.operators.linking import link_symbols
from pawpaw_spark.operators.segment import check_sha256_invariant, with_sha256
from pawpaw_spark.operators.triples import build_edges, build_nodes, segment_by_lang


def build_kg(
    spark: SparkSession,
    source: DataFrame,
    out_dir: str,
    n_buckets: int = 64,
    link_threshold: float = 0.82,
) -> dict[str, DataFrame]:
    """Returns {'segments', 'edges', 'nodes', 'edges_canonical'}.

    Resume: rerunning with the same out_dir skips completed buckets
    (lineage anti-join); changed input rows invalidate exactly their
    bucket via the per-bucket fingerprint.
    """
    lineage = LineageLog(out_dir)

    if "sha256" not in source.columns:
        source = with_sha256(source)
    bad = check_sha256_invariant(source)
    if bad:
        raise ValueError(f"sha256 invariant violated on {bad} input rows")

    src_b = source.withColumn("bucket", bucket_key(F.col("repo"), n_buckets))

    segments = run_stage(
        spark,
        "segments",
        src_b,
        lambda df: segment_by_lang(df, passthrough=("bucket",)),
        out_dir,
        lineage,
    )

    doc_bucket = src_b.select(
        F.concat_ws("@", F.concat_ws("/", "repo", "path"), "commit").alias("doc_id"),
        "bucket",
    )

    def edges_transform(df):
        # consume the already-materialized segments of the pending buckets
        pending_segs = segments.join(df.select("bucket").distinct(), "bucket")
        e = build_edges(df.drop("bucket"), segments=pending_segs.drop("bucket"))
        return e.join(doc_bucket, "doc_id")

    edges = run_stage(spark, "edges", src_b, edges_transform, out_dir, lineage)

    match_edges = link_symbols(segments, threshold=link_threshold)
    nodes = build_nodes(edges)
    nodes_canon = canonicalize_nodes(nodes, match_edges)

    nodes_out = f"{out_dir}/nodes"
    edges_out = f"{out_dir}/edges_canonical"
    nodes_canon.repartition("salt").write.mode("overwrite").partitionBy("salt").parquet(nodes_out)
    # rewrite edges against the WRITTEN node table — joining the
    # unwritten plan would re-run union-find + node distinct a second
    # time (measured 46s of pure recompute at 20k files)
    nodes_canon = spark.read.parquet(nodes_out)
    edges_canon = rewrite_edges_canonical(edges, nodes_canon)
    edges_canon.withColumn("salt", bucket_key(F.col("subj"), 64)).repartition(
        "salt"
    ).write.mode("overwrite").partitionBy("salt").parquet(edges_out)

    return {
        "segments": segments,
        "edges": edges,
        "nodes": spark.read.parquet(nodes_out),
        "edges_canonical": spark.read.parquet(edges_out),
    }
