"""Checkpoint-resume + per-partition lineage (north_rule requirement).

Batch-idempotent design: every stage writes its output parquet
partitioned by a bucket key; a ``_lineage`` parquet table records
(stage, partition_key, input_fingerprint, rows_in, rows_out, wall_ms,
status). On resume, completed (stage, partition, fingerprint) triples
are anti-joined away and only missing/invalidated buckets recompute,
with dynamic partition overwrite so re-runs are idempotent.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pawpaw_spark.schemas import LINEAGE_SCHEMA


def bucket_key(col, n_buckets: int):
    """Stable partition key; hash-spread so one mega-repo lands across
    buckets only if you salt upstream — the bucket itself is the resume
    granularity."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


class LineageLog:
    def __init__(self, base_dir: str):
        self.path = os.path.join(base_dir, "_lineage")

    def read(self, spark: SparkSession) -> DataFrame:
        try:
            return spark.read.schema(LINEAGE_SCHEMA).parquet(self.path)
        except Exception:
            return spark.createDataFrame([], schema=LINEAGE_SCHEMA)

    def completed(self, spark: SparkSession, stage: str) -> DataFrame:
        """(partition_key, input_fingerprint) of successful runs."""
        return (
            self.read(spark)
            .filter((F.col("stage") == stage) & (F.col("status") == "ok"))
            .select("partition_key", "input_fingerprint")
            .distinct()
        )

    def record(self, spark: SparkSession, rows: list[dict]) -> None:
        if rows:
            spark.createDataFrame(rows, schema=LINEAGE_SCHEMA).write.mode("append").parquet(
                self.path
            )


def stage_fingerprints(df: DataFrame, bucket_col: str = "bucket") -> DataFrame:
    """Per-bucket input fingerprint: count + xor of row hashes — cheap,
    order-insensitive, and changes when any input row changes."""
    row_hash = F.xxhash64(*[F.col(c) for c in df.columns if c != bucket_col])
    return (
        df.withColumn("__rh", row_hash)
        .groupBy(bucket_col)
        .agg(
            F.count(F.lit(1)).alias("rows_in"),
            F.expr("bit_xor(__rh)").cast("string").alias("fp"),
        )
    )


def run_stage(
    spark: SparkSession,
    stage: str,
    inp: DataFrame,
    transform,
    out_dir: str,
    lineage: LineageLog,
    bucket_col: str = "bucket",
    fps: DataFrame | None = None,
) -> DataFrame:
    """Resume-aware stage runner.

    ``inp`` must carry ``bucket_col``. Buckets whose (key, fingerprint)
    already appear in the lineage log are skipped; the rest run through
    ``transform`` (which must preserve ``bucket_col``) and land in
    ``out_dir`` via dynamic partition overwrite. Returns the full stage
    output (reading previously-completed buckets from disk).

    Pass a precomputed/cached ``fps`` (from :func:`stage_fingerprints`)
    when several stages share the same input — fingerprinting hashes
    every input row, and at 100 TB one content scan per stage is the
    difference between metadata cost and a second full read.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out_path = os.path.join(out_dir, stage)

    if fps is None:
        fps = stage_fingerprints(inp, bucket_col)
    done = lineage.completed(spark, stage)
    pending = fps.join(
        done,
        (fps[bucket_col].cast("string") == done["partition_key"])
        & (fps["fp"] == done["input_fingerprint"]),
        "left_anti",
    )
    pending_rows = pending.collect()  # bucket list is small (metadata, not data)
    pending_keys = [r[bucket_col] for r in pending_rows]
    fp_by_key = {r[bucket_col]: (r["fp"], r["rows_in"]) for r in pending_rows}

    if pending_keys:
        todo = inp.filter(F.col(bucket_col).isin(pending_keys))
        t0 = time.time()
        result = transform(todo)
        # cluster by the partition column first: otherwise every task
        # holds rows of many buckets and partitionBy fans out
        # n_tasks x n_buckets small files (2048 at local[32]/64 buckets).
        # A secondary content-derived salt spreads each bucket over up to
        # 8 write tasks — bucket = repo-hash, and a mega-repo (the skew
        # fixture holds 40% of the corpus) would otherwise serialize its
        # whole write through one straggler task. Deterministic salt
        # (hash of the first column), so task retries are safe; files per
        # bucket directory stay bounded at 8.
        first = result.columns[0]
        salt = F.pmod(F.xxhash64(F.col(first)), F.lit(8))
        result.repartition(F.col(bucket_col), salt).write.mode("overwrite").partitionBy(
            bucket_col
        ).parquet(out_path)
        wall_ms = int((time.time() - t0) * 1000)
        out_counts = {
            r[bucket_col]: r["n"]
            for r in spark.read.parquet(out_path)
            .filter(F.col(bucket_col).isin(pending_keys))
            .groupBy(bucket_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        lineage.record(
            spark,
            [
                {
                    "stage": stage,
                    "partition_key": str(k),
                    "input_fingerprint": fp_by_key[k][0],
                    "rows_in": int(fp_by_key[k][1]),
                    "rows_out": int(out_counts.get(k, 0)),
                    "wall_ms": wall_ms,
                    "status": "ok",
                }
                for k in pending_keys
            ],
        )
    return spark.read.parquet(out_path)
