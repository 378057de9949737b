"""SparkSession factory tuned for the KG-construction workload.

Local mode is a sandbox proxy for a multi-executor cluster: every knob
set here (AQE, skew-join handling, Arrow batching, shuffle-partition
sizing) is the same knob that matters at 1000 executors; only the
values scale.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pawpaw_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("PAWPAW_SPARK_MASTER", "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Parallelism-derived defaults: shuffle partitions ~ cores in local mode;
    # on a real cluster this is set to 2-3x total cores via spark-submit conf.
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local["):-1]
            shuffle_partitions = 32 if inner == "*" else max(8, int(inner))
        else:
            shuffle_partitions = 200

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Source files vary 100B-10MB; bound Arrow batch row counts so a
        # batch of long documents still fits comfortably in executor memory.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # NOTE: spark.sql.files.minPartitionNum is deliberately NOT set:
        # parquet cannot split below row-group granularity, so the floor
        # only manufactures empty splits — which hide under-splitting
        # from the explicit fan-out heuristics in segment()/_fan()
        # (they repartition when getNumPartitions() < defaultParallelism).
        .config("spark.driver.memory", os.environ.get("PAWPAW_SPARK_DRIVER_MEM", "48g"))
        # Batch-throughput GC: the edge tables materialize millions of
        # short-lived strings per task; G1's pause-time targeting caps
        # scaling at high core counts (measured 0.46 -> 0.84 efficiency
        # 8->32 cores switching to the parallel collector).
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        # catalog tables (bucketed layouts, storage.py) land outside the
        # repo; static conf, so it must be set at session creation
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("PAWPAW_SPARK_WAREHOUSE", "/tmp/pawpaw_spark_warehouse"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def truncated_checkpoint(df):
    """``localCheckpoint(eager=True)`` that also RESETS plan statistics.

    Spark's ``localCheckpoint`` truncates the logical plan to a
    ``LogicalRDD`` but carries the pre-checkpoint ``sizeInBytes``
    forward as origin stats. An iterative operator whose round output
    consumes the previous round's checkpoint TWICE (k-core's two
    survivor restrictions, PageRank's contribution + dangling-mass
    reads) therefore SQUARES the size estimate every round —
    double-exponential BigInteger growth that OOMs the driver inside
    ``SizeInBytesOnlyStatsPlanVisitor`` after ~30 rounds (observed on a
    30-round peel cascade; digit count doubles per round). Rebuilding
    the DataFrame from the checkpointed InternalRow RDD drops the
    origin stats, so every round starts from ``defaultSizeInBytes``
    again: estimates stay O(1) while AQE's runtime statistics (exact,
    post-shuffle) still drive broadcast/skew decisions where they
    matter.

    Uses ``SparkSession.internalCreateDataFrame`` (the same JVM entry
    point PySpark's own Arrow ingestion rides); falls back to the plain
    checkpoint if the internal surface moves.
    """
    cp = df.localCheckpoint(eager=True)
    try:
        from pyspark.sql import DataFrame

        spark = df.sparkSession
        jrdd = cp._jdf.queryExecution().toRdd()
        jschema = spark._jvm.org.apache.spark.sql.types.DataType.fromJson(
            cp.schema.json()
        )
        return DataFrame(
            spark._jsparkSession.internalCreateDataFrame(jrdd, jschema, False),
            spark,
        )
    except Exception:  # pragma: no cover - internal-API drift guard
        return cp


@contextmanager
def fixpoint_loop_conf(spark, approx_state_rows: int | None = None,
                       rows_per_partition: int = 2_000_000):
    """Runtime-conf scope for iterative fixpoint loops (SCC, CC,
    k-core, BFS, LPA, topo peeling).

    A fixpoint loop's per-round state is O(V + E) of the GRAPH — at
    corpus scale that is orders of magnitude smaller than the scan that
    produced the edges (a 100 TB corpus yields an edge table in the
    tens of GB), and at bench scale it is kilobytes. Two session
    defaults that are right for corpus-sized scans are wrong inside the
    loop:

    * ``spark.sql.shuffle.partitions`` sized for the corpus gives every
      tiny per-round shuffle the full task fan-out — pure scheduling
      fixed cost, paid 2-4x per round x rounds-to-convergence;
    * AQE materializes EVERY shuffle stage as its own job to re-plan —
      adaptivity buys nothing on a loop whose stages are uniform and
      metadata-sized, but multiplies job-launch fixed costs ~4x
      (measured: one SCC decomposition at sf0.1 = 223 jobs with AQE on,
      per-job cost dominating end-to-end wall time).

    Inside the scope, shuffle width tracks the STATE size
    (``approx_state_rows / rows_per_partition``, floored at 4 for
    straggler/skew headroom, capped at the session default so a
    billion-edge graph still gets the full cluster width) and AQE is
    off (loop shuffles are uniform; skew in the DATA-sized joins that
    build the edge table stays outside the scope, where AQE remains
    on). Both confs are restored on exit even on error — the scope is
    what makes a session-global runtime conf safe to touch here.
    """
    conf = spark.conf
    old_sp = conf.get("spark.sql.shuffle.partitions")
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    try:
        default_sp = int(old_sp)
    except (TypeError, ValueError):  # pragma: no cover - "auto" etc.
        default_sp = 200
    width = default_sp
    if approx_state_rows is not None:
        width = max(4, min(default_sp, approx_state_rows // rows_per_partition + 1))
    try:
        conf.set("spark.sql.shuffle.partitions", str(width))
        conf.set("spark.sql.adaptive.enabled", "false")
        yield width
    finally:
        conf.set("spark.sql.shuffle.partitions", old_sp)
        conf.set("spark.sql.adaptive.enabled", old_aqe)
