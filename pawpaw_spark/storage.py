"""Bucketed at-rest layout for the KG tables.

SURVEY.md §4.2: segment/edge tables bucketed by ``doc_id`` make every
per-doc join (segments x source text, segments self-joins, edge
provenance joins) co-partitioned — SortMergeJoin with NO exchange on
either side. At 100 TB that removes the dominant shuffle from the
query path; the write-side cost is one clustering pass at build time.

Spark's native (non-Hive) bucketing only applies through the table
catalog, so these helpers go through ``saveAsTable`` and read back via
``spark.table`` — tests assert the exchange-free join plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "doc_id",
    n_buckets: int = 64,
    sort_cols: tuple[str, ...] = ("seg_id",),
    mode: str = "overwrite",
) -> None:
    """Cluster + sort into a bucketed catalog table (parquet)."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cojoin(
    spark: SparkSession, left_table: str, right_table: str, on: str = "doc_id"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket column — plans as
    an exchange-free SortMergeJoin (asserted in tests/test_storage.py)."""
    return spark.table(left_table).join(spark.table(right_table), on)
