"""Canonical schemas (SURVEY.md §1.3)."""

from __future__ import annotations

from pyspark.sql import types as T

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("sha256", T.StringType(), True),  # per-row invariant column
    ]
)

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("seg_id", T.LongType(), False),
        T.StructField("parent_id", T.LongType(), True),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("stop", T.IntegerType(), False),
        T.StructField("desc", T.StringType(), True),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("rule_tag", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("path", T.ArrayType(T.LongType()), True),
        T.StructField("n_children", T.IntegerType(), True),
        T.StructField("sibling_idx", T.IntegerType(), True),
        T.StructField("dfs_idx", T.IntegerType(), True),
    ]
)

SEGMENT_DDL = (
    "doc_id string, seg_id long, parent_id long, start int, stop int, "
    "desc string, depth int, rule_tag string, value string, "
    "path array<long>, n_children int, sibling_idx int, dfs_idx int"
)

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),  # CONTAINS|DEFINES|REFERENCES|HAS_SEGMENT
        T.StructField("obj", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("start", T.IntegerType(), True),
        T.StructField("stop", T.IntegerType(), True),
    ]
)

NODE_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # repo|file|symbol|span
        T.StructField("canon_id", T.StringType(), True),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("input_fingerprint", T.StringType(), True),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)
