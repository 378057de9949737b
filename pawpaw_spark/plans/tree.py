"""Tree-navigation helpers over the segments table.

Relational forms of the reference's instance traversal API
(``pawpaw/ito.py``): ``get_root`` (:1321), ``walk_descendants`` (:1327),
``descends_from``/``has_descendant`` (:1342-1350), children / parent
navigation via ``ChildItos``. All are joins/filters on the precomputed
``path`` / ``parent_id`` / ``dfs_idx`` / ``n_children`` columns, so no
recursion or iteration happens at query time — the build-time kernel
paid for these once (SURVEY.md §4.2).

Every helper takes and returns segment-shaped DataFrames; ``nodes``
identifies segments by (doc_id, seg_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = ["doc_id", "seg_id"]


def roots(segments: DataFrame) -> DataFrame:
    return segments.filter(F.col("parent_id").isNull())


def leaves(segments: DataFrame) -> DataFrame:
    return segments.filter(F.col("n_children") == 0)


def children_of(segments: DataFrame, nodes: DataFrame) -> DataFrame:
    sel = nodes.select(F.col("doc_id").alias("__d"), F.col("seg_id").alias("__s"))
    return segments.join(
        sel, (segments["doc_id"] == sel["__d"]) & (segments["parent_id"] == sel["__s"])
    ).drop("__d", "__s")


def parent_of(segments: DataFrame, nodes: DataFrame) -> DataFrame:
    sel = nodes.select(F.col("doc_id").alias("__d"), F.col("parent_id").alias("__p"))
    return segments.join(
        sel, (segments["doc_id"] == sel["__d"]) & (segments["seg_id"] == sel["__p"])
    ).drop("__d", "__p").dropDuplicates(_KEY)


def descendants_of(segments: DataFrame, nodes: DataFrame) -> DataFrame:
    """DFS document order (walk_descendants): descendants carry the
    ancestor in their path array — an equi-ish join on array_contains,
    partition-local per doc."""
    sel = nodes.select(F.col("doc_id").alias("__d"), F.col("seg_id").alias("__s"))
    return (
        segments.join(
            sel,
            (segments["doc_id"] == sel["__d"]) & F.array_contains(segments["path"], sel["__s"]),
        )
        .drop("__d", "__s")
        .dropDuplicates(_KEY)
        .orderBy("doc_id", "dfs_idx")
    )


def ancestors_of(segments: DataFrame, nodes: DataFrame) -> DataFrame:
    """Nearest-first per node (reference '...' axis default order)."""
    anc = nodes.select(
        F.col("doc_id").alias("__d"), F.posexplode("path").alias("__pos", "__a")
    )
    return segments.join(
        anc, (segments["doc_id"] == anc["__d"]) & (segments["seg_id"] == anc["__a"])
    ).drop("__d", "__a").dropDuplicates(_KEY + ["__pos"]).drop("__pos")


def descends_from(segments: DataFrame, ancestor_doc: str, ancestor_id: int) -> DataFrame:
    return segments.filter(
        (F.col("doc_id") == ancestor_doc) & F.array_contains("path", ancestor_id)
    )


def subtree_spans(segments: DataFrame) -> DataFrame:
    """(doc_id, seg_id, start, stop, n_descendants) — adopt/join-style
    covering stats per subtree without touching text."""
    child = segments.select(
        F.col("doc_id").alias("c_doc"), F.explode("path").alias("anc_id"),
        F.col("start").alias("c_start"), F.col("stop").alias("c_stop"),
    )
    agg = child.groupBy("c_doc", "anc_id").agg(
        F.count(F.lit(1)).alias("n_descendants"),
        F.min("c_start").alias("min_start"),
        F.max("c_stop").alias("max_stop"),
    )
    return segments.join(
        agg,
        (segments["doc_id"] == agg["c_doc"]) & (segments["seg_id"] == agg["anc_id"]),
        "left",
    ).select(
        "doc_id", "seg_id", "start", "stop",
        F.coalesce("n_descendants", F.lit(0)).alias("n_descendants"),
    )
