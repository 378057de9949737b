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

from pyspark.sql import DataFrame, Window as W
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


def rebuild_forest(spans: DataFrame) -> DataFrame:
    """(doc_id, start, stop, desc) -> a full segments forest, derived
    relationally from span containment alone — the set form of the
    reference's ``add_hierarchical`` insertion (``pawpaw/ito.py:1546-1615``):

    * parent       = tightest strictly-containing span
    * depth        = number of containing spans
    * path         = containing spans in root->parent order
    * seg_id/dfs   = pre-order DFS position = ORDER BY (start, -stop)

    Insertion-order independent (the reference reaches the same tree
    from any insertion order); duplicate spans within a doc are not
    supported (the reference nests them by arrival order / key — an
    order concept a set operator doesn't have) and must be deduped
    first. Overlapping non-nested spans raise in the reference; here
    each span simply parents to its tightest container, so validate
    upstream if strictness is needed.

    The self-join is per-doc (equi on doc_id + containment range
    predicate): with the table bucketed by doc_id it is partition-local;
    output volume is O(n * avg_depth) per doc.
    """
    w_dfs = W.partitionBy("doc_id").orderBy(F.col("start").asc(), F.col("stop").desc())
    base = spans.select("doc_id", "start", "stop", "desc").withColumn(
        "seg_id", F.row_number().over(w_dfs).cast("long") - 1
    )
    x = base.select("doc_id", *[F.col(c).alias(f"x_{c}") for c in ("seg_id", "start", "stop")])
    y = base.select("doc_id", *[F.col(c).alias(f"y_{c}") for c in ("seg_id", "start", "stop")])
    contains = (
        (F.col("y_start") <= F.col("x_start"))
        & (F.col("x_stop") <= F.col("y_stop"))
        & ((F.col("y_start") < F.col("x_start")) | (F.col("x_stop") < F.col("y_stop")))
    )
    anc = x.join(y, "doc_id").filter(contains)
    w_tight = W.partitionBy("doc_id", "x_seg_id").orderBy(
        F.col("y_start").desc(), F.col("y_stop").asc()
    )
    per_node = (
        anc.withColumn("__rk", F.row_number().over(w_tight))
        .groupBy("doc_id", "x_seg_id")
        .agg(
            F.max(F.when(F.col("__rk") == 1, F.col("y_seg_id"))).alias("parent_id"),
            F.count(F.lit(1)).alias("depth"),
            F.sort_array(
                F.collect_list(F.struct(F.col("y_start"), (-F.col("y_stop")).alias("ns"), F.col("y_seg_id")))
            ).alias("__anc"),
        )
        .select(
            "doc_id",
            F.col("x_seg_id").alias("seg_id"),
            "parent_id",
            "depth",
            F.transform("__anc", lambda s: s["y_seg_id"]).alias("path"),
        )
    )
    out = base.join(per_node, ["doc_id", "seg_id"], "left").select(
        "doc_id", "seg_id",
        F.col("parent_id").cast("long").alias("parent_id"),
        "start", "stop", "desc",
        F.coalesce("depth", F.lit(0)).cast("int").alias("depth"),
        F.lit("rebuild").alias("rule_tag"),
        F.lit(None).cast("string").alias("value"),
        F.coalesce("path", F.array().cast("array<long>")).alias("path"),
    )
    kids = out.groupBy(
        F.col("doc_id").alias("__k_doc"), F.col("parent_id").alias("__p")
    ).agg(F.count(F.lit(1)).alias("__n"))
    w_sib = W.partitionBy("doc_id", "parent_id").orderBy(
        F.col("start").asc(), F.col("stop").desc()
    )
    return (
        out.join(
            kids,
            (out["doc_id"] == kids["__k_doc"]) & (out["seg_id"] == kids["__p"]),
            "left",
        )
        .select(
            "doc_id", "seg_id", "parent_id", "start", "stop", "desc", "depth",
            "rule_tag", "value", "path",
            F.coalesce("__n", F.lit(0)).cast("int").alias("n_children"),
            (F.row_number().over(w_sib) - 1).cast("int").alias("sibling_idx"),
            F.col("seg_id").cast("int").alias("dfs_idx"),
        )
    )


def attach_by_containment(segments: DataFrame, new_spans: DataFrame) -> DataFrame:
    """Insert new spans into an existing forest by span containment
    (cross-stage ``Connectors.Children.AddHierarchical``): the combined
    forest is re-derived from spans, so enclosed existing segments
    re-parent onto tighter new spans exactly as the reference's
    insertion does."""
    cols = ["doc_id", "start", "stop", "desc"]
    combined = segments.select(cols).unionByName(new_spans.select(cols))
    return rebuild_forest(combined)


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


def tree_dump(segments: DataFrame, text_by_doc: dict[str, str], doc_id: str) -> str:
    """Render one document's segment tree in the reference Tree-dumper
    format — ``(start, stop) 'desc' : 'substr'`` rows joined by
    box-drawing connectors (``pawpaw/visualization/pepo/pepo.py:59``;
    parity-tested in tests/test_format.py). Debug surface: collects ONE
    doc's segments to the driver by design."""
    rows = sorted(
        (
            r
            for r in segments.filter(F.col("doc_id") == doc_id).collect()
        ),
        key=lambda r: r["seg_id"],
    )
    text = text_by_doc[doc_id]
    by_id = {r["seg_id"]: r for r in rows}
    kids: dict[int | None, list] = {}
    for r in rows:
        p = r["parent_id"] if r["parent_id"] in by_id else None
        kids.setdefault(p, []).append(r)
    for v in kids.values():
        v.sort(key=lambda r: (r["start"], -r["stop"]))

    def node_line(r) -> str:
        desc = r["desc"] if r["desc"] is not None else ""
        return f"({r['start']}, {r['stop']}) '{desc}' : '{text[r['start']:r['stop']]}'"

    out: list[str] = []

    def emit(r, prefix: str, is_last: bool, is_root: bool) -> None:
        if is_root:
            out.append(node_line(r))
            child_prefix = ""
        else:
            out.append(prefix + ("└──" if is_last else "├──") + node_line(r))
            child_prefix = prefix + ("   " if is_last else "│  ")
        cs = kids.get(r["seg_id"], [])
        for i, c in enumerate(cs):
            emit(c, child_prefix, i == len(cs) - 1, False)

    top = kids.get(None, [])
    for i, r in enumerate(top):
        emit(r, "", i == len(top) - 1, len(top) == 1 and r["parent_id"] is None)
    return "\n".join(out)
