"""XML convenience surface over the descriptor segments table —
DataFrame form of the reference's ``XmlHelper`` / ``QualifiedName``
(behavior spec: ``pawpaw/xml/xml_helper.py:14-249``).

All helpers are pure DataFrame joins over the segments emitted by
:mod:`pawpaw_spark.sources.xml` (plus the source text to render
values). Parent-chain hops are equi-joins on (doc_id, parent_id) —
co-partitioned when the tables are bucketed by doc_id, so each helper
is shuffle-free at rest (SURVEY.md §4.2).

Scalar tag-string helpers (``local_name`` / ``namespace_of``) are plain
column expressions over ElementTree-style ``{uri}name`` tags.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pawpaw_spark.functions.strings import seg_text


def local_name(tag: Column) -> Column:
    """'{uri}name' -> 'name' (reference ``get_local_name``)."""
    return F.when(
        F.locate("}", tag) > 0, F.substring_index(tag, "}", -1)
    ).otherwise(tag)


def namespace_of(tag: Column) -> Column:
    """'{uri}name' -> '{uri}' or NULL (reference ``get_namespace``)."""
    pos = F.locate("}", tag)
    return F.when(pos > 0, F.substring(tag, F.lit(1), pos))


def _with_text(segments: DataFrame, source: DataFrame, text_col: str) -> DataFrame:
    src = source.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(text_col).alias("__content"),
    )
    return segments.join(src, "doc_id")


def _child(parent: DataFrame, segments: DataFrame, desc: str, prefix: str) -> DataFrame:
    """Join ``segments`` rows of ``desc`` whose parent is in ``parent``
    (keyed by (doc_id, seg_id)); child columns come back prefixed.
    Join keys are renamed on the child side — chained helper joins would
    otherwise make bare ``doc_id`` references ambiguous."""
    kid = segments.filter(F.col("desc") == desc).select(
        F.col("doc_id").alias("__kdoc"),
        F.col("parent_id").alias("__pid"),
        F.col("seg_id").alias(f"{prefix}_seg_id"),
        F.col("start").alias(f"{prefix}_start"),
        F.col("stop").alias(f"{prefix}_stop"),
    )
    return parent.join(
        kid,
        (F.col("doc_id") == F.col("__kdoc")) & (F.col("seg_id") == F.col("__pid")),
    ).drop("__kdoc", "__pid")


def qualified_names(
    segments: DataFrame, source: DataFrame, text_col: str = "content"
) -> DataFrame:
    """(doc_id, element_id, prefix, local) for every element's tag —
    the reference's ``QualifiedName``/``get_qualified_name`` over
    start-tag segments. ``prefix`` is NULL for unprefixed tags."""
    st = segments.filter(F.col("desc") == "start_tag").select(
        "doc_id", F.col("parent_id").alias("element_id"), "seg_id"
    )
    tag = _child(st, segments, "tag", "tag").select(
        "doc_id", "element_id", F.col("tag_seg_id").alias("seg_id")
    )
    named = _child(tag, segments, "name", "nm")
    ns = segments.filter(F.col("desc") == "namespace").select(
        F.col("doc_id").alias("__nsdoc"),
        F.col("parent_id").alias("__tagid"),
        F.col("start").alias("ns_start"),
        F.col("stop").alias("ns_stop"),
    )
    out = named.join(
        ns,
        (F.col("doc_id") == F.col("__nsdoc")) & (F.col("seg_id") == F.col("__tagid")),
        "left",
    ).drop("__nsdoc", "__tagid")
    out = _with_text(out, source, text_col)
    return out.select(
        "doc_id",
        "element_id",
        seg_text(F.col("__content"), F.col("ns_start"), F.col("ns_stop")).alias("prefix"),
        seg_text(F.col("__content"), F.col("nm_start"), F.col("nm_stop")).alias("local"),
    )


def xmlns_declarations(
    segments: DataFrame, source: DataFrame, text_col: str = "content"
) -> DataFrame:
    """(doc_id, element_id, prefix, uri) from xmlns / xmlns:p attribute
    declarations (reference ``get_xmlns``). ``prefix`` NULL = the
    default namespace declaration."""
    attr = segments.filter(F.col("desc") == "attribute").select(
        "doc_id", "seg_id", F.col("parent_id").alias("__attrs_id")
    )
    keyed = _child(attr, segments, "key", "k")
    valued = _child(
        keyed.select("doc_id", "seg_id", "__attrs_id", "k_start", "k_stop"),
        segments, "value", "v",
    )
    # attribute -> attributes -> start_tag -> element parent chain
    attrs = segments.filter(F.col("desc") == "attributes").select(
        F.col("doc_id").alias("__adoc"),
        F.col("seg_id").alias("__attrs_id2"),
        F.col("parent_id").alias("__st_id"),
    )
    st = segments.filter(F.col("desc") == "start_tag").select(
        F.col("doc_id").alias("__sdoc"),
        F.col("seg_id").alias("__st_id2"),
        F.col("parent_id").alias("element_id"),
    )
    j = (
        valued.join(
            attrs,
            (F.col("doc_id") == F.col("__adoc"))
            & (F.col("__attrs_id") == F.col("__attrs_id2")),
        )
        .drop("__adoc", "__attrs_id", "__attrs_id2")
        .join(
            st,
            (F.col("__st_id") == F.col("__st_id2"))
            & (F.col("doc_id") == F.col("__sdoc")),
        )
        .drop("__sdoc", "__st_id", "__st_id2")
    )
    j = _with_text(j, source, text_col)
    key = seg_text(F.col("__content"), F.col("k_start"), F.col("k_stop"))
    uri = seg_text(F.col("__content"), F.col("v_start"), F.col("v_stop"))
    return (
        j.withColumn("__key", key)
        .filter((F.col("__key") == "xmlns") | F.col("__key").startswith("xmlns:"))
        .select(
            "doc_id",
            "element_id",
            F.when(
                F.col("__key").startswith("xmlns:"),
                F.substring_index("__key", ":", -1),
            ).alias("prefix"),
            uri.alias("uri"),
        )
    )


def prefix_map(
    segments: DataFrame, source: DataFrame, text_col: str = "content"
) -> DataFrame:
    """(doc_id, prefix, uri) — prefixed declarations only, suitable for
    ElementTree-style prefix maps (reference ``get_prefix_map``)."""
    return (
        xmlns_declarations(segments, source, text_col)
        .filter(F.col("prefix").isNotNull())
        .select("doc_id", "prefix", "uri")
        .distinct()
    )


def default_namespaces(
    segments: DataFrame, source: DataFrame, text_col: str = "content"
) -> DataFrame:
    """(doc_id, element_id, default_uri) — every element's effective
    default namespace: the declaration on its NEAREST ancestor-or-self
    element carrying an unprefixed xmlns (reference
    ``get_default_namespace``'s upward walk, done as one join over the
    precomputed ancestor ``path`` arrays instead of per-node recursion)."""
    decls = xmlns_declarations(segments, source, text_col).filter(
        F.col("prefix").isNull()
    ).select("doc_id", F.col("element_id").alias("decl_elem"), "uri")
    decl_depth = segments.select(
        "doc_id", F.col("seg_id").alias("decl_elem"), F.col("depth").alias("decl_depth")
    )
    decls = decls.join(decl_depth, ["doc_id", "decl_elem"])
    elems = segments.filter(F.col("desc") == "element").select(
        "doc_id",
        F.col("seg_id").alias("element_id"),
        F.concat(F.col("path"), F.array(F.col("seg_id"))).alias("__self_and_ancestors"),
    )
    cand = elems.join(decls, "doc_id").filter(
        F.array_contains(F.col("__self_and_ancestors"), F.col("decl_elem"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id", "element_id").orderBy(F.col("decl_depth").desc())
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "element_id", F.col("uri").alias("default_uri"))
    )


def find_elements_by_local_name(
    segments: DataFrame, source: DataFrame, name: str, text_col: str = "content"
) -> DataFrame:
    """Element segments whose tag's local name equals ``name``
    (reference ``find_all_descendants_by_local_name``)."""
    qn = qualified_names(segments, source, text_col).filter(F.col("local") == name)
    elems = segments.filter(F.col("desc") == "element").select(
        "doc_id", F.col("seg_id").alias("element_id"), "start", "stop", "depth"
    )
    return qn.select("doc_id", "element_id").join(elems, ["doc_id", "element_id"])


def element_texts(
    segments: DataFrame, source: DataFrame, text_col: str = "content"
) -> DataFrame:
    """(doc_id, element_id, text) — rendered text nodes per element
    (reference ``get_text_itos``)."""
    tx = segments.filter(F.col("desc") == "text").select(
        "doc_id", F.col("parent_id").alias("element_id"), "start", "stop"
    )
    tx = _with_text(tx, source, text_col)
    return tx.select(
        "doc_id",
        "element_id",
        seg_text(F.col("__content"), F.col("start"), F.col("stop")).alias("text"),
    )
