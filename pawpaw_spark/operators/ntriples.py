"""N-Triples serialization of KG edge tables — the W3C line-based RDF
interchange format (one `<s> <p> <o> .` statement per line), so the
materialized node/edge tables can be handed to any triple store or
RDF toolchain and re-ingested losslessly.

Reference parity note: the reference engine (rlayers/pawpaw) stops at
emitting segment trees; the (subj, pred, obj) vocabulary this engine
materializes (operators/triples.py) is the BASELINE.json north-star
surface, and N-Triples is its standard at-rest interchange form.

Everything here is pure column expressions (JVM-side, whole-stage
codegen, zero Python in the hot path):

* literal escaping is exactly the four characters the N-Triples
  STRING_LITERAL_QUOTE grammar forbids raw (backslash, quote, LF, CR),
  escaped canonically as ``\\\\ \\" \\n \\r`` — backslash FIRST, so the
  chain is exact;
* literal UNescaping uses the NUL-sentinel trick (``\\\\`` -> NUL,
  then the short escapes, then NUL -> ``\\``), which is
  order-correct for any input — naive reverse-order replaces corrupt
  ``\\\\n`` (an escaped backslash followed by ``n``); NUL cannot occur
  in an N-Triples line, so the sentinel is safe;
* IRIs are NOT percent-encoded: node/predicate ids must already match
  a safe charset and :func:`to_ntriples` RAISES at plan time on the
  first offender instead of silently emitting an invalid document
  (cross-engine exactness: Spark's and DuckDB's url encoders disagree
  on space/plus, so a validating fast path is the deterministic
  choice).

Scale shape: serialization is a projection (no shuffle — rides the
edge-table scan); parsing is a projection over a text scan. Both
partition-preserving, so a 100 TB edge table serializes at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# chars legal inside our IRI local names: the engine's node-id scheme
# (doc ids, "sym:" names, "doc#start-stop" spans) plus common id chars.
# Angle brackets, quotes, spaces, and control chars — everything the
# N-Triples IRIREF production forbids — are excluded.
_IRI_SAFE_RE = r"^[A-Za-z0-9_:.#/@%+\-]*$"

_NUL = "\x00"


def _escape_literal(c: Column) -> Column:
    # order matters only for the backslash, which must go first
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    return F.replace(c, F.lit("\r"), F.lit("\\r"))


def _unescape_literal(c: Column) -> Column:
    # NUL-sentinel: protect escaped backslashes before expanding the
    # short escapes, then restore — exact for any well-formed input
    c = F.replace(c, F.lit("\\\\"), F.lit(_NUL))
    c = F.replace(c, F.lit('\\"'), F.lit('"'))
    c = F.replace(c, F.lit("\\n"), F.lit("\n"))
    c = F.replace(c, F.lit("\\r"), F.lit("\r"))
    return F.replace(c, F.lit(_NUL), F.lit("\\"))


def _iri(base: str, local: Column) -> Column:
    return F.concat(F.lit("<" + base), local, F.lit(">"))


def _checked_iri(base: str, local: Column, what: str) -> Column:
    # raise_error inside a when(): evaluates JVM-side per row, so an
    # unsafe id fails the JOB with a clear message instead of emitting
    # an unparseable document. The regex guard is codegen'd; the error
    # branch is dead code for conforming tables.
    return F.when(
        local.rlike(_IRI_SAFE_RE), _iri(base, local)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"to_ntriples: {what} id contains characters outside the "
                    "IRI-safe charset: "
                ),
                local,
            )
        )
    )


def to_ntriples(
    edges: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    base: str = "pawpaw:",
    obj_literal: bool = False,
) -> DataFrame:
    """Serialize (subj, pred, obj) rows -> one-column ``line``
    DataFrame of N-Triples statements. ``obj_literal=True`` emits the
    object as an escaped string literal (e.g. document text payloads);
    otherwise all three terms are IRIs under ``base``. Null objects
    are rejected by the IRI/literal guard upstream of the writer.

    A projection — no shuffle, no Python; write with
    ``df.write.text(path)`` for the standard ``.nt`` layout."""
    s = _checked_iri(base, F.col(subj_col), "subject")
    p = _checked_iri(base, F.col(pred_col), "predicate")
    if obj_literal:
        o = F.concat(
            F.lit('"'), _escape_literal(F.col(obj_col)), F.lit('"')
        )
    else:
        o = _checked_iri(base, F.col(obj_col), "object")
    return edges.select(
        F.concat(s, F.lit(" "), p, F.lit(" "), o, F.lit(" .")).alias("line")
    )


# one regex, three alternatives for the object term: IRI, or quoted
# literal (escaped-pair-aware: ([^"\\]|\\.)* cannot stop inside an
# escape, so a literal ending in \\" parses correctly)
_LINE_RE = (
    r'^<([^>]*)> <([^>]*)> (?:<([^>]*)>|"((?:[^"\\]|\\.)*)") \.$'
)


def from_ntriples(
    lines: DataFrame,
    line_col: str = "line",
    base: str = "pawpaw:",
    strict: bool = True,
) -> DataFrame:
    """Parse N-Triples lines back to (subj, pred, obj, obj_is_literal)
    — the exact inverse of :func:`to_ntriples` for documents it emits
    (roundtrip is identity; property-tested). The ``base`` prefix is
    stripped from IRI terms so ids come back in table form.

    ``strict=True`` raises on the first malformed line (a corrupted
    interchange file must not silently drop rows); ``strict=False``
    filters them out instead, for scavenging partial dumps."""
    c = F.col(line_col)
    subj = F.regexp_extract(c, _LINE_RE, 1)
    pred = F.regexp_extract(c, _LINE_RE, 2)
    obj_iri = F.regexp_extract(c, _LINE_RE, 3)
    obj_lit = F.regexp_extract(c, _LINE_RE, 4)
    ok = c.rlike(_LINE_RE)
    if strict:
        guard = F.when(ok, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(F.lit("from_ntriples: malformed line: "), c)
            )
        )
        parsed = lines.filter(guard)
    else:
        parsed = lines.filter(ok)
    strip = lambda col: F.when(
        col.startswith(base), col.substr(F.lit(len(base) + 1), F.length(col))
    ).otherwise(col)
    # empty IRI group + empty literal group is ambiguous between <>
    # and "" — the grammar makes it an IRI only when the raw line has
    # an angle bracket at the object position
    is_literal = ~F.regexp_like(
        c, F.lit(r'^<[^>]*> <[^>]*> <')
    )
    return parsed.select(
        strip(subj).alias("subj"),
        strip(pred).alias("pred"),
        F.when(is_literal, _unescape_literal(obj_lit))
        .otherwise(strip(obj_iri))
        .alias("obj"),
        is_literal.alias("obj_is_literal"),
    )


# N-Quads (W3C RDF 1.1 N-Quads): the N-Triples line with an OPTIONAL
# graph-label IRI before the terminating dot — the named-graph
# interchange format. Same term grammar as _LINE_RE plus group 5.
_QUAD_RE = (
    r'^<([^>]*)> <([^>]*)> (?:<([^>]*)>|"((?:[^"\\]|\\.)*)")'
    r'(?: <([^>]*)>)? \.$'
)


def to_nquads(
    quads: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    graph_col: str = "graph",
    base: str = "pawpaw:",
    obj_literal: bool = False,
) -> DataFrame:
    """Serialize (subj, pred, obj, graph) rows -> one-column ``line``
    DataFrame of W3C N-Quads statements: the N-Triples statement plus
    the graph-label IRI. A NULL graph emits the triple form (N-Quads
    explicitly allows it — the row lives in the default graph), so one
    writer covers mixed default/named-graph tables. A projection — no
    shuffle, no Python; ``df.write.text(path)`` for ``.nq`` layout."""
    s = _checked_iri(base, F.col(subj_col), "subject")
    p = _checked_iri(base, F.col(pred_col), "predicate")
    if obj_literal:
        o = F.concat(
            F.lit('"'), _escape_literal(F.col(obj_col)), F.lit('"')
        )
    else:
        o = _checked_iri(base, F.col(obj_col), "object")
    g = F.when(
        F.col(graph_col).isNull(), F.lit("")
    ).otherwise(
        F.concat(F.lit(" "), _checked_iri(base, F.col(graph_col), "graph"))
    )
    return quads.select(
        F.concat(
            s, F.lit(" "), p, F.lit(" "), o, g, F.lit(" .")
        ).alias("line")
    )


def from_nquads(
    lines: DataFrame,
    line_col: str = "line",
    base: str = "pawpaw:",
    strict: bool = True,
) -> DataFrame:
    """Parse N-Quads lines -> (subj, pred, obj, graph, obj_is_literal)
    — the exact inverse of :func:`to_nquads` (roundtrip identity is
    property-tested); triple-form lines (no graph label) come back with
    a NULL graph, so ``.nt`` files parse too (N-Triples is a subset of
    N-Quads). ``strict`` as in :func:`from_ntriples`."""
    c = F.col(line_col)
    ok = c.rlike(_QUAD_RE)
    if strict:
        guard = F.when(ok, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(F.lit("from_nquads: malformed line: "), c)
            )
        )
        parsed = lines.filter(guard)
    else:
        parsed = lines.filter(ok)
    strip = lambda col: F.when(
        col.startswith(base), col.substr(F.lit(len(base) + 1), F.length(col))
    ).otherwise(col)
    subj = F.regexp_extract(c, _QUAD_RE, 1)
    pred = F.regexp_extract(c, _QUAD_RE, 2)
    obj_iri = F.regexp_extract(c, _QUAD_RE, 3)
    obj_lit = F.regexp_extract(c, _QUAD_RE, 4)
    graph = F.regexp_extract(c, _QUAD_RE, 5)
    # object-position angle bracket disambiguates <> from "" (the
    # from_ntriples doctrine); the graph group is unambiguous (IRI or
    # absent), and regexp_extract returns '' for absent — mapped to
    # NULL via the raw line's term count.
    is_literal = ~F.regexp_like(c, F.lit(r'^<[^>]*> <[^>]*> <'))
    # anchored FULL match with the graph term REQUIRED: backtracking
    # cannot steal a graph out of a literal ("x <g>" has one closing
    # quote), and a 3-term line simply fails -> NULL graph
    has_graph = c.rlike(
        r'^<[^>]*> <[^>]*> (?:<[^>]*>|"(?:[^"\\]|\\.)*") <[^>]*> \.$'
    )
    return parsed.select(
        strip(subj).alias("subj"),
        strip(pred).alias("pred"),
        F.when(is_literal, _unescape_literal(obj_lit))
        .otherwise(strip(obj_iri))
        .alias("obj"),
        F.when(has_graph, strip(graph)).otherwise(F.lit(None)).alias(
            "graph"
        ),
        is_literal.alias("obj_is_literal"),
    )
