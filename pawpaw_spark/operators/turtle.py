"""Turtle (W3C Terse RDF Triple Language) serialization of KG edge
tables — the human-oriented sibling of :mod:`ntriples`: one statement
line PER SUBJECT with a ``;``-separated predicate-object list, prefix
compression (``pw:DEFINES`` instead of ``<pawpaw:DEFINES>``), the
``a`` keyword for rdf:type, and ``@prefix`` headers.

Canonical-layout pin (the sparql.py discipline): the parser accepts
the layout the serializer emits — one ``@prefix`` declaration per
line, one complete subject statement per line, single-space token
separation.  That keeps parsing a PER-LINE column expression (a text
scan + regex, partition-preserving, no cross-row state), which is the
only Turtle shape that distributes: general Turtle allows statements
to span lines, which would serialize the whole parse.

Term forms (self-consistent, lossless for this engine's id scheme):

* ids that match the conservative PN_LOCAL subset
  ``[A-Za-z][A-Za-z0-9_-]*`` render as prefixed names under the one
  declared prefix; every other id (``sym:f_3``, ``doc/7@0`` — colons,
  slashes, ``@``) falls back to a full ``<base+id>`` IRI, validated
  against the same IRI-safe charset :mod:`ntriples` enforces (raise,
  never emit an unparseable document);
* literal objects reuse the N-Triples STRING_LITERAL_QUOTE escaping
  (backslash first, NUL-sentinel unescape — see ntriples.py for the
  order-correctness argument).

Scale shape: serialization is one groupBy(subject) — the single
shuffle a grouped format fundamentally needs — with a SORTED
predicate-object list so output is deterministic at any partitioning;
parsing is a projection + one explode.  The ``@prefix`` header is the
only driver-side data and is metadata-sized by construction.

Reference parity: none — interchange surface beyond the reference,
the human-readable sibling of the ntriples/codec sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pawpaw_spark.operators.ntriples import (
    _IRI_SAFE_RE,
    _escape_literal,
    _unescape_literal,
)

_PN_SAFE_RE = r"^[A-Za-z][A-Za-z0-9_\-]*$"
_PN = r"[A-Za-z][A-Za-z0-9_\-]*"
_T_IRI = r"<[^>]*>"
_T_LIT = r'"(?:[^"\\]|\\.)*"'
_T_PNAME = rf"{_PN}:{_PN}"
_T_PRED = rf"(?:{_T_IRI}|{_T_PNAME}|a)"
_T_OBJ = rf"(?:{_T_IRI}|{_T_PNAME}|{_T_LIT})"
_T_SUBJ = rf"(?:{_T_IRI}|{_T_PNAME})"
_STMT_RE = rf"^{_T_SUBJ} {_T_PRED} {_T_OBJ}(?: ; {_T_PRED} {_T_OBJ})* \.$"
_PREFIX_RE = rf"^@prefix ({_PN}): <([^>]*)> \.$"
# extraction alternation: IRI and literal are self-delimiting and
# consume greedily from their opening char; prefixed names can't match
# inside either (the statement regex above already pinned the shape);
# the bare `a` keyword only ever sits between single spaces
_T_ALL = rf"{_T_IRI}|{_T_LIT}|{_T_PNAME}|(?<= )a(?= )"


def _term(
    ident: Column, base: str, prefix: str, what: str
) -> Column:
    """Prefixed name when the id is PN-safe, else a validated full
    IRI (raise on ids outside the ntriples IRI-safe charset)."""
    return (
        F.when(ident.rlike(_PN_SAFE_RE), F.concat(F.lit(prefix + ":"), ident))
        .when(ident.rlike(_IRI_SAFE_RE), F.concat(F.lit("<" + base), ident, F.lit(">")))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"to_turtle: {what} id contains characters outside "
                        "the IRI-safe charset: "
                    ),
                    ident,
                )
            )
        )
    )


def to_turtle(
    edges: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    literal_col: str | None = None,
    base: str = "pawpaw:",
    prefix: str = "pw",
    type_pred: str | None = "type",
) -> DataFrame:
    """Serialize (subj, pred, obj) rows -> one-column ``line``
    DataFrame: the ``@prefix`` header plus ONE statement per subject
    with its predicate-object pairs sorted and ``;``-joined.
    ``literal_col`` names an optional boolean column marking rows
    whose object is a string literal (escaped) rather than an id;
    ``type_pred`` renders as the ``a`` keyword. Deterministic at any
    partitioning (pairs sort on their rendered form)."""
    p_term = _term(F.col(pred_col), base, prefix, "predicate")
    if type_pred is not None:
        p_term = F.when(
            F.col(pred_col) == type_pred, F.lit("a")
        ).otherwise(p_term)
    if literal_col is not None:
        o_term = F.when(
            F.col(literal_col),
            F.concat(F.lit('"'), _escape_literal(F.col(obj_col)), F.lit('"')),
        ).otherwise(_term(F.col(obj_col), base, prefix, "object"))
    else:
        o_term = _term(F.col(obj_col), base, prefix, "object")
    pairs = edges.select(
        _term(F.col(subj_col), base, prefix, "subject").alias("s"),
        F.concat(p_term, F.lit(" "), o_term).alias("po"),
    )
    stmts = pairs.groupBy("s").agg(
        F.array_join(F.sort_array(F.collect_list("po")), " ; ").alias("body")
    )
    header = edges.sparkSession.createDataFrame(
        [(f"@prefix {prefix}: <{base}> .",)], "line string"
    )
    return header.union(
        stmts.select(
            F.concat(F.col("s"), F.lit(" "), F.col("body"), F.lit(" .")).alias(
                "line"
            )
        )
    )


def from_turtle(
    lines: DataFrame,
    line_col: str = "line",
    type_pred: str = "type",
    strict: bool = True,
) -> DataFrame:
    """Parse canonical-layout Turtle back to (subj, pred, obj,
    obj_is_literal) — the exact inverse of :func:`to_turtle` for
    documents it emits (roundtrip identity, property-tested).
    ``@prefix`` namespaces whose IRI is a declared base are stripped
    from decoded terms, so ids come back in table form.  ``strict``
    raises on the first malformed statement line; otherwise malformed
    lines are dropped (scavenging mode)."""
    c = F.col(line_col)
    hdr = (
        lines.filter(c.rlike(_PREFIX_RE))
        .select(
            F.regexp_extract(c, _PREFIX_RE, 1).alias("p"),
            F.regexp_extract(c, _PREFIX_RE, 2).alias("iri"),
        )
        .collect()  # @prefix header: metadata-sized by construction
    )
    pmap = {r.p: r.iri for r in hdr}
    body = lines.filter(~c.rlike(_PREFIX_RE) & (F.trim(c) != ""))
    ok = c.rlike(_STMT_RE)
    if strict:
        body = body.filter(
            F.when(ok, F.lit(True)).otherwise(
                F.raise_error(
                    F.concat(F.lit("from_turtle: malformed statement: "), c)
                )
            )
        )
    else:
        body = body.filter(ok)
    terms = F.regexp_extract_all(c, F.lit(_T_ALL), 0)
    npairs = (F.size(terms) - 1) / 2
    parsed = body.select(
        F.element_at(terms, 1).alias("s_raw"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), npairs.cast("int") - 1),
                lambda i: F.struct(
                    F.element_at(terms, i * 2 + 2).alias("p_raw"),
                    F.element_at(terms, i * 2 + 3).alias("o_raw"),
                ),
            )
        ).alias("po"),
    ).select("s_raw", "po.p_raw", "po.o_raw")

    if pmap:
        kv = []
        for k, v in sorted(pmap.items()):
            kv += [F.lit(k), F.lit(v)]
        prefix_map = F.create_map(*kv)
    else:
        prefix_map = F.create_map()

    def decode_id(raw: Column, what: str) -> Column:
        # full IRI: strip angle brackets and any declared namespace
        iri_body = raw.substr(F.lit(2), F.length(raw) - 2)
        # prefixed name: expand through the header map (unknown prefix
        # is a document error — raise even in non-strict mode, the
        # statement grammar already matched so the line isn't junk)
        pfx = F.substring_index(raw, ":", 1)
        local = F.expr(
            f"substring({what}, instr({what}, ':') + 1, length({what}))"
        )
        expansion = F.element_at(prefix_map, pfx)
        expanded = F.when(
            expansion.isNotNull(), F.concat(expansion, local)
        ).otherwise(
            F.raise_error(
                F.concat(F.lit("from_turtle: undeclared prefix: "), pfx)
            )
        )
        full = F.when(raw.startswith("<"), iri_body).otherwise(expanded)
        # strip every declared namespace back off (longest first so a
        # nested namespace can't shadow a longer match)
        out = full
        for ns in sorted(set(pmap.values()), key=len, reverse=True):
            out = F.when(
                out.startswith(ns),
                out.substr(F.lit(len(ns) + 1), F.length(out)),
            ).otherwise(out)
        return out

    is_lit = F.col("o_raw").startswith('"')
    obj = F.when(
        is_lit,
        _unescape_literal(
            F.col("o_raw").substr(F.lit(2), F.length("o_raw") - 2)
        ),
    ).otherwise(decode_id(F.col("o_raw"), "o_raw"))
    pred = F.when(F.col("p_raw") == "a", F.lit(type_pred)).otherwise(
        decode_id(F.col("p_raw"), "p_raw")
    )
    return parsed.select(
        decode_id(F.col("s_raw"), "s_raw").alias("subj"),
        pred.alias("pred"),
        obj.alias("obj"),
        is_lit.alias("obj_is_literal"),
    )
