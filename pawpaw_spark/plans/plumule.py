"""plumule — the tree query language, compiled to DataFrame plans.

Grammar (reference spec ``pawpaw/query/_query.py``; docs
``docs/5. Traversal & Query.md``)::

    query  := phrase ('/' phrase)*            # '/' unescaped, outside {}
    phrase := [order] axis [or_self] [filter-expr] [subquery-expr]
    axis   := '....'|'...'|'..'|'.'|'><'|'*'|'**'|'***'|'<<<'|'<<'|'<'|'>'|'>>'|'>>>'
    order  := '+' | '-'        or_self := '!' | '!!'
    filter := '[' ['~'] key ':' comma-values ']'  combined with ~ & ^ | ( )
    subquery := '{' query '}'  (existential; combined like filters)

The reference executes this as lazy generator chains per node
(``_query.py:677-686``). Here each phrase compiles to DataFrame
operations over the segments table: axes become equi-joins on
precomputed navigation columns (parent_id / path / sibling_idx /
dfs_idx — built in-UDF at segmentation time, so NO recursive or theta
joins are ever needed), filters become boolean column expressions, and
subqueries become correlated left-join flags (semi-join shape).
Catalyst then optimizes the whole chain; the per-doc partitioning makes
every join co-partitioned at scale.

Known deliberate deviation: the reference's ``<<<``/``>>>`` axes leak
their validation loop variable and consequently evaluate only for the
LAST node of the input stream (``_query.py:192-208, 254-266``; upstream
tests only query them from single nodes, so the quirk is unpinned).
This engine applies them per input node, like every other axis.

Stream model: one DataFrame with columns
  (doc_id, origin, ord, e_idx, <segment attrs>)
`origin` = subquery origin node (-1 at top level), `ord` = the stream
position (pawpaw's implicit generator order), `e_idx` = the per-axis
enumeration the ``[i:...]`` filter sees (``Types.C_EITO`` index,
``ito.py:1632-1636`` / ``to_ecs`` ``_query.py:106-140``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import regex as _regex
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

MUST_ESCAPE_CHARS = ("\\", "[", "]", "/", ",", "{", "}")

FILTER_KEY_ALIASES = {
    "desc": {"desc", "d"},
    "str": {"string", "s"},
    "str-casefold": {"str-casefold", "scf", "lcs"},
    "str-casefold-ew": {"str-casefold-ew", "scfew", "lcsew"},
    "str-casefold-sw": {"str-casefold-sw", "scfsw", "lcssw"},
    "str-ew": {"str-ew", "sew"},
    "str-sw": {"str-sw", "ssw"},
    "index": {"index", "i"},
    "predicate": {"predicate", "p"},
    "value": {"value", "v"},
}
_CANON_KEY = {a: k for k, aliases in FILTER_KEY_ALIASES.items() for a in aliases}

_AXIS_RE = _regex.compile(
    r"(?P<order>[\+\-]?)(?P<key>\.{1,4}|\*{1,3}|\>\<|\<{1,3}|\>{1,3})(?P<or_self>(?:\!{1,2})?)",
    _regex.DOTALL,
)
_FILTER_RE = _regex.compile(r"\[(?P<not>\~)?(?P<k>[a-z\-]+):\s*(?P<v>.+?)\]", _regex.DOTALL)


def escape(value: str) -> str:
    rv = value.replace("\\", "\\\\")
    for c in MUST_ESCAPE_CHARS:
        if c != "\\":
            rv = rv.replace(c, f"\\{c}")
    return rv


def descape(value: str) -> str:
    rv, esc = "", False
    for c in value:
        if esc or c != "\\":
            rv += c
            esc = False
        else:
            esc = True
    if esc:
        raise ValueError("dangling escape")
    return rv


def split_unescaped(s: str, sep: str) -> list[str]:
    out, cur, esc = [], "", False
    for c in s:
        if esc:
            cur += "\\" + c
            esc = False
        elif c == "\\":
            esc = True
        elif c == sep:
            out.append(cur)
            cur = ""
        else:
            cur += c
    out.append(cur)
    return out


def _split_phrases(path: str) -> list[str]:
    out, cur, esc, depth = [], "", False, 0
    for c in path:
        if esc:
            cur += "\\" + c
            esc = False
        elif c == "\\":
            esc = True
        elif c == "{":
            depth += 1
            cur += c
        elif c == "}":
            depth -= 1
            cur += c
        elif c == "/" and depth == 0:
            out.append(cur)
            cur = ""
        else:
            cur += c
    if esc:
        raise ValueError(f"dangling escape in {path!r}")
    out.append(cur)
    return out


def _find_balanced(s: str, open_c: str, close_c: str) -> list[tuple[int, int]]:
    """Spans of top-level balanced open..close chunks, escape-aware."""
    spans, esc, depth, start = [], False, 0, -1
    for i, c in enumerate(s):
        if esc:
            esc = False
        elif c == "\\":
            esc = True
        elif c == open_c:
            if depth == 0:
                start = i
            depth += 1
        elif c == close_c:
            depth -= 1
            if depth == 0:
                spans.append((start, i + 1))
            if depth < 0:
                raise ValueError(f"unbalanced {close_c!r} in {s!r}")
    if depth != 0:
        raise ValueError(f"unbalanced {open_c!r} in {s!r}")
    return spans


# --- boolean expression AST ---------------------------------------------------


@dataclass
class FilterLeaf:
    negate: bool
    key: str            # canonical
    raw_value: str


@dataclass
class SubqueryLeaf:
    query: "ParsedQuery"


@dataclass
class BoolOp:
    op: str             # '&' '^' '|'
    left: object
    right: object


@dataclass
class NotOp:
    operand: object


@dataclass
class ParsedPhrase:
    axis: str
    order: str | None
    or_self: str | None
    expr: object | None  # AST or None (tautology)


@dataclass
class ParsedQuery:
    phrases: list[ParsedPhrase] = field(default_factory=list)


def _fold_expression(leaves: list[object], operands: list[str], src: str) -> object:
    """Fold leaves + interleaved operand strings (the reference's
    EcfCombined algorithm ``_query.py:299-376``): parentheses first,
    per-leaf '~' prefixes, then diadic ops by precedence & ^ |."""
    for op in operands:
        for c in op:
            if c not in "~&^|() ":
                raise ValueError(f"invalid operand char {c!r} in {src!r}")
    if sum(op.count("(") for op in operands) != sum(op.count(")") for op in operands):
        raise ValueError(f"unbalanced parentheses in {src!r}")

    leaves = list(leaves)
    operands = list(operands)
    while True:
        open_i = next(
            (i for i in range(len(operands) - 1, -1, -1) if "(" in operands[i]), None
        )
        if open_i is None:
            break
        pre, _, inner_open = operands[open_i].rpartition("(")
        operands[open_i] = pre
        if ")" in inner_open:
            raise ValueError(f"empty parentheses in {src!r}")
        close_i = next(
            (i for i in range(open_i + 1, len(operands)) if ")" in operands[i]), None
        )
        if close_i is None:
            raise ValueError(f"unbalanced parentheses in {src!r}")
        inner_close, _, post = operands[close_i].partition(")")
        operands[close_i] = post
        if close_i - open_i == 1:
            operands[open_i] = pre + inner_open + inner_close
        else:
            sub = _fold_expression(
                leaves[open_i:close_i],
                [inner_open, *operands[open_i + 1 : close_i], inner_close],
                src,
            )
            leaves[open_i:close_i] = [sub]
            del operands[open_i + 1 : close_i]

    # per-leaf '~' prefix: odd count of ~ in the operand before leaf i
    vals = []
    for i, leaf in enumerate(leaves):
        if operands[i].count("~") % 2 == 1:
            vals.append(NotOp(leaf))
        else:
            vals.append(leaf)
    ops = operands[1:-1]
    for sym in ("&", "^", "|"):
        # repeatedly combine at the reference's precedence order
        while len(vals) > 1:
            i = next((i for i, op in enumerate(ops) if sym in op), None)
            if i is None:
                break
            vals[i : i + 2] = [BoolOp(sym, vals[i], vals[i + 1])]
            del ops[i]
    if len(vals) != 1:
        raise ValueError(f"could not fold expression in {src!r}")
    return vals[0]


def _parse_phrase(phrase: str) -> ParsedPhrase:
    m = _AXIS_RE.match(phrase)
    if m is None:
        raise ValueError(f"invalid phrase {phrase!r}")
    axis = m.group("key")
    order = m.group("order") or None
    or_self = m.group("or_self") or None
    rest = phrase[m.end() :]

    # locate first unescaped '{' then back over operator chars (the
    # reference's Phrase.__init__ trick so '~{...}' binds to the subquery)
    brace_spans = _find_balanced(rest, "{", "}")
    if brace_spans:
        cut = brace_spans[0][0]
        while cut > 0 and rest[cut - 1] in "~&^|() ":
            cut -= 1
        filt_src, subq_src = rest[:cut].strip(), rest[cut:].strip()
    else:
        filt_src, subq_src = rest.strip(), ""

    exprs = []
    if filt_src:
        spans = _find_balanced(filt_src, "[", "]")
        if not spans:
            raise ValueError(f"invalid filter segment {filt_src!r}")
        leaves, operands, last_end = [], [], 0
        for a, b in spans:
            operands.append(filt_src[last_end:a].strip())
            fm = _FILTER_RE.fullmatch(filt_src[a:b])
            if fm is None:
                raise ValueError(f"invalid filter {filt_src[a:b]!r}")
            key = _CANON_KEY.get(fm.group("k"))
            if key is None:
                raise ValueError(f"unknown filter key {fm.group('k')!r}")
            leaves.append(FilterLeaf(fm.group("not") == "~", key, fm.group("v")))
            last_end = b
        operands.append(filt_src[last_end:].strip())
        exprs.append(_fold_expression(leaves, operands, filt_src))

    if subq_src:
        spans = _find_balanced(subq_src, "{", "}")
        if not spans:
            raise ValueError(f"invalid subquery segment {subq_src!r}")
        leaves, operands, last_end = [], [], 0
        for a, b in spans:
            operands.append(subq_src[last_end:a].strip())
            leaves.append(SubqueryLeaf(parse_query(subq_src[a + 1 : b - 1])))
            last_end = b
        operands.append(subq_src[last_end:].strip())
        exprs.append(_fold_expression(leaves, operands, subq_src))

    if not exprs:
        expr = None
    elif len(exprs) == 1:
        expr = exprs[0]
    else:
        expr = BoolOp("&", exprs[0], exprs[1])
    return ParsedPhrase(axis, order, or_self, expr)


def parse_query(path: str) -> ParsedQuery:
    if not path or not path.strip():
        raise ValueError("empty query path")
    return ParsedQuery([_parse_phrase(p) for p in _split_phrases(path)])


# ---------------------------------------------------------------------------
# compilation to DataFrame plans
# ---------------------------------------------------------------------------

_ATTRS = [
    "seg_id", "parent_id", "start", "stop", "desc", "depth", "value",
    "path", "n_children", "sibling_idx", "dfs_idx",
]


class PlumuleEngine:
    """Compile + run plumule queries over a segments table.

    ``segments`` must include the root rows (``include_root=True`` at
    segmentation time). ``source`` (doc_id, content) is joined lazily
    and ONLY when a query needs segment text (str/value filters) —
    zero-copy otherwise.
    """

    def __init__(
        self,
        segments: DataFrame,
        source: DataFrame | None = None,
        values: dict[str, object] | None = None,
        predicates: dict[str, object] | None = None,
    ):
        self.segments = segments
        self.source = source
        self.values = values or {}
        self.predicates = predicates or {}
        self._text_joined_cache: DataFrame | None = None

    # -- public API ------------------------------------------------------

    def find_all(self, path: str, start: DataFrame | None = None) -> DataFrame:
        """All matches. Returns segment rows + (origin-less) ``ord`` —
        the stream order within each doc (reference yields lazily in
        this order, ``_query.py:677-686``)."""
        query = parse_query(path)
        stream = self._initial_stream(start)
        out = self._run(query, stream, initial=start is None)
        return out.select("doc_id", "ord", *_ATTRS)

    def find(self, path: str, start: DataFrame | None = None) -> DataFrame:
        """First match per doc (reference ``find`` = next(find_all))."""
        out = self.find_all(path, start)
        w = W.partitionBy("doc_id").orderBy("ord")
        return out.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")

    # -- internals ---------------------------------------------------------

    def _initial_stream(self, start: DataFrame | None) -> DataFrame:
        base = start if start is not None else self.segments.filter(F.col("parent_id").isNull())
        w = W.partitionBy("doc_id", "origin").orderBy("seg_id")
        return (
            base.select("doc_id", *_ATTRS)
            .withColumn("origin", F.lit(-1).cast("long"))
            .withColumn("ord", F.row_number().over(w).cast("long"))
        )

    def _with_text(self) -> DataFrame:
        if self.source is None:
            raise ValueError("query needs segment text but no source table was provided")
        if self._text_joined_cache is None:
            src = self.source.select(
                F.col("doc_id").alias("__t_doc"), F.col("content").alias("__content")
            )
            self._text_joined_cache = src
        return self._text_joined_cache

    def _run(self, query: ParsedQuery, stream: DataFrame, initial: bool = False) -> DataFrame:
        for i, phrase in enumerate(query.phrases):
            stream = self._apply_phrase(phrase, stream, initial=initial and i == 0)
        return stream

    # axis application: returns enumerated stream with fresh ord + e_idx
    def _apply_phrase(
        self, phrase: ParsedPhrase, stream: DataFrame, initial: bool = False
    ) -> DataFrame:
        axis, reverse = phrase.axis, phrase.order == "-"
        g = self.segments.select(
            F.col("doc_id").alias("g_doc"), *[F.col(c).alias(f"g_{c}") for c in _ATTRS]
        )
        s = stream.select(
            "doc_id", "origin", F.col("ord").alias("src_ord"), *_ATTRS
        )

        per_stream_enum = axis in (".", "><")  # to_ecs over whole stream

        # Fast path: '**'/'***' applied to the untouched initial root
        # stream = every non-root (resp. leaf) segment — a full-table
        # FILTER instead of a path-explode join (the most common query
        # shape; one shuffle saved)
        if initial and axis in ("**", "***") and not phrase.or_self:
            fast = self.segments.filter(F.col("parent_id").isNotNull())
            if axis == "***":
                fast = fast.filter(F.col("n_children") == 0)
            axed = (
                fast.select("doc_id", *[F.col(c).alias(f"g_{c}") for c in _ATTRS])
                .withColumn("origin", F.lit(-1).cast("long"))
                .withColumn("src_ord", F.lit(1).cast("long"))
                .withColumn(
                    "__ok", (F.col("g_dfs_idx") * F.lit(-1 if reverse else 1)).cast("long")
                )
            )
            w_enum = W.partitionBy("doc_id", "origin", "src_ord").orderBy("__ok")
            axed = axed.withColumn("e_idx", F.row_number().over(w_enum).cast("long") - 1)
            if phrase.expr is not None:
                axed = self._apply_expr(phrase.expr, axed)
            w_ord = W.partitionBy("doc_id", "origin").orderBy("src_ord", "e_idx")
            out = axed.select(
                "doc_id", "origin",
                *[F.col(f"g_{c}").alias(c) for c in _ATTRS],
                "e_idx", "src_ord",
            ).withColumn("ord", F.row_number().over(w_ord).cast("long"))
            return out.drop("src_ord", "e_idx")

        if axis == ".":
            axed = s.select(
                "doc_id", "origin", "src_ord",
                *[F.col(c).alias(f"g_{c}") for c in _ATTRS],
                F.col("dfs_idx").alias("__ok"),
            )
            # '.' enumerates the incoming stream in its own order
            axed = axed.withColumn("__ok", F.col("src_ord"))
        elif axis == "><":
            w_first = W.partitionBy("doc_id", "origin", "seg_id").orderBy("src_ord")
            deduped = (
                s.withColumn("__rn", F.row_number().over(w_first))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            axed = deduped.select(
                "doc_id", "origin", "src_ord",
                *[F.col(c).alias(f"g_{c}") for c in _ATTRS],
                (F.col("src_ord") * F.lit(-1 if reverse else 1)).alias("__ok"),
            )
        else:
            joined = self._axis_join(axis, s, g)
            order_col = self._axis_order(axis, reverse)
            axed = joined.select(
                "doc_id", "origin", "src_ord",
                *[f"g_{c}" for c in _ATTRS],
                order_col.alias("__ok"),
            )

        # enumeration (e_idx) — per source node, or per stream for . / ><
        part = ["doc_id", "origin"] if per_stream_enum else ["doc_id", "origin", "src_ord"]
        w_enum = W.partitionBy(*part).orderBy("__ok")
        axed = axed.withColumn("e_idx", F.row_number().over(w_enum).cast("long") - 1)

        # or_self injection (to_ecs, _query.py:106-140)
        if phrase.or_self and axis not in (".", "><"):
            axed = self._inject_or_self(phrase, s, axed, reverse)

        # filters + subqueries
        if phrase.expr is not None:
            axed = self._apply_expr(phrase.expr, axed)

        # fresh stream order: previous order then enumeration for per-node
        # axes; enumeration alone for whole-stream axes ('.'/'><', where
        # e_idx already encodes the — possibly reversed — stream order)
        if per_stream_enum:
            w_ord = W.partitionBy("doc_id", "origin").orderBy("e_idx")
        else:
            w_ord = W.partitionBy("doc_id", "origin").orderBy("src_ord", "e_idx")
        out = axed.select(
            "doc_id", "origin",
            *[F.col(f"g_{c}").alias(c) for c in _ATTRS],
            "e_idx", "src_ord",
        ).withColumn("ord", F.row_number().over(w_ord).cast("long"))
        return out.drop("src_ord", "e_idx")

    def _axis_join(self, axis: str, s: DataFrame, g: DataFrame) -> DataFrame:
        doc = s["doc_id"] == g["g_doc"]
        if axis == "..":
            cond = doc & (g["g_seg_id"] == s["parent_id"])
        elif axis == "....":
            cond = doc & s["parent_id"].isNotNull() & (g["g_seg_id"] == F.element_at(s["path"], 1))
        elif axis == "...":
            anc = s.select(
                "doc_id", "origin", "src_ord", "seg_id",
                F.posexplode("path").alias("__pos", "__anc"),
            )
            j = anc.join(g, (anc["doc_id"] == g["g_doc"]) & (g["g_seg_id"] == anc["__anc"]))
            return j
        elif axis == "*":
            cond = doc & (g["g_parent_id"] == s["seg_id"])
        elif axis in ("**", "***"):
            cond = doc & F.array_contains(g["g_path"], s["seg_id"])
            if axis == "***":
                cond = cond & (g["g_n_children"] == 0)
        elif axis == "<<<":
            cond = (
                doc
                & (g["g_dfs_idx"] < s["dfs_idx"])
                & ~F.array_contains(s["path"], g["g_seg_id"])
            )
        elif axis == ">>>":
            cond = doc & (g["g_start"] >= s["stop"])
        elif axis == "<<":
            cond = doc & (g["g_parent_id"] == s["parent_id"]) & (g["g_sibling_idx"] < s["sibling_idx"])
        elif axis == ">>":
            cond = doc & (g["g_parent_id"] == s["parent_id"]) & (g["g_sibling_idx"] > s["sibling_idx"])
        elif axis == "<":
            cond = doc & (g["g_parent_id"] == s["parent_id"]) & (g["g_sibling_idx"] == s["sibling_idx"] - 1)
        elif axis == ">":
            cond = doc & (g["g_parent_id"] == s["parent_id"]) & (g["g_sibling_idx"] == s["sibling_idx"] + 1)
        else:
            raise ValueError(f"invalid axis {axis!r}")
        return s.join(g, cond)

    def _axis_order(self, axis: str, reverse: bool) -> Column:
        sign = -1 if reverse else 1
        if axis == "...":
            # path is root→parent; default order is parent→root (nearest first)
            return (F.col("__pos") * F.lit(-1 * sign)).cast("long")
        if axis in ("..", "...."):
            return F.lit(0).cast("long")
        if axis in ("*", "<", ">"):
            return (F.col("g_sibling_idx") * sign).cast("long")
        if axis in ("**", "***", ">>>"):
            return (F.col("g_dfs_idx") * sign).cast("long")
        if axis == "<<<":
            # default: nearest first == descending dfs
            return (F.col("g_dfs_idx") * -sign).cast("long")
        if axis == "<<":
            # default: reversed slice (nearest sibling first)
            return (F.col("g_sibling_idx") * -sign).cast("long")
        if axis == ">>":
            return (F.col("g_sibling_idx") * sign).cast("long")
        raise ValueError(axis)

    def _inject_or_self(
        self, phrase: ParsedPhrase, s: DataFrame, axed: DataFrame, reverse: bool
    ) -> DataFrame:
        """'!' = self when axis empty (e=0); '!!' = self always — at the
        front (others shift +1) or at the end when reversed."""
        counts = axed.groupBy("doc_id", "origin", "src_ord").agg(
            F.count(F.lit(1)).alias("__n")
        )
        selfs = (
            s.join(counts, ["doc_id", "origin", "src_ord"], "left")
            .withColumn("__n", F.coalesce(F.col("__n"), F.lit(0)))
        )
        if phrase.or_self == "!":
            selfs = selfs.filter(F.col("__n") == 0).withColumn("e_idx", F.lit(0).cast("long"))
        else:  # '!!'
            selfs = selfs.withColumn(
                "e_idx",
                F.when(F.col("__n") == 0, F.lit(0))
                .when(F.lit(reverse), F.col("__n"))
                .otherwise(F.lit(0))
                .cast("long"),
            )
            if not reverse:
                axed = axed.withColumn(
                    "e_idx", F.col("e_idx") + F.lit(1)
                )
        self_rows = selfs.select(
            "doc_id", "origin", "src_ord",
            *[F.col(c).alias(f"g_{c}") for c in _ATTRS],
            F.lit(None).cast("long").alias("__ok"),
            "e_idx",
        )
        return axed.unionByName(self_rows.drop("__ok"), allowMissingColumns=True)

    # -- boolean expression compilation -----------------------------------

    def _apply_expr(self, expr, axed: DataFrame) -> DataFrame:
        axed, col = self._compile_expr(expr, axed)
        return axed.filter(col)

    def _compile_expr(self, expr, axed: DataFrame) -> tuple[DataFrame, Column]:
        if isinstance(expr, NotOp):
            axed, c = self._compile_expr(expr.operand, axed)
            return axed, ~c
        if isinstance(expr, BoolOp):
            axed, left = self._compile_expr(expr.left, axed)
            axed, right = self._compile_expr(expr.right, axed)
            if expr.op == "&":
                return axed, left & right
            if expr.op == "|":
                return axed, left | right
            return axed, left != right  # xor on non-null booleans
        if isinstance(expr, FilterLeaf):
            return self._compile_filter(expr, axed)
        if isinstance(expr, SubqueryLeaf):
            return self._compile_subquery(expr, axed)
        raise TypeError(type(expr))

    def _ensure_text(self, axed: DataFrame) -> tuple[DataFrame, Column]:
        if "__text" in axed.columns:
            return axed, F.col("__text")
        src = self._with_text()
        axed = axed.join(src, axed["doc_id"] == src["__t_doc"], "left").drop("__t_doc")
        axed = axed.withColumn(
            "__text",
            F.expr("substring(__content, g_start + 1, g_stop - g_start)"),
        ).drop("__content")
        return axed, F.col("__text")

    def _compile_filter(self, leaf: FilterLeaf, axed: DataFrame) -> tuple[DataFrame, Column]:
        key, raw = leaf.key, leaf.raw_value
        vals = [descape(s) for s in split_unescaped(raw, ",")]
        if key == "desc":
            col = F.coalesce(F.col("g_desc").isin(vals), F.lit(False))
        elif key == "index":
            col = self._index_filter(raw)
        elif key in ("str", "str-casefold", "str-ew", "str-sw", "str-casefold-ew", "str-casefold-sw"):
            axed, text = self._ensure_text(axed)
            if "casefold" in key:
                text = F.lower(text)
                vals = [v.casefold() for v in vals]
            if key.endswith("-ew"):
                col = F.lit(False)
                for v in vals:
                    col = col | text.endswith(v)
            elif key.endswith("-sw"):
                col = F.lit(False)
                for v in vals:
                    col = col | text.startswith(v)
            else:
                col = text.isin(vals)
            col = F.coalesce(col, F.lit(False))
        elif key == "value":
            axed, text = self._ensure_text(axed)
            if not self.values:
                raise ValueError("value filter used but no values dict supplied")
            wanted = [str(self.values[k]) for k in vals if k in self.values]
            col = F.coalesce(F.coalesce(F.col("g_value"), text).isin(wanted), F.lit(False))
        elif key == "predicate":
            if not self.predicates:
                raise ValueError("predicate filter used but no predicates dict supplied")
            col = F.lit(True)
            first = True
            for k in vals:
                p = self.predicates[k]
                pc = p(axed)
                col = pc if first else (col & pc)
                first = False
        else:
            raise ValueError(f"unknown filter key {key!r}")
        if leaf.negate:
            col = ~col
        return axed, col

    def _index_filter(self, raw: str) -> Column:
        ranges: list[tuple[int, float]] = []
        for chunk in raw.split(","):
            parts = chunk.split("-")
            if len(parts) > 2:
                raise ValueError(f"invalid index filter {chunk!r}")
            lo = int(parts[0])
            if len(parts) == 2:
                hi = float("inf") if parts[1].strip() == "" else int(parts[1])
            else:
                hi = lo + 1
            ranges.append((lo, hi))
        col = F.lit(False)
        for lo, hi in ranges:
            c = F.col("e_idx") >= F.lit(lo)
            if hi != float("inf"):
                c = c & (F.col("e_idx") < F.lit(int(hi)))
            col = col | c
        return col

    def _compile_subquery(self, leaf: SubqueryLeaf, axed: DataFrame) -> tuple[DataFrame, Column]:
        flag = f"__sq_{id(leaf)}"
        if flag in axed.columns:
            return axed, F.col(flag)
        cand = axed.select(
            "doc_id", *[F.col(f"g_{c}").alias(c) for c in _ATTRS]
        ).dropDuplicates(["doc_id", "seg_id"])
        w = W.partitionBy("doc_id", "origin").orderBy("seg_id")
        sub_stream = (
            cand.withColumn("origin", F.col("seg_id"))
            .withColumn("ord", F.row_number().over(w).cast("long"))
        )
        matched = (
            self._run(leaf.query, sub_stream)
            .select(F.col("doc_id").alias("__m_doc"), F.col("origin").alias("__m_origin"))
            .distinct()
            .withColumn(flag, F.lit(True))
        )
        axed = axed.join(
            matched,
            (axed["doc_id"] == matched["__m_doc"]) & (axed["g_seg_id"] == matched["__m_origin"]),
            "left",
        ).drop("__m_doc", "__m_origin")
        axed = axed.withColumn(flag, F.coalesce(F.col(flag), F.lit(False)))
        return axed, F.col(flag)
