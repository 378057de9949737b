"""SPARQL text front-end for the motif matcher.

:mod:`graph_query` exposes the SPARQL algebra (BGP joins, property
paths, OPTIONAL, FILTER NOT EXISTS, inequality filters, CONSTRUCT) as
Python structures; this module adds the QUERY-STRING surface, so the
engine answers the question a KG consumer actually types::

    sparql(edges, '''
        SELECT ?g (COUNT(?s) AS ?n) WHERE {
          ?f DEFINES ?s .
          ?s REFERENCES ?t .
          OPTIONAL { ?g DEFINES ?t }
          FILTER NOT EXISTS { ?s REFERENCES ?f }
        }
        GROUP BY ?g ORDER BY DESC(?n) LIMIT 10
    ''')

Supported grammar (a deliberately small, canonical-layout subset —
see the parser doc for the exact token rules):

* ``SELECT [DISTINCT] (?v | (FN([DISTINCT] ?v|*) AS ?alias) ... | *)
  WHERE { ... } [GROUP BY ?v ...] [HAVING ( ?alias op num ) ...]\n  [ORDER BY key ...] [LIMIT n]``
  where ``FN`` is ``COUNT`` / ``SUM`` / ``MIN`` / ``MAX`` / ``AVG``
  and an order key is ``?v`` / ``ASC(?v)`` / ``DESC(?v)``
* ``CONSTRUCT { template triples } WHERE { ... }``
* ``ASK [WHERE] { ... }`` -> one row ``ask boolean`` (existence
  probes with ``limit(1)``; fully-constant patterns — the canonical
  ASK shape — compile to pushed-filter probes)
* WHERE body: a plain group, or a union chain
  ``{ group } UNION { group } [UNION { group } ...]``
* group body: triples terminated by ``.``; ``OPTIONAL { ... }``;
  ``FILTER NOT EXISTS { ... }``; ``MINUS { ... }`` (anti-join on the
  shared variables; an uncorrelated group is a no-op per SPARQL's
  disjoint-domain rule); ``FILTER ( ?a != ?b )``;
  ``VALUES ?x { term ... }`` / ``VALUES ( ?x ?y ) { ( term term )
  ... }`` (parens whitespace-separated, like FILTER; ``UNDEF`` binds
  NULL)
* terms: ``?var``; ``<iri>`` (angles stripped); ``"literal"``;
  bare names (including PROPERTY PATH expressions — any predicate
  token with ``/ | ^ + * ? ( )`` compiles through
  :func:`graph_query.path_pairs`); the keyword ``a`` maps to the
  configured ``type`` predicate per SPARQL shorthand.

Parsing produces exactly the structures :func:`graph_query.
match_pattern` / :func:`graph_query.construct` accept, so the text
surface inherits every planning property documented there (slice
pushdown, greedy/cost-based join ordering, anti-join negation,
left-join OPTIONAL, fixpoint path closures); the solution modifiers
compile to plain DataFrame ops Catalyst already optimizes — GROUP BY
to one hash aggregate (partial map-side combine for COUNT/SUM/MIN/
MAX), ORDER BY + LIMIT to TakeOrderedAndProject (a per-partition
top-k + a driver-side k-merge, never a full sort), UNION to a
zero-shuffle unionByName, VALUES to a broadcast inner join on the
shared variables (the literal table is driver-literal-sized by
construction). Out of scope (raise or parse error): ``;``/``,``
predicate-object lists, expressions beyond a single aggregate per
alias and a single comparison per HAVING clause, subqueries, OFFSET.

Aggregation semantics note: the WHERE solutions feeding GROUP BY are
the DISTINCT variable bindings (SPARQL's solution multiset over a
set-semantics RDF graph — a BGP derives each binding exactly once);
duplicate rows in the edge table therefore do not inflate COUNT, and
``COUNT(?v)`` counts solutions where ``?v`` is bound (OPTIONAL NULLs
excluded) exactly per the spec. ``SUM``/``AVG`` cast the (string)
node values to long/double, NULL when non-numeric.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pawpaw_spark.operators.graph_query import construct, match_pattern

# a token is a quoted literal, or a standalone brace/dot/paren/!=,
# or a run of anything else (so property paths keep their parens as
# long as they contain no whitespace). '(' ')' are standalone tokens
# ONLY when whitespace-separated, which the FILTER/VALUES forms
# require.
_TOKEN_RE = re.compile(r'"[^"]*"|\S+')
_KEYWORDS = {"select", "construct", "where", "distinct", "optional",
             "filter", "not", "exists", "union", "values", "group",
             "order", "by", "limit", "undef"}

_AGG_RE = re.compile(
    r"^\(\s*(COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(DISTINCT\s+)?"
    r"(\?\w+|\*)\s*\)\s+AS\s+(\?\w+)\s*\)$",
    re.IGNORECASE,
)
_ORDER_KEY_RE = re.compile(r"^(?:(ASC|DESC)\s*\(\s*)?(\?\w+)\s*\)?$",
                           re.IGNORECASE)


def _tokenize(q: str) -> list:
    # braces are split off even when written flush against a term;
    # triple-terminating dots must be whitespace-separated (canonical
    # SPARQL layout) because node ids may legitimately contain dots
    q = re.sub(r"([{}])", r" \1 ", q)
    return _TOKEN_RE.findall(q)


class _P:
    def __init__(self, toks: list, type_pred: str):
        self.toks, self.i, self.type_pred = toks, 0, type_pred

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, expect: str | None = None):
        t = self.peek()
        if t is None:
            raise ValueError(f"unexpected end of query (wanted {expect!r})")
        if expect is not None and t.lower() != expect:
            raise ValueError(f"expected {expect!r}, got {t!r}")
        self.i += 1
        return t

    def term(self) -> str:
        t = self.take()
        if t in "{}." or t.lower() in _KEYWORDS:
            raise ValueError(f"expected a term, got {t!r}")
        if t.startswith("<") and t.endswith(">"):
            return t[1:-1]
        if t.startswith('"') and t.endswith('"'):
            return t[1:-1]
        if t == "a":
            return self.type_pred
        return t

    def _values_block(self):
        """``VALUES`` already consumed: parse the variable row and the
        data block -> (vars, rows) with ``UNDEF`` -> None."""
        if self.peek() == "(":
            self.take("(")
            vs = []
            while self.peek() != ")":
                v = self.take()
                if not v.startswith("?"):
                    raise ValueError(f"VALUES expects ?vars, got {v!r}")
                vs.append(v[1:])
            self.take(")")
        else:
            v = self.take()
            if not v.startswith("?"):
                raise ValueError(f"VALUES expects ?vars, got {v!r}")
            vs = [v[1:]]
        if not vs:
            raise ValueError("VALUES needs at least one ?var")
        self.take("{")
        rows = []
        while self.peek() != "}":
            if self.peek() is None:
                raise ValueError("unclosed '{' in VALUES block")
            if len(vs) == 1 and self.peek() != "(":
                t = self.take()
                rows.append((None if t.lower() == "undef"
                             else self._const(t),))
                continue
            self.take("(")
            row = []
            while self.peek() != ")":
                t = self.take()
                row.append(None if t.lower() == "undef"
                           else self._const(t))
            self.take(")")
            if len(row) != len(vs):
                raise ValueError(
                    f"VALUES row has {len(row)} terms for {len(vs)} vars"
                )
            rows.append(tuple(row))
        self.take("}")
        return vs, rows

    def _const(self, t: str) -> str:
        if t.startswith("?"):
            raise ValueError(f"VALUES data must be constants, got {t!r}")
        if t.startswith("<") and t.endswith(">"):
            return t[1:-1]
        if t.startswith('"') and t.endswith('"'):
            return t[1:-1]
        return t

    def group(self):
        """Parse one { ... } group -> (triples, optionals, not_exists,
        neq, values). Nested OPTIONAL / FILTER only at the top level of
        the required group (SPARQL's common shape; deeper nesting
        raises)."""
        self.take("{")
        triples, optionals, negations, minus, neq, values = \
            [], [], [], [], [], []
        while True:
            t = self.peek()
            if t is None:
                raise ValueError("unclosed '{' in query")
            if t == "}":
                self.take()
                return triples, optionals, negations, minus, neq, values
            low = t.lower()
            if low in ("optional", "minus"):
                self.take()
                inner = self.group()
                if any(inner[1:]):
                    raise ValueError(
                        "nested OPTIONAL/MINUS/FILTER/VALUES inside a "
                        "group is not supported"
                    )
                (optionals if low == "optional" else minus).append(inner[0])
                continue
            if low == "values":
                self.take()
                values.append(self._values_block())
                continue
            if low == "filter":
                self.take()
                if (self.peek() or "").lower() == "not":
                    self.take("not")
                    self.take("exists")
                    inner = self.group()
                    if any(inner[1:]):
                        raise ValueError(
                            "nested OPTIONAL/MINUS/FILTER/VALUES inside a "
                            "group is not supported"
                        )
                    negations.append(inner[0])
                else:
                    self.take("(")
                    a = self.take()
                    self.take("!=")
                    b = self.take()
                    self.take(")")
                    if not (a.startswith("?") and b.startswith("?")):
                        raise ValueError(
                            f"FILTER supports only ( ?a != ?b ), got "
                            f"({a} != {b})"
                        )
                    neq.append((a, b))
                continue
            s, p, o = self.term(), self.term(), self.term()
            triples.append((s, p, o))
            if self.peek() == ".":
                self.take()
        # unreachable

    def where_body(self):
        """Parse the WHERE group -> list of branch bodies. A body whose
        first token is '{' is a union chain ``{g} UNION {g} ...``;
        otherwise it is a single plain group body."""
        self.take("{")
        if self.peek() == "{":
            branches = [self.group()]
            while (self.peek() or "").lower() == "union":
                self.take()
                branches.append(self.group())
            self.take("}")
            return branches
        # plain group: rewind the '{' and parse as one body
        self.i -= 1
        return [self.group()]

    def select_items(self):
        """SELECT item list -> (vars_or_None_for_star, items) where
        items preserve order as ('var', name) / ('agg', fn, distinct,
        var_or_None_for_star, alias)."""
        if self.peek() == "*":
            self.take()
            return None
        items = []
        while (self.peek() or "").lower() != "where":
            t = self.peek()
            if t is None:
                raise ValueError("SELECT list ran off the end of the query")
            if t.startswith("?"):
                self.take()
                items.append(("var", t[1:]))
                continue
            if t.startswith("("):
                # collect tokens until parens balance: aggregates are
                # written flush (no quoted literals inside), e.g.
                # (COUNT(DISTINCT ?s) AS ?n)
                parts, bal = [], 0
                while True:
                    tok = self.take()
                    parts.append(tok)
                    bal += tok.count("(") - tok.count(")")
                    if bal <= 0:
                        break
                expr = " ".join(parts)
                m = _AGG_RE.match(expr)
                if not m:
                    raise ValueError(
                        f"unsupported SELECT expression {expr!r} (only "
                        f"(FN([DISTINCT] ?v|*) AS ?alias) is supported)"
                    )
                fn, dist, v, alias = m.groups()
                if v == "*" and (fn.upper() != "COUNT" or dist):
                    raise ValueError(
                        f"unsupported SELECT expression {expr!r}: only "
                        f"plain COUNT(*) may aggregate *"
                    )
                items.append((
                    "agg",
                    fn.upper(),
                    bool(dist),
                    None if v == "*" else v[1:],
                    alias[1:],
                ))
                continue
            raise ValueError(f"SELECT expects ?vars, aggregates or *, got {t!r}")
        if not items:
            raise ValueError("SELECT needs at least one item or *")
        return items

    def modifiers(self):
        """Post-WHERE solution modifiers -> (group_by, having,
        order_by, limit)."""
        group_by, having, order_by, limit = [], [], [], None
        while self.peek() is not None:
            kw = self.take().lower()
            if kw == "having":
                while self.peek() == "(":
                    self.take("(")
                    v = self.take()
                    op = self.take()
                    num = self.take()
                    self.take(")")
                    if not v.startswith("?"):
                        raise ValueError(
                            f"HAVING expects ( ?var op number ), got {v!r}"
                        )
                    if op not in (">", ">=", "<", "<=", "=", "!="):
                        raise ValueError(f"unsupported HAVING operator {op!r}")
                    try:
                        val = int(num)
                    except ValueError:
                        try:
                            val = float(num)
                        except ValueError:
                            raise ValueError(
                                f"HAVING expects a numeric literal, got {num!r}"
                            ) from None
                    having.append((v[1:], op, val))
                if not having:
                    raise ValueError("HAVING needs at least one ( ... )")
                continue
            if kw == "group":
                self.take("by")
                while (p := self.peek()) is not None and p.startswith("?"):
                    group_by.append(self.take()[1:])
                if not group_by:
                    raise ValueError("GROUP BY needs at least one ?var")
            elif kw == "order":
                self.take("by")
                while (p := self.peek()) is not None and (
                    p.startswith("?")
                    or p.lower().startswith(("asc", "desc"))
                ):
                    tok = self.take()
                    parts = [tok]
                    bal = tok.count("(") - tok.count(")")
                    while bal > 0 or (
                        len(parts) == 1 and parts[0].lower() in ("asc", "desc")
                    ):
                        tok = self.take()
                        parts.append(tok)
                        bal += tok.count("(") - tok.count(")")
                    m = _ORDER_KEY_RE.match(" ".join(parts))
                    if not m:
                        raise ValueError(
                            f"bad ORDER BY key {' '.join(parts)!r}"
                        )
                    direction, v = m.groups()
                    order_by.append(
                        (v[1:], (direction or "ASC").upper() == "ASC")
                    )
                if not order_by:
                    raise ValueError("ORDER BY needs at least one key")
            elif kw == "limit":
                t = self.take()
                if not t.isdigit():
                    raise ValueError(f"LIMIT expects an integer, got {t!r}")
                limit = int(t)
            else:
                raise ValueError(f"trailing tokens after WHERE group: "
                                 f"{self.toks[self.i - 1:]}")
        return group_by, having, order_by, limit

    def template(self):
        self.take("{")
        out = []
        while self.peek() != "}":
            if self.peek() is None:
                raise ValueError("unclosed '{' in CONSTRUCT template")
            s, p, o = self.term(), self.term(), self.term()
            out.append((s, p, o))
            if self.peek() == ".":
                self.take()
        self.take("}")
        return out


def parse_sparql(query: str, *, type_pred: str = "type") -> dict:
    """Parse a SPARQL string -> a plan dict:
    ``{'form': 'select'|'construct', 'items': [...] | None,
    'distinct': bool, 'template': [...] | None, 'branches':
    [{'pattern', 'optional', 'not_exists', 'neq', 'values'}, ...],
    'group_by': [...], 'order_by': [(var, asc)], 'limit': int|None}``.
    Raises ValueError with the offending token on anything outside
    the supported subset."""
    p = _P(_tokenize(query), type_pred)
    head = p.take().lower()
    out: dict = {"items": None, "distinct": True, "template": None}
    if head == "select":
        out["form"] = "select"
        out["distinct"] = False  # an explicit DISTINCT keyword only
        if (p.peek() or "").lower() == "distinct":
            p.take()
            out["distinct"] = True
        out["items"] = p.select_items()
    elif head == "construct":
        out["form"] = "construct"
        out["template"] = p.template()
    elif head == "ask":
        out["form"] = "ask"
    else:
        raise ValueError(
            f"query must start with SELECT, CONSTRUCT or ASK, got {head!r}"
        )
    if head == "ask":
        if (p.peek() or "").lower() == "where":
            p.take()  # ASK { ... } and ASK WHERE { ... } are both legal
    else:
        p.take("where")
    branches = []
    for body in p.where_body():
        pattern, optionals, negations, minus, neq, values = body
        if not pattern:
            raise ValueError("a WHERE group binds no triples")
        branches.append({
            "pattern": pattern, "optional": optionals,
            "not_exists": negations, "minus": minus, "neq": neq,
            "values": values,
        })
    out["branches"] = branches
    if head in ("construct", "ask"):
        if p.peek() is not None:
            raise ValueError(
                f"trailing tokens after WHERE group: {p.toks[p.i:]}"
            )
        out.update(group_by=[], having=[], order_by=[], limit=None)
    else:
        group_by, having, order_by, limit = p.modifiers()
        out.update(group_by=group_by, having=having, order_by=order_by,
                   limit=limit)
    has_agg = any(it[0] == "agg" for it in (out["items"] or ()))
    if out["group_by"] and not has_agg:
        raise ValueError("GROUP BY requires at least one aggregate in SELECT")
    if out.get("having") and not has_agg:
        raise ValueError("HAVING requires an aggregating SELECT")
    if has_agg:
        bad = [it[1] for it in out["items"] if it[0] == "var"
               and it[1] not in out["group_by"]]
        if bad:
            raise ValueError(
                f"non-aggregated SELECT var(s) {bad} must appear in GROUP BY"
            )
    return out


_AGG_FNS = {
    "COUNT": lambda c: F.count(c),
    "SUM": lambda c: F.sum(c.cast("long")),
    "MIN": lambda c: F.min(c),
    "MAX": lambda c: F.max(c),
    "AVG": lambda c: F.avg(c.cast("double")),
}


def _agg_expr(fn: str, dist: bool, var: str | None, alias: str):
    if var is None:  # COUNT(*) — the only *-form aggregate
        if fn != "COUNT" or dist:
            raise ValueError(f"only plain COUNT(*) is supported, not "
                             f"{fn}({'DISTINCT ' if dist else ''}*)")
        return F.count(F.lit(1)).alias(alias)
    col = F.col(var)
    if dist:
        if fn != "COUNT":
            raise ValueError(f"{fn}(DISTINCT ?v) is not supported")
        return F.countDistinct(col).alias(alias)
    return _AGG_FNS[fn](col).alias(alias)


def _apply_values(matched: DataFrame, values_blocks) -> DataFrame:
    """Filter the branch solutions to those compatible with each
    VALUES literal table (semi-join on its variables, which must all
    be bound by the pattern — equivalent to SPARQL's inline-data join
    for set semantics, and never multiplies solutions on duplicate
    VALUES rows). The literal table is tiny by construction —
    broadcast-hinted so the join never shuffles the solution side.
    NULL (UNDEF) cells act as wildcards per SPARQL's
    compatible-binding rule."""
    spark = matched.sparkSession
    for vs, rows in values_blocks:
        missing = [v for v in vs if v not in matched.columns]
        if missing:
            raise ValueError(
                f"VALUES variable(s) {missing} not bound by the pattern "
                f"(bound: {matched.columns})"
            )
        lit = spark.createDataFrame(
            [tuple(r) for r in rows], schema=", ".join(f"{v} string" for v in vs)
        )
        if any(cell is None for row in rows for cell in row):
            # UNDEF wildcard: compatible iff every non-NULL cell matches
            cond = None
            right = F.broadcast(lit.select(
                *[F.col(v).alias(f"__val_{v}") for v in vs]
            ))
            for v in vs:
                c = F.col(f"__val_{v}").isNull() | (
                    F.col(f"__val_{v}") == F.col(v)
                )
                cond = c if cond is None else (cond & c)
            matched = matched.join(right, cond, "semi")
        else:
            matched = matched.join(F.broadcast(lit), on=list(vs), how="semi")
    return matched


def sparql(
    edges: DataFrame,
    query: str,
    *,
    type_pred: str = "type",
    bag: bool = False,
    **match_kwargs,
) -> DataFrame:
    """Run a SPARQL SELECT/CONSTRUCT string over a triple table ->
    a DataFrame (one column per selected variable / aggregate alias,
    or (subj, pred, obj) for CONSTRUCT). ``bag=True`` selects bag
    semantics (``distinct=False`` in the matcher) for plain SELECT;
    DISTINCT in the query text always forces set semantics. Remaining
    keyword arguments (``collect_stats``, ``path_max_rounds``, column
    names, ...) pass through to :func:`graph_query.match_pattern`."""
    plan = parse_sparql(query, type_pred=type_pred)
    if plan["form"] == "construct":
        b = plan["branches"]
        if len(b) > 1:
            raise ValueError("CONSTRUCT over a UNION body is not supported")
        if b[0]["values"]:
            raise ValueError("CONSTRUCT with VALUES is not supported")
        return construct(
            edges,
            b[0]["pattern"],
            plan["template"],
            optional=b[0]["optional"],
            not_exists=b[0]["not_exists"],
            minus=b[0]["minus"],
            neq=b[0]["neq"],
            **match_kwargs,
        )
    if plan["form"] == "ask":
        # existence probe: one row, `ask boolean`, true iff ANY branch
        # is satisfiable. limit(1) stops each probe at the first
        # satisfying binding. A fully-constant branch (the canonical
        # ASK shape, which match_pattern rejects as binding no
        # variables) compiles to per-triple pushed-filter probes whose
        # conjunction is a cross join of ≤1-row frames.
        parts = []
        for b in plan["branches"]:
            if (not b["optional"] and not b["not_exists"]
                    and not b["minus"] and all(
                        not t.startswith("?")
                        for tr in b["pattern"] for t in tr)):
                probe = None
                for s, pr, o in b["pattern"]:
                    if any(ch in pr for ch in "/|^+*?()"):
                        raise ValueError(
                            f"constant property-path triple {pr!r} in an "
                            f"all-constant ASK is not supported"
                        )
                    one = (
                        edges.filter(
                            (F.col(match_kwargs.get("subj_col", "subj")) == s)
                            & (F.col(match_kwargs.get("pred_col", "pred")) == pr)
                            & (F.col(match_kwargs.get("obj_col", "obj")) == o)
                        )
                        .select(F.lit(1).alias("one"))
                        .limit(1)
                    )
                    probe = one if probe is None else probe.crossJoin(
                        one.select(F.col("one").alias(f"_c{len(probe.columns)}"))
                    )
                parts.append(probe.select(F.lit(1).alias("one")).limit(1))
                continue
            m = match_pattern(
                edges, b["pattern"], optional=b["optional"],
                not_exists=b["not_exists"], minus=b["minus"],
                neq=b["neq"], distinct=False, **match_kwargs,
            )
            if b["values"]:
                m = _apply_values(m, b["values"])
            parts.append(m.select(F.lit(1).alias("one")).limit(1))
        out = parts[0]
        for m in parts[1:]:
            out = out.unionByName(m)
        return out.agg((F.count("one") > 0).alias("ask"))
    items = plan["items"]
    has_agg = any(it[0] == "agg" for it in (items or ()))
    # an explicit DISTINCT keyword in the text always wins over
    # bag=True; aggregation always consumes the DISTINCT solution
    # multiset (see module doc)
    set_sem = plan["distinct"] or not bag
    parts = []
    for b in plan["branches"]:
        m = match_pattern(
            edges,
            b["pattern"],
            optional=b["optional"],
            not_exists=b["not_exists"],
            minus=b["minus"],
            neq=b["neq"],
            distinct=set_sem or has_agg,
            **match_kwargs,
        )
        if b["values"]:
            m = _apply_values(m, b["values"])
        parts.append(m)
    out = parts[0]
    for m in parts[1:]:
        out = out.unionByName(m, allowMissingColumns=True)
    if has_agg:
        aggs = [_agg_expr(it[1], it[2], it[3], it[4])
                for it in items if it[0] == "agg"]
        grouped = (out.groupBy(*plan["group_by"]) if plan["group_by"]
                   else out.groupBy())
        out = grouped.agg(*aggs)
        order = [it[1] if it[0] == "var" else it[4] for it in items]
        out = out.select(*order)
        _OPS = {">": "__gt__", ">=": "__ge__", "<": "__lt__",
                "<=": "__le__", "=": "__eq__", "!=": "__ne__"}
        for v, op, val in plan.get("having", ()):
            if v not in out.columns:
                raise ValueError(
                    f"HAVING variable ?{v} not in the result "
                    f"(columns: {out.columns})"
                )
            out = out.filter(getattr(F.col(v), _OPS[op])(F.lit(val)))
    elif items is not None:
        names = [it[1] for it in items]
        missing = [v for v in names if v not in out.columns]
        if missing:
            raise ValueError(
                f"SELECT variable(s) {missing} not bound by the pattern "
                f"(bound: {out.columns})"
            )
        out = out.select(*names)
        if set_sem:
            out = out.distinct()  # projection can re-introduce duplicates
    elif set_sem and len(parts) > 1:
        out = out.distinct()  # union of set-semantic branches
    for v, _ in plan["order_by"]:
        if v not in out.columns:
            raise ValueError(f"ORDER BY variable ?{v} not in the result "
                             f"(columns: {out.columns})")
    if plan["order_by"]:
        out = out.orderBy(*[
            F.col(v).asc() if asc else F.col(v).desc()
            for v, asc in plan["order_by"]
        ])
    if plan["limit"] is not None:
        out = out.limit(plan["limit"])
    return out
