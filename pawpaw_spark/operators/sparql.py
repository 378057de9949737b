"""SPARQL text front-end for the motif matcher.

:mod:`graph_query` exposes the SPARQL algebra (BGP joins, property
paths, OPTIONAL, FILTER NOT EXISTS, inequality filters, CONSTRUCT) as
Python structures; this module adds the QUERY-STRING surface, so the
engine answers the question a KG consumer actually types::

    sparql(edges, '''
        SELECT ?f ?g WHERE {
          ?f DEFINES ?s .
          ?s REFERENCES ?t .
          OPTIONAL { ?g DEFINES ?t }
          FILTER NOT EXISTS { ?s REFERENCES ?f }
        }
    ''')

Supported grammar (a deliberately small, canonical-layout subset —
see the parser doc for the exact token rules):

* ``SELECT [DISTINCT] (?v ... | *) WHERE { ... }``
* ``CONSTRUCT { template triples } WHERE { ... }``
* group body: triples terminated by ``.``; ``OPTIONAL { ... }``;
  ``FILTER NOT EXISTS { ... }``; ``FILTER ( ?a != ?b )``
* terms: ``?var``; ``<iri>`` (angles stripped); ``"literal"``;
  bare names (including PROPERTY PATH expressions — any predicate
  token with ``/ | ^ + * ? ( )`` compiles through
  :func:`graph_query.path_pairs`); the keyword ``a`` maps to the
  configured ``type`` predicate per SPARQL shorthand.

Parsing produces exactly the structures :func:`graph_query.
match_pattern` / :func:`graph_query.construct` accept, so the text
surface inherits every planning property documented there (slice
pushdown, greedy/cost-based join ordering, anti-join negation,
left-join OPTIONAL, fixpoint path closures) with zero new execution
code. Out of scope (raise or parse error): ``;``/``,`` predicate-
object lists, GROUP BY/aggregates (run ``.groupBy`` on the returned
DataFrame — it IS a DataFrame), VALUES, subqueries, UNION groups.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from pawpaw_spark.operators.graph_query import construct, match_pattern

# a token is a quoted literal, or a standalone brace/dot/paren/!=,
# or a run of anything else (so property paths keep their parens as
# long as they contain no whitespace). '(' ')' are standalone tokens
# ONLY when whitespace-separated, which the FILTER form requires.
_TOKEN_RE = re.compile(r'"[^"]*"|\S+')
_KEYWORDS = {"select", "construct", "where", "distinct", "optional",
             "filter", "not", "exists"}


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

    def group(self):
        """Parse one { ... } group -> (triples, optionals, not_exists,
        neq). Nested OPTIONAL / FILTER only at the top level of the
        required group (SPARQL's common shape; deeper nesting raises)."""
        self.take("{")
        triples, optionals, negations, neq = [], [], [], []
        while True:
            t = self.peek()
            if t is None:
                raise ValueError("unclosed '{' in query")
            if t == "}":
                self.take()
                return triples, optionals, negations, neq
            low = t.lower()
            if low == "optional":
                self.take()
                inner = self.group()
                if inner[1] or inner[2] or inner[3]:
                    raise ValueError(
                        "nested OPTIONAL/FILTER inside a group is not "
                        "supported"
                    )
                optionals.append(inner[0])
                continue
            if low == "filter":
                self.take()
                if (self.peek() or "").lower() == "not":
                    self.take("not")
                    self.take("exists")
                    inner = self.group()
                    if inner[1] or inner[2] or inner[3]:
                        raise ValueError(
                            "nested OPTIONAL/FILTER inside a group is "
                            "not supported"
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
    ``{'form': 'select'|'construct', 'vars': [...] | None,
    'distinct': bool, 'template': [...] | None, 'pattern': [...],
    'optional': [...], 'not_exists': [...], 'neq': [...]}``.
    Raises ValueError with the offending token on anything outside
    the supported subset."""
    p = _P(_tokenize(query), type_pred)
    head = p.take().lower()
    out: dict = {"vars": None, "distinct": True, "template": None}
    if head == "select":
        out["form"] = "select"
        out["distinct"] = False  # an explicit DISTINCT keyword only
        if (p.peek() or "").lower() == "distinct":
            p.take()
            out["distinct"] = True
        if p.peek() == "*":
            p.take()
        else:
            vs = []
            while (p.peek() or "").lower() != "where":
                v = p.take()
                if not v.startswith("?"):
                    raise ValueError(f"SELECT expects ?vars or *, got {v!r}")
                vs.append(v[1:])
            if not vs:
                raise ValueError("SELECT needs at least one ?var or *")
            out["vars"] = vs
    elif head == "construct":
        out["form"] = "construct"
        out["template"] = p.template()
    else:
        raise ValueError(f"query must start with SELECT or CONSTRUCT, got {head!r}")
    p.take("where")
    pattern, optionals, negations, neq = p.group()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens after WHERE group: {p.toks[p.i:]}")
    if not pattern:
        raise ValueError("WHERE group binds no triples")
    out.update(
        pattern=pattern, optional=optionals, not_exists=negations, neq=neq
    )
    return out


def sparql(
    edges: DataFrame,
    query: str,
    *,
    type_pred: str = "type",
    bag: bool = False,
    **match_kwargs,
) -> DataFrame:
    """Run a SPARQL SELECT/CONSTRUCT string over a triple table ->
    a DataFrame (one column per selected variable, or (subj, pred,
    obj) for CONSTRUCT). ``bag=True`` selects bag semantics
    (``distinct=False`` in the matcher) for plain SELECT; DISTINCT in
    the query text always forces set semantics. Remaining keyword
    arguments (``collect_stats``, ``path_max_rounds``, column names,
    ...) pass through to :func:`graph_query.match_pattern`."""
    plan = parse_sparql(query, type_pred=type_pred)
    if plan["form"] == "construct":
        return construct(
            edges,
            plan["pattern"],
            plan["template"],
            optional=plan["optional"],
            not_exists=plan["not_exists"],
            neq=plan["neq"],
            **match_kwargs,
        )
    # an explicit DISTINCT keyword in the text always wins over bag=True
    set_sem = plan["distinct"] or not bag
    m = match_pattern(
        edges,
        plan["pattern"],
        optional=plan["optional"],
        not_exists=plan["not_exists"],
        neq=plan["neq"],
        distinct=set_sem,
        **match_kwargs,
    )
    if plan["vars"] is not None:
        missing = [v for v in plan["vars"] if v not in m.columns]
        if missing:
            raise ValueError(
                f"SELECT variable(s) {missing} not bound by the pattern "
                f"(bound: {m.columns})"
            )
        m = m.select(*plan["vars"])
        if set_sem:
            m = m.distinct()  # projection can re-introduce duplicates
    return m
