"""Basic-graph-pattern (motif) matching over KG triple tables.

The reference stops at emitting (subj, pred, obj) rows; the question a
knowledge-graph consumer asks next is conjunctive: "files that DEFINE a
symbol which REFERENCES a symbol DEFINED elsewhere", "pairs of callers
of the same hub".  :func:`match_pattern` is a tiny SPARQL-BGP-style
matcher: a pattern is a list of (subject, predicate, object) terms where
``?name`` terms are variables and everything else is a constant; the
result is one row per satisfying binding, one column per variable.

Compilation is a left-deep tree of equi-joins over per-triple slices of
the edge table — declarative DataFrame ops end to end, so Catalyst owns
the physical strategy:

* every constant (predicate or endpoint) becomes a ``filter`` on the
  slice, which reaches the parquet/Iceberg scan as a pushed predicate —
  with the edge table partitioned by ``pred`` (storage.write_partitioned
  does exactly that for KG edge tables) a constant-predicate triple
  reads ONLY its partition;
* join order is greedy-connected: start from the most-constrained
  triple (most constants), then repeatedly attach a triple sharing a
  variable with the bound set.  Disconnected patterns raise rather than
  silently cross-join (``allow_product=True`` opts in);
* every join is an equi-join on node-id columns — AQE handles skewed
  hubs (mega-symbols) by splitting stragglers, and a slice whose
  filters make it metadata-small is broadcast by Catalyst's size
  estimate without a hint.

Cyclic patterns (triangles) are where left-deep binary joins are
asymptotically beatable — the worst-case-optimal-join literature (see
PAPERS.md: NPRR / Leapfrog Triejoin) binds one VARIABLE at a time
instead of one EDGE at a time.  For the common triangle case this
module is honest about the limit: :func:`pawpaw_spark.operators.graph.
triangle_count`'s degree-ordered orientation is the specialized plan
(out-neighborhoods bounded by O(sqrt(m))), and its docstring is the
scale guidance; `match_pattern` still answers cyclic patterns correctly
because the last closing edge is applied as a semijoin-style equi-join
on BOTH endpoints at once, never a filtered cross product.

Reference parity: the reference has no query language over its emitted
triples (consumers iterate `find_all` over the Ito tree,
``/root/reference/pawpaw/query/_query.py`` — a per-document axis
language, not a graph one); this operator is part of the beyond-parity
KG-consumer surface like graph.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Triple = tuple[str, str | None, str]


def _is_var(term: str | None) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _vars_of(t: Triple) -> set[str]:
    return {x[1:] for x in t if _is_var(x)}


def _slice(
    edges: DataFrame, t: Triple, subj_col: str, pred_col: str, obj_col: str
) -> DataFrame:
    """One pattern triple -> the edge slice with variable-named columns.

    Constants become filters (pushed to the scan); a variable repeated
    inside the triple (e.g. ``('?a', 'CALLS', '?a')`` self loops)
    becomes an intra-row equality filter.
    """
    s, p, o = t
    df = edges
    cols = []
    if _is_var(p):
        cols.append(F.col(pred_col).alias(p[1:]))
    elif p is not None:
        df = df.filter(F.col(pred_col) == p)
    if _is_var(s):
        cols.append(F.col(subj_col).alias(s[1:]))
    else:
        df = df.filter(F.col(subj_col) == s)
    if _is_var(o):
        if _is_var(s) and o == s:
            # self-loop pattern: both ends the same variable; keep the
            # subj binding only
            df = df.filter(F.col(subj_col) == F.col(obj_col))
        else:
            cols.append(F.col(obj_col).alias(o[1:]))
    else:
        df = df.filter(F.col(obj_col) == o)
    if _is_var(p) and (p == s or p == o):
        raise ValueError(f"predicate variable {p} reused as an endpoint")
    if not cols:
        raise ValueError(f"pattern triple {t} binds no variables")
    return df.select(*cols)


def _const_slice(
    edges: DataFrame, t: Triple, subj_col: str, pred_col: str, obj_col: str
) -> DataFrame:
    """A fully-constant triple -> the (possibly empty) matching edge
    slice, used as an existence semijoin: the pattern matches iff the
    slice is non-empty. All three filters push to the scan."""
    s, p, o = t
    df = edges.filter(F.col(subj_col) == s).filter(F.col(obj_col) == o)
    if p is not None:
        df = df.filter(F.col(pred_col) == p)
    return df


def _order_triples(pattern: Sequence[Triple], allow_product: bool) -> list[Triple]:
    """Greedy-connected ordering: most-constrained first, then always a
    triple sharing a variable with the already-bound set."""

    def n_const(t: Triple) -> int:
        # None is an any-predicate wildcard, not a constant: it doesn't
        # constrain the slice, so it must not raise the seed score.
        return sum(1 for x in t if x is not None and not _is_var(x))

    remaining = sorted(range(len(pattern)), key=lambda i: -n_const(pattern[i]))
    order: list[Triple] = []
    bound: set[str] = set()
    while remaining:
        pick = None
        for i in remaining:
            if not order or (_vars_of(pattern[i]) & bound):
                pick = i
                break
        if pick is None:
            if not allow_product:
                raise ValueError(
                    "pattern is disconnected (would require a cross "
                    "product); pass allow_product=True to opt in"
                )
            pick = remaining[0]
        remaining.remove(pick)
        order.append(pattern[pick])
        bound |= _vars_of(pattern[pick])
    return order


def _compile_group(
    edges: DataFrame,
    group: Sequence[Triple],
    outer_vars: set[str],
    allow_product: bool,
    subj_col: str,
    pred_col: str,
    obj_col: str,
) -> tuple[DataFrame, list[str]]:
    """One OPTIONAL group -> (its inner-joined binding table, the join
    keys it shares with the required pattern).  Triples inside a group
    are ordered greedy-connected like the required pattern, except the
    bound set is SEEDED with the outer variables: a triple is reachable
    either through a group-internal variable or through a required
    variable it mentions.  Two group triples connected only through
    DIFFERENT outer variables would still need a product (their slices
    constrain independent rows) — that raises, with the fix being two
    separate groups (which left-join independently)."""
    remaining = sorted(
        range(len(group)),
        key=lambda i: -sum(
            1 for x in group[i] if x is not None and not _is_var(x)
        ),
    )
    bound = set(outer_vars)
    order: list[Triple] = []
    for t in group:
        if not _vars_of(t):
            raise ValueError(
                f"optional triple {t} binds no variables; constant "
                "existence constraints belong in the required pattern"
            )
    while remaining:
        pick = None
        for i in remaining:
            if not order or (_vars_of(group[i]) & bound):
                pick = i
                break
        if pick is None:
            raise ValueError(
                "optional group is disconnected from the required "
                "pattern and itself"
            )
        remaining.remove(pick)
        order.append(group[pick])
        bound |= _vars_of(group[pick])
    g = _slice(edges, order[0], subj_col, pred_col, obj_col)
    g_cols = _vars_of(order[0])
    for t in order[1:]:
        sl = _slice(edges, t, subj_col, pred_col, obj_col)
        shared = sorted(g_cols & _vars_of(t))
        if shared:
            g = g.join(sl, on=shared, how="inner")
        elif allow_product:
            g = g.crossJoin(sl)
        else:
            raise ValueError(
                f"optional triple {t} shares no already-bound group "
                "column (a product); split into separate optional "
                "groups or pass allow_product=True"
            )
        g_cols |= _vars_of(t)
    keys = sorted(g_cols & outer_vars)
    if not keys:
        raise ValueError(
            "optional group shares no variable with the required "
            "pattern (the left join would be a product)"
        )
    return g, keys


def match_pattern(
    edges: DataFrame,
    pattern: Sequence[Triple],
    *,
    optional: Sequence[Sequence[Triple]] = (),
    neq: Sequence[tuple[str, str]] = (),
    distinct: bool = True,
    allow_product: bool = False,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Conjunctive pattern match -> one row per binding, one column per
    ``?variable`` (column name without the ``?``).

    ``pattern``: triples of terms; ``?x`` terms are variables, ``None``
    as predicate matches any predicate without binding it, anything
    else is a constant.  ``neq`` lists variable pairs that must bind to
    different values (applied as soon as both are bound, so the filter
    runs at the earliest join, not on the final result).

    A fully-constant triple (a SPARQL-BGP existential constraint, e.g.
    ``('a', 'CALLS', 'c')`` alongside variable triples) is applied as
    an existence semijoin: the result is unchanged if at least one edge
    matches it and empty otherwise.  It is excluded from the
    connectivity check (it shares no variables by construction).  A
    pattern consisting ONLY of constant triples binds no variables and
    raises — use a plain ``filter``/``count`` for a pure ASK.

    ``distinct=True`` (default) returns set semantics — two distinct
    edges producing the same variable binding collapse, matching
    SPARQL ``SELECT DISTINCT`` and making results independent of edge
    multiplicity.

    ``optional`` lists OPTIONAL groups (each a sequence of triples,
    SPARQL ``OPTIONAL { ... }``): each group is compiled to its own
    inner-joined binding table and LEFT-joined onto the required
    result on the variables it shares with the required pattern —
    required rows with no group match keep NULL for the group's new
    variables.  Groups are independent left joins (SPARQL's sequential
    OPTIONAL semantics for groups that don't share new variables);
    a new variable appearing in two groups raises, as does a group
    sharing no variable with the required pattern.  ``neq`` may only
    reference required variables: a NULL comparison would silently
    drop the unmatched row and corrupt the OPTIONAL semantics.
    """
    if not pattern:
        raise ValueError("pattern must contain at least one triple")
    for a, b in neq:
        if not (_is_var(a) and _is_var(b)):
            raise ValueError(f"neq terms must be variables: ({a}, {b})")
    all_vars: set[str] = set()
    for t in pattern:
        all_vars |= _vars_of(t)
    for a, b in neq:
        if a[1:] not in all_vars or b[1:] not in all_vars:
            raise ValueError(
                f"neq variable not in the required pattern: ({a}, {b})"
            )
    claimed_new: set[str] = set()
    for grp in optional:
        if not grp:
            raise ValueError("optional group must contain >= 1 triple")
        new_vars = set().union(*(_vars_of(t) for t in grp)) - all_vars
        overlap = new_vars & claimed_new
        if overlap:
            raise ValueError(
                f"optional variable(s) {sorted(overlap)} appear in two "
                "groups; bind shared optional structure in one group"
            )
        claimed_new |= new_vars

    var_triples = [t for t in pattern if _vars_of(t)]
    const_triples = [t for t in pattern if not _vars_of(t)]
    if not var_triples:
        raise ValueError(
            "pattern binds no variables (all triples constant); use a "
            "plain filter/count for an existence-only ASK"
        )

    ordered = _order_triples(var_triples, allow_product)
    out = _slice(edges, ordered[0], subj_col, pred_col, obj_col)
    # existence semijoins first: each is a <=1-row broadcast side, so a
    # failed constant constraint empties the plan before any real join
    for i, t in enumerate(const_triples):
        probe = (
            _const_slice(edges, t, subj_col, pred_col, obj_col)
            .limit(1)
            .select(F.lit(1).alias(f"__exists_{i}__"))
        )
        out = out.crossJoin(probe).drop(f"__exists_{i}__")
    bound = _vars_of(ordered[0])
    applied: set[tuple[str, str]] = set()

    def apply_neq(df: DataFrame, bound: set[str]) -> DataFrame:
        for a, b in neq:
            key = (a[1:], b[1:])
            if key in applied:
                continue
            if key[0] in bound and key[1] in bound:
                df = df.filter(F.col(key[0]) != F.col(key[1]))
                applied.add(key)
        return df

    out = apply_neq(out, bound)
    for t in ordered[1:]:
        sl = _slice(edges, t, subj_col, pred_col, obj_col)
        shared = sorted(bound & _vars_of(t))
        if shared:
            out = out.join(sl, on=shared, how="inner")
        else:
            out = out.crossJoin(sl)
        bound |= _vars_of(t)
        out = apply_neq(out, bound)

    # OPTIONAL groups: each compiles to its own binding table and
    # left-joins on its required-shared variables — an equi-join like
    # every other join here, so AQE/broadcast strategies apply as usual
    for grp in optional:
        g, keys = _compile_group(
            edges, grp, all_vars, allow_product, subj_col, pred_col,
            obj_col,
        )
        out = out.join(g, on=keys, how="left")

    # stable column order: first mention in the ORIGINAL pattern, then
    # each optional group's new variables in mention order
    seen: list[str] = []
    for t in pattern:
        for x in t:
            if _is_var(x) and x[1:] not in seen:
                seen.append(x[1:])
    for grp in optional:
        for t in grp:
            for x in t:
                if _is_var(x) and x[1:] not in seen:
                    seen.append(x[1:])
    out = out.select(*seen)
    return out.distinct() if distinct else out
