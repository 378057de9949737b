"""RDFS (rho-df fragment) entailment over KG triple tables.

The pipeline's emitted KG is extensional — (repo, CONTAINS, file),
(file, DEFINES, sym), (sym, REFERENCES, sym). An ontology layer
(sub-property/sub-class hierarchies, domain/range typing) turns those
raw predicates into a queryable vocabulary: "everything that MENTIONS
x" should match DEFINES and REFERENCES edges without every consumer
hand-unioning slices. :func:`rdfs_closure` computes the standard RDFS
entailment for the rho-df fragment (Munoz, Perez & Gutierrez, "Minimal
deductive system for RDF" — subPropertyOf, subClassOf, domain, range,
type), the same rule set the published large-scale reasoners
(WebPIE's MapReduce encoding, later Spark ports) target.

rho-df's key property is that the closure needs NO general fixpoint —
a fixed rule ORDERING computes it exactly (the WebPIE observation):

1. transitively close ``subPropertyOf`` over the schema pairs
   (semi-naive :func:`pawpaw_spark.operators.graph_query._closure` —
   the schema is metadata-sized next to the instance data, so this
   fixpoint runs on a table of predicates, not the corpus);
2. inherit instance triples up the CLOSED property hierarchy with ONE
   equi-join (closure transitivity makes a second pass redundant);
3. apply ``domain``/``range`` to the EXTENDED triple set (base +
   inherited — a super-property's domain must type triples that only
   exist after step 2) producing ``type`` facts;
4. transitively close ``subClassOf`` and propagate ALL type facts
   (asserted + derived) up the closed class hierarchy with one join.

Scale shape: the only fixpoints iterate over SCHEMA pair tables
(vocabulary-sized — broadcast territory); the per-instance work is
two equi-joins against those closed schema tables (Catalyst broadcasts
them from its size estimate) plus set-semantics dedups. No driver-side
data beyond the vocabulary guard collect (distinct schema targets).

Reference parity: none — the reference emits triples and stops; this
is the beyond-parity deductive surface, the fixed-ruleset sibling of
:mod:`pawpaw_spark.operators.infer` (which covers user-written
recursive programs; rho-df's rules are NOT expressible there because
sub-property inheritance joins on the PREDICATE position, which
Datalog-over-triples forbids as a body predicate variable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pawpaw_spark.operators.graph_query import _closure


def rdfs_closure(
    triples: DataFrame,
    *,
    type_pred: str = "type",
    sub_class: str = "subClassOf",
    sub_prop: str = "subPropertyOf",
    domain_pred: str = "domain",
    range_pred: str = "range",
    max_rounds: int = 32,
    include_base: bool = False,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """RDFS (rho-df) entailment -> the DERIVED (subj, pred, obj) facts
    (set semantics; ``include_base=True`` unions the base back in).

    Schema triples live in the SAME table as instance triples (the RDF
    data model): a triple whose predicate is ``subPropertyOf`` /
    ``subClassOf`` / ``domain`` / ``range`` is schema; a triple whose
    predicate is ``type`` asserts class membership; everything else is
    an instance triple subject to property inheritance. The five
    vocabulary names are parameters so callers can use full IRIs
    (``rdfs:subClassOf``) or the short forms KG tables typically carry.

    Entailments produced (the rho-df rules, minus the reflexivity
    axioms — ``x subClassOf x`` for every term is noise at KG scale
    and the fragment is standard without it):

    * transitive ``subPropertyOf`` / ``subClassOf`` schema facts;
    * ``(s, q, o)`` for every instance ``(s, p, o)`` with ``p``
      (transitively) sub-property of ``q``;
    * ``(s, type, c)`` for ``(p, domain, c)`` and any (base or
      inherited) triple ``(s, p, o)``; symmetrically ``range`` types
      the object;
    * ``(x, type, d)`` for asserted/derived ``(x, type, c)`` with
      ``c`` (transitively) sub-class of ``d``.

    A ``subPropertyOf`` target that is itself one of the five
    vocabulary predicates (e.g. declaring a sub-property OF ``type``)
    raises: those entailments recursively change what counts as
    schema, which the fixed rule ordering — and every fixed-pass
    reasoner in the WebPIE family — deliberately excludes.
    """
    vocab = {type_pred, sub_class, sub_prop, domain_pred, range_pred}
    if len(vocab) != 5:
        raise ValueError("the five vocabulary predicate names must differ")
    base = (
        triples.select(
            F.col(subj_col).cast("string").alias("subj"),
            F.col(pred_col).cast("string").alias("pred"),
            F.col(obj_col).cast("string").alias("obj"),
        )
        .distinct()
        .persist()
    )
    try:
        base.count()  # materialize: every rule below reads it
        key = ["subj", "pred", "obj"]

        def pairs(pred: str) -> DataFrame:
            return base.filter(F.col("pred") == pred).select(
                F.col("subj").alias("src"), F.col("obj").alias("dst")
            )

        spo = _closure(pairs(sub_prop), max_rounds, False)
        sco = _closure(pairs(sub_class), max_rounds, False)
        bad = [
            r["dst"]
            for r in spo.select("dst").distinct().collect()
            if r["dst"] in vocab
        ]
        if bad:
            raise ValueError(
                f"subPropertyOf into the reserved vocabulary {sorted(bad)} "
                "is outside the rho-df fixed-pass fragment"
            )

        inst = base.filter(~F.col("pred").isin(*sorted(vocab)))
        inherited = (
            inst.join(spo, inst["pred"] == spo["src"])
            .select("subj", F.col("dst").alias("pred"), "obj")
            .distinct()
        )
        ext = inst.union(inherited)  # base + inherited instance triples

        dom = pairs(domain_pred).withColumnRenamed("dst", "cls")
        rng = pairs(range_pred).withColumnRenamed("dst", "cls")
        typ_asserted = base.filter(F.col("pred") == type_pred).select(
            F.col("subj").alias("inst"), F.col("obj").alias("cls")
        )
        typ_dom = ext.join(dom, ext["pred"] == dom["src"]).select(
            F.col("subj").alias("inst"), "cls"
        )
        typ_rng = ext.join(rng, ext["pred"] == rng["src"]).select(
            F.col("obj").alias("inst"), "cls"
        )
        typ = typ_asserted.union(typ_dom).union(typ_rng).distinct()
        typ_up = typ.join(sco, typ["cls"] == sco["src"]).select(
            "inst", F.col("dst").alias("cls")
        )
        typ_all = typ.union(typ_up).distinct()

        def as_triples(df: DataFrame, pred: str) -> DataFrame:
            a, b = df.columns
            return df.select(
                F.col(a).alias("subj"),
                F.lit(pred).alias("pred"),
                F.col(b).alias("obj"),
            )

        closed = (
            inherited.union(as_triples(spo, sub_prop))
            .union(as_triples(sco, sub_class))
            .union(as_triples(typ_all, type_pred))
            .distinct()
        )
        if include_base:
            return closed.join(base, key, "left_anti").union(base)
        return closed.join(base, key, "left_anti")
    finally:
        base.unpersist()


def sameas_canonical(
    triples: DataFrame,
    *,
    sameas_pred: str = "sameAs",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    **cc_kwargs,
) -> DataFrame:
    """owl:sameAs identity resolution -> ``(node, canon)`` for every
    node mentioned in a sameAs assertion; ``canon`` = the smallest
    member of the node's identity cluster.

    sameAs is symmetric, transitive and reflexive, so the identity
    clusters are EXACTLY the connected components of the (symmetrized)
    sameAs graph — :func:`pawpaw_spark.operators.canon.
    connected_components` computes them with the same min-label +
    pointer-jumping discipline the entity-linking pipeline uses
    (O(log diameter) rounds distributed, exact driver union-find below
    the metadata-size cutover). The min-member canon pin makes the
    mapping a pure function of the cluster: deterministic at any
    parallelism, stable under unrelated insertions.

    Scale shape: the sameAs assertion set is identity METADATA — orders
    of magnitude smaller than the instance triples at any corpus size —
    so the component computation never touches the data plane.
    """
    from pawpaw_spark.operators.canon import connected_components

    pairs = (
        triples.filter(F.col(pred_col) == sameas_pred)
        .select(F.col(subj_col).alias("a"), F.col(obj_col).alias("b"))
    )
    comps = connected_components(pairs, **cc_kwargs)
    return comps.select(F.col("node"), F.col("comp").alias("canon"))


def sameas_fuse(
    triples: DataFrame,
    *,
    sameas_pred: str = "sameAs",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    **cc_kwargs,
) -> DataFrame:
    """Fuse owl:sameAs-equal identities into the KG: rewrite every
    subject/object to its canonical representative, drop the consumed
    sameAs assertions (post-rewrite they are self-loops carrying no
    information), and dedup (set semantics — distinct triples can
    collapse once their endpoints unify).

    The rewrite joins only the CHANGED mappings (``node != canon``) —
    the members of non-trivial identity clusters, a set bounded by the
    sameAs assertion volume, not the corpus — as two left equi-joins +
    coalesce, the same broadcast-shaped plan as
    :func:`pawpaw_spark.operators.canon.rewrite_edges_canonical`.
    """
    mapping = sameas_canonical(
        triples,
        sameas_pred=sameas_pred,
        subj_col=subj_col,
        pred_col=pred_col,
        obj_col=obj_col,
        **cc_kwargs,
    )
    changed = mapping.filter(F.col("node") != F.col("canon"))
    subj_map = changed.select(
        F.col("node").alias(subj_col), F.col("canon").alias("__subj_canon")
    )
    obj_map = changed.select(
        F.col("node").alias(obj_col), F.col("canon").alias("__obj_canon")
    )
    data = triples.filter(F.col(pred_col) != sameas_pred)
    return (
        data.join(subj_map, subj_col, "left")
        .join(obj_map, obj_col, "left")
        .select(
            F.coalesce("__subj_canon", F.col(subj_col)).alias(subj_col),
            F.col(pred_col),
            F.coalesce("__obj_canon", F.col(obj_col)).alias(obj_col),
        )
        .distinct()
    )


def schema_profile(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Schema discovery over instance triples -> one row per predicate:
    ``(pred, n, n_subj, n_obj, max_out_fan, max_in_fan, functional,
    inverse_functional)``.  The profile a KG pipeline runs BEFORE
    declaring schema (the owl.py property classes are assertions; this
    measures what the data actually satisfies): a predicate whose
    max_out_fan is 1 behaves functionally, max_in_fan 1 inverse-
    functionally — candidate inputs for :func:`owl.functional_sameas`
    — and the fan maxima are exactly the skew numbers a partitioning
    plan needs (a pred with max_in_fan ~ |V| is a hub/boilerplate key
    that wants salting before any (pred, obj)-keyed join).

    All exact integers over the DISTINCT triple set (RDF set
    semantics): two keyed partial aggregations + one per-pred rollup,
    never wider than the data, no driver collection.
    """
    t = (
        triples.select(
            F.col(subj_col).alias("subj"),
            F.col(pred_col).alias("pred"),
            F.col(obj_col).alias("obj"),
        )
        .distinct()
    )
    out_fan = t.groupBy("pred", "subj").agg(
        F.count(F.lit(1)).cast("long").alias("fan")
    )
    in_fan = t.groupBy("pred", "obj").agg(
        F.count(F.lit(1)).cast("long").alias("fan")
    )
    o = out_fan.groupBy("pred").agg(
        F.sum("fan").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_subj"),
        F.max("fan").cast("long").alias("max_out_fan"),
    )
    i = in_fan.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_obj"),
        F.max("fan").cast("long").alias("max_in_fan"),
    )
    return o.join(i, "pred").select(
        "pred",
        "n",
        "n_subj",
        "n_obj",
        "max_out_fan",
        "max_in_fan",
        (F.col("max_out_fan") == 1).alias("functional"),
        (F.col("max_in_fan") == 1).alias("inverse_functional"),
    )
