"""Oracle-side mirrors, used by tests only.

``pawpaw_segments`` runs the *reference implementation* (imported from
/root/reference) over one document with an equivalent arborform
pipeline, producing (start, stop, desc, parent_idx, value) records in
the same shape as our kernel. ``derive_triples`` is the pure-python
spec of the triple derivation in
:mod:`pawpaw_spark.operators.triples`; applying it to pawpaw's own
segment output yields the reference triples for the P/R gate
(BASELINE.json north_star: P/R >= 0.95).
"""

from __future__ import annotations

from pawpaw_spark.rules import ROOT, BoundaryRetention, Rule, RuleSet


def _ref_itorator(pawpaw_ref, rule: Rule):
    import regex

    rx = regex.compile(rule.pattern, rule.flags)
    arbor = pawpaw_ref.arborform
    if rule.kind == "extract":
        if rule.group_filter is not None:
            itor = arbor.Extract(rx, limit=rule.limit, group_filter=rule.group_filter)
        else:
            itor = arbor.Extract(rx, limit=rule.limit)
        if rule.desc is not None:
            fixed = rule.desc
            itor.desc = lambda m, gk: fixed
        return itor
    if rule.kind == "split":
        return arbor.Split(
            rx,
            limit=rule.limit,
            boundary_retention=getattr(arbor.Split.BoundaryRetention, rule.retention.name),
            return_zero_split=rule.return_zero_split,
            desc=rule.desc,
        )
    if rule.kind == "gaps":
        return arbor.Invert(arbor.Extract(rx, desc=lambda m, gk: None, group_filter=(0,)), desc=rule.desc)
    raise NotImplementedError(rule.kind)


def pawpaw_tree(pawpaw_ref, text: str, rules: RuleSet):
    """Run the reference over one doc with the same rule program and
    return the root Ito. Chained rules are wired as Children.Add
    connectors on the segments whose desc matches ``on`` — exactly the
    arborform idiom the demos use."""
    root = pawpaw_ref.Ito(text, desc=ROOT)
    for rule in rules:
        # snapshot targets before mutation (rule never applies to own output)
        targets = [i for i in _walk(root) if rule.targets(i.desc)]
        if rule.kind == "custom":
            # Itorator.wrap + Children.AddHierarchical idiom: flat user
            # spans nested by the reference's own containment insert
            # (``ito.py:1546-1615``; equal spans nest in insertion order)
            for t in targets:
                itos = [
                    pawpaw_ref.Ito(text, s0, s1, desc)
                    for s0, s1, desc in rule.fn(text, t.start, t.stop)
                    if s0 < s1
                ]
                if itos:
                    t.children.add_hierarchical(*itos)
            continue
        itor = _ref_itorator(pawpaw_ref, rule)
        for t in targets:
            for produced in itor(t.clone(clone_children=False)):
                # re-root produced tree under t (same span basis string)
                _attach(t, produced)
    return root


def pawpaw_segments(pawpaw_ref, text: str, rules: RuleSet):
    """Kernel-shaped records (start, stop, desc, parent_idx, value)
    from a reference run; index 0 = the root."""
    root = pawpaw_tree(pawpaw_ref, text, rules)
    value_descs = {d for r in rules for d in r.value_for}

    records = []
    index_of = {}
    for i, ito in enumerate(_walk(root)):
        index_of[id(ito)] = i
        parent_idx = index_of.get(id(ito.parent), -1) if ito.parent is not None else -1
        value = text[ito.start : ito.stop] if ito.desc in value_descs else None
        records.append((ito.start, ito.stop, ito.desc, parent_idx, value))
    return records


def _walk(root):
    yield root
    for c in root.children:
        yield from _walk(c)


def _attach(parent, child) -> None:
    parent.children.add(child)


def derive_triples(doc_id: str, repo: str, records) -> set[tuple[str, str, str]]:
    """The triple-derivation spec. ``records`` = kernel-shaped tuples
    (start, stop, desc, parent_idx, value), index 0 = root."""
    triples = {(repo, "CONTAINS", doc_id)}
    for start, stop, desc, parent_idx, value in records[1:]:
        if desc is not None:
            triples.add((doc_id, "HAS_SEGMENT", f"{doc_id}#{start}-{stop}:{desc}"))
        if desc in ("def_name", "class_name") and value:
            triples.add((doc_id, "DEFINES", f"sym:{value}"))
        if desc == "import_name" and value:
            triples.add((doc_id, "REFERENCES", f"sym:{value}"))
    # call references: call_name -> enclosing def via parent chain
    for start, stop, desc, parent_idx, value in records[1:]:
        if desc == "call_name" and value and parent_idx >= 0:
            body = records[parent_idx]
            if body[2] == "def_body":
                block_idx = body[3]
                for r in records[1:]:
                    if r[3] == block_idx and r[2] == "def_name" and r[4]:
                        triples.add((f"sym:{r[4]}", "REFERENCES", f"sym:{value}"))
    return triples


def precision_recall(got: set, expected: set) -> tuple[float, float]:
    if not got and not expected:
        return 1.0, 1.0
    tp = len(got & expected)
    p = tp / len(got) if got else 0.0
    r = tp / len(expected) if expected else 0.0
    return p, r
