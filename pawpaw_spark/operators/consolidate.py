"""Order-dependent stream consolidation operators.

Batch forms of the reference's two postorators, which are the only
order-sensitive consume-on-match operators in pawpaw and therefore not
window-function-expressible in general (SURVEY.md §2.4-2.5):

* ``windowed_join``  — sliding window of k consecutive segments; when
  the predicate accepts the full window, merge it into one covering
  segment and restart; else emit the oldest
  (behavior spec: ``pawpaw/arborform/postorator/windowed_join.py:36-47``).
* ``stacked_reduce`` — stack-based sessionization: push_predicate opens
  a group, pop_predicate closes+reduces it, non-members pass through
  (behavior spec: ``pawpaw/arborform/postorator/stacked_reduce.py:33-49``).

Execution: ``applyInPandas`` per document — the sequential consume
semantics run per doc on executors while Spark parallelizes across
docs. Predicates/reducers are plain Python callables over row dicts
(they ship in the UDF closure). The streams are ordered by document
order (dfs_idx when present, else (start, -stop)) — the order the
reference's generators yield in.
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Row = Mapping[str, object]

_OUT_DDL = (
    "doc_id string, start long, stop long, desc string, n_merged int, ord long"
)


def _stream_columns(df: DataFrame) -> list[str]:
    keep = ["doc_id", "start", "stop", "desc"]
    for opt in ("seg_id", "dfs_idx", "value", "rule_tag"):
        if opt in df.columns:
            keep.append(opt)
    return keep


def _order_key(pdf: pd.DataFrame) -> pd.DataFrame:
    if "dfs_idx" in pdf.columns:
        return pdf.sort_values("dfs_idx", kind="mergesort")
    return pdf.sort_values(["start", "stop"], ascending=[True, False], kind="mergesort")


def consolidate(
    segments: DataFrame,
    fn: Callable[[Sequence[Row]], Sequence[Row]],
) -> DataFrame:
    """Generic per-document stream consolidation — the
    ``Postorator.wrap`` surface (``arborform/postorator/postorator.py:8-12``):
    ``fn`` receives the doc's segments as ordered row dicts and returns
    the consolidated rows ({'start','stop','desc'} + optional
    'n_merged')."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = _order_key(pdf)
        rows = pdf.to_dict("records")
        doc = rows[0]["doc_id"] if rows else None
        out = []
        for i, r in enumerate(fn(rows)):
            out.append(
                (doc, r["start"], r["stop"], r.get("desc"), r.get("n_merged", 1), i + 1)
            )
        return pd.DataFrame(
            out, columns=["doc_id", "start", "stop", "desc", "n_merged", "ord"]
        )

    src = segments.select(*_stream_columns(segments))
    return src.groupBy("doc_id").applyInPandas(run, schema=_OUT_DDL)


def windowed_join(
    segments: DataFrame,
    window_size: int,
    predicate: Callable[[Sequence[Row]], bool],
    desc: str | None = None,
) -> DataFrame:
    """Merge every accepting k-window into one covering segment.

    Emitted rows: merged windows carry ``n_merged = k`` and the
    min-start/max-stop covering span (``Ito.join`` semantics,
    ``pawpaw/ito.py:766-801``); pass-through rows carry ``n_merged = 1``
    and their original desc.
    """
    if window_size < 2:
        raise ValueError("window_size must be >= 2")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = _order_key(pdf)
        rows = pdf.to_dict("records")
        out: list[tuple] = []
        doc = rows[0]["doc_id"] if rows else None
        window: list[Row] = []
        for r in rows:
            window.append(r)
            if len(window) == window_size:
                if predicate(window):
                    out.append(
                        (doc, min(w["start"] for w in window),
                         max(w["stop"] for w in window), desc, window_size)
                    )
                    window.clear()
                else:
                    w0 = window.pop(0)
                    out.append((doc, w0["start"], w0["stop"], w0["desc"], 1))
        for w in window:
            out.append((doc, w["start"], w["stop"], w["desc"], 1))
        return pd.DataFrame(
            [(d, a, b, de, n, i + 1) for i, (d, a, b, de, n) in enumerate(out)],
            columns=["doc_id", "start", "stop", "desc", "n_merged", "ord"],
        )

    src = segments.select(*_stream_columns(segments))
    return src.groupBy("doc_id").applyInPandas(run, schema=_OUT_DDL)


def stacked_reduce(
    segments: DataFrame,
    reduce_func: Callable[[Sequence[Row]], Row],
    push_predicate: Callable[[Sequence[Row], Row], bool],
    pop_predicate: Callable[[Sequence[Row], Row], bool] | None = None,
) -> DataFrame:
    """Stack aggregation with explicit push/pop predicates.

    ``reduce_func(stack) -> {'start','stop','desc'}`` folds a closed
    group; rows that never open a group pass through unchanged. The
    exact event order (pop-check before push-check, trailing stack
    reduced at stream end) mirrors the reference transform.
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = _order_key(pdf)
        rows = pdf.to_dict("records")
        doc = rows[0]["doc_id"] if rows else None
        out: list[tuple] = []
        stack: list[Row] = []

        def emit_reduced() -> None:
            red = reduce_func(stack)
            out.append((doc, red["start"], red["stop"], red.get("desc"), len(stack)))

        for r in rows:
            if stack:
                if pop_predicate is not None and pop_predicate(stack, r):
                    emit_reduced()
                    stack.clear()
                else:
                    stack.append(r)
            if not stack:
                if push_predicate(stack, r):
                    stack.append(r)
                else:
                    out.append((doc, r["start"], r["stop"], r["desc"], 1))
        if stack:
            emit_reduced()
        return pd.DataFrame(
            [(d, a, b, de, n, i + 1) for i, (d, a, b, de, n) in enumerate(out)],
            columns=["doc_id", "start", "stop", "desc", "n_merged", "ord"],
        )

    src = segments.select(*_stream_columns(segments))
    return src.groupBy("doc_id").applyInPandas(run, schema=_OUT_DDL)
