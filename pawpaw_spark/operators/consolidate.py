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
* ``consolidate``    — generic per-doc stream transform
  (``Postorator.wrap``, ``arborform/postorator/postorator.py:8-12``).

Execution: the sequential consume semantics run per doc on executors
while Spark parallelizes across docs. Two physical modes:

* default — ``groupBy(doc_id).applyInPandas`` (one shuffle; correct for
  any input distribution);
* ``partition_local=True`` — ``mapInPandas`` that re-chunks each
  partition's rows by doc across Arrow-batch boundaries. Valid ONLY
  when each doc's rows are contiguous within one partition — which is
  exactly what ``segment()`` emits — and saves the shuffle entirely.

Predicates/reducers are plain Python callables over row dicts (they
ship in the UDF closure). Streams are ordered by document order
(dfs_idx when present, else (start, -stop)) — the order the reference's
generators yield in.
"""

from __future__ import annotations

from typing import Callable, Iterator, Mapping, Sequence

import pandas as pd
from pyspark.sql import DataFrame

Row = Mapping[str, object]

_OUT_DDL = (
    "doc_id string, start long, stop long, desc string, n_merged int, ord long"
)
_OUT_COLS = ["doc_id", "start", "stop", "desc", "n_merged", "ord"]


def _stream_columns(df: DataFrame) -> list[str]:
    keep = ["doc_id", "start", "stop", "desc"]
    for opt in ("seg_id", "dfs_idx", "value", "rule_tag"):
        if opt in df.columns:
            keep.append(opt)
    return keep


def _sort_rows(rows: list[dict]) -> list[dict]:
    if rows and "dfs_idx" in rows[0]:
        return sorted(rows, key=lambda r: r["dfs_idx"])
    return sorted(rows, key=lambda r: (r["start"], -r["stop"]))


def _execute(
    segments: DataFrame,
    doc_fn: Callable[[str, list[dict]], list[tuple]],
    partition_local: bool,
) -> DataFrame:
    """Run ``doc_fn(doc_id, ordered_rows) -> [(start, stop, desc,
    n_merged), ...]`` per document, in either physical mode."""
    src = segments.select(*_stream_columns(segments))

    def _dict_rows(pdf: pd.DataFrame) -> list[dict]:
        # DataFrame.to_dict('records') is ~2.5x slower than zipping
        # column lists (measured at 271k rows) — this conversion is the
        # per-batch hot path of both physical modes
        cols = list(pdf.columns)
        return [dict(zip(cols, t)) for t in zip(*(pdf[c].tolist() for c in cols))]

    def run_doc(doc: str, rows: list[dict], out: list[tuple]) -> None:
        res = doc_fn(doc, _sort_rows(rows))
        out.extend(
            (doc, a, b, d, n, i + 1) for i, (a, b, d, n) in enumerate(res)
        )

    if partition_local:

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cur: str | None = None
            buf: list[dict] = []
            out: list[tuple] = []
            for pdf in batches:
                for r in _dict_rows(pdf):
                    if r["doc_id"] != cur:
                        if buf:
                            run_doc(cur, buf, out)
                        cur, buf = r["doc_id"], []
                    buf.append(r)
                if len(out) > 50000:
                    yield pd.DataFrame(out, columns=_OUT_COLS)
                    out = []
            if buf:
                run_doc(cur, buf, out)
            if out:
                yield pd.DataFrame(out, columns=_OUT_COLS)

        return src.mapInPandas(run, schema=_OUT_DDL)

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = _dict_rows(pdf)
        out: list[tuple] = []
        if rows:
            run_doc(rows[0]["doc_id"], rows, out)
        return pd.DataFrame(out, columns=_OUT_COLS)

    return src.groupBy("doc_id").applyInPandas(run_group, schema=_OUT_DDL)


def consolidate(
    segments: DataFrame,
    fn: Callable[[Sequence[Row]], Sequence[Row]],
    partition_local: bool = False,
) -> DataFrame:
    """Generic per-document stream consolidation (Postorator.wrap):
    ``fn`` receives the doc's segments as ordered row dicts and returns
    the consolidated rows ({'start','stop','desc'} + optional
    'n_merged')."""

    def doc_fn(doc: str, rows: list[dict]) -> list[tuple]:
        return [
            (r["start"], r["stop"], r.get("desc"), r.get("n_merged", 1))
            for r in fn(rows)
        ]

    return _execute(segments, doc_fn, partition_local)


def windowed_join(
    segments: DataFrame,
    window_size: int,
    predicate: Callable[[Sequence[Row]], bool],
    desc: str | None = None,
    partition_local: bool = False,
) -> DataFrame:
    """Merge every accepting k-window into one covering segment.

    Emitted rows: merged windows carry ``n_merged = k`` and the
    min-start/max-stop covering span (``Ito.join`` semantics,
    ``pawpaw/ito.py:766-801``); pass-through rows carry ``n_merged = 1``
    and their original desc.
    """
    if window_size < 2:
        raise ValueError("window_size must be >= 2")

    def doc_fn(doc: str, rows: list[dict]) -> list[tuple]:
        out: list[tuple] = []
        window: list[Row] = []
        for r in rows:
            window.append(r)
            if len(window) == window_size:
                if predicate(window):
                    out.append(
                        (min(w["start"] for w in window),
                         max(w["stop"] for w in window), desc, window_size)
                    )
                    window.clear()
                else:
                    w0 = window.pop(0)
                    out.append((w0["start"], w0["stop"], w0["desc"], 1))
        for w in window:
            out.append((w["start"], w["stop"], w["desc"], 1))
        return out

    return _execute(segments, doc_fn, partition_local)


def stacked_reduce(
    segments: DataFrame,
    reduce_func: Callable[[Sequence[Row]], Row],
    push_predicate: Callable[[Sequence[Row], Row], bool],
    pop_predicate: Callable[[Sequence[Row], Row], bool] | None = None,
    partition_local: bool = False,
) -> DataFrame:
    """Stack aggregation with explicit push/pop predicates.

    ``reduce_func(stack) -> {'start','stop','desc'}`` folds a closed
    group; rows that never open a group pass through unchanged. The
    exact event order (pop-check before push-check, trailing stack
    reduced at stream end) mirrors the reference transform.
    """

    def doc_fn(doc: str, rows: list[dict]) -> list[tuple]:
        out: list[tuple] = []
        stack: list[Row] = []

        def emit_reduced() -> None:
            red = reduce_func(stack)
            out.append((red["start"], red["stop"], red.get("desc"), len(stack)))

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
                    out.append((r["start"], r["stop"], r["desc"], 1))
        if stack:
            emit_reduced()
        return out

    return _execute(segments, doc_fn, partition_local)
