"""pawpaw JSON interchange codec (reference ``ito.py:423-512``).

The reference defines a JSON form for Ito trees — optionally
"stringless" (offsets only, the string re-injected at decode time),
which is its own argument that offset rows are a faithful at-rest
representation. These helpers let users round-trip segment tables
between this engine and pawpaw:

* :func:`segments_to_pawpaw_json` — segments rows -> one JSON document
  per doc, decodable by the reference's ``Ito.JsonDecoderHook``.
* :func:`from_pawpaw_json` — pawpaw-encoded JSON -> segments rows.

Wire format (``Ito.JsonEncoder``/``_ItoEncoder``): ``__type__`` =
``pawpaw.ito.Ito``, ``__version__``, optional ``string``, ``path``
(plumule path from the tree root to the focused ito; we always emit the
root, so ``.``), and ``ito`` = recursive ``{span: [start, stop], desc,
children: [...]}`` with children in span order. The reference decoder
requires an exact ``__version__`` match, so exports are stamped with
the interchange version below.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# the pawpaw release whose decoder this interchange form targets
PAWPAW_VERSION = "1.0.2"
_JS_TYPE = "pawpaw.ito.Ito"

_JSON_DDL = "doc_id string, json string"
_SEG_DDL = (
    "doc_id string, seg_id long, parent_id long, start long, stop long, "
    "desc string, depth int"
)
_SEG_COLS = ["doc_id", "seg_id", "parent_id", "start", "stop", "desc", "depth"]


def _rows_to_ito_dict(rows: list[dict]) -> dict | None:
    """Rebuild the nested ito dict from flat (seg_id, parent_id, span)
    rows. Children are emitted span-sorted ((start, -stop)), matching
    ChildItos order."""
    by_id = {r["seg_id"]: r for r in rows}
    kids: dict[object, list] = {r["seg_id"]: [] for r in rows}
    roots = []
    for r in rows:
        p = r.get("parent_id")
        if p is not None and p in by_id:
            kids[p].append(r)
        else:
            roots.append(r)
    if not roots:
        return None

    def build(r: dict) -> dict:
        cs = sorted(kids[r["seg_id"]], key=lambda c: (c["start"], -c["stop"]))
        return {
            "span": [int(r["start"]), int(r["stop"])],
            "desc": r["desc"],
            "children": [build(c) for c in cs],
        }

    if len(roots) == 1:
        return build(roots[0])
    # no explicit root row: synthesize one covering the forest (desc None)
    return {
        "span": [
            min(int(r["start"]) for r in roots),
            max(int(r["stop"]) for r in roots),
        ],
        "desc": None,
        "children": [build(r) for r in sorted(roots, key=lambda c: (c["start"], -c["stop"]))],
    }


def _encode_doc(rows: list[dict], stringless: bool) -> str | None:
    ito = _rows_to_ito_dict(rows)
    if ito is None:
        return None
    payload: dict = {"__type__": _JS_TYPE, "__version__": PAWPAW_VERSION}
    if not stringless:
        payload["string"] = rows[0].get("__text")
    payload["path"] = "."
    payload["ito"] = ito
    return json.dumps(payload)


def segments_to_pawpaw_json(
    segments: DataFrame,
    stringless: bool = True,
    source: DataFrame | None = None,
    text_col: str = "content",
    partition_local: bool = False,
) -> DataFrame:
    """(doc_id, json) — one pawpaw-decodable JSON document per doc.

    ``stringless=True`` (default) keeps the export offsets-only; pass
    ``stringless=False`` with ``source`` (doc_id, content) to embed the
    text.

    Physical modes (same contract as the consolidation operators):
    default = ``groupBy(doc).applyInPandas`` (one shuffle, correct for
    any row distribution); ``partition_local=True`` = ``mapInPandas``
    re-chunking each partition's rows by doc — valid ONLY when each
    doc's rows are contiguous within one partition (exactly what
    ``segment()`` emits), and skips both the shuffle and the per-group
    pandas-frame overhead (measured 9 s -> ~2 s at sf0.1 for 5000 docs).
    """
    cols = [c for c in _SEG_COLS if c in segments.columns]
    src = segments.select(*cols)
    if not stringless:
        if source is None:
            raise ValueError("stringless=False requires the source DataFrame")
        src = src.join(
            source.selectExpr("doc_id", f"{text_col} as __text"), "doc_id", "left"
        )

    if partition_local:

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cur = None
            buf: list[dict] = []
            out_docs: list[str] = []
            out_json: list[str] = []

            def flush():
                if buf:
                    js = _encode_doc(buf, stringless)
                    if js is not None:
                        out_docs.append(cur)
                        out_json.append(js)

            for pdf in batches:
                colnames = list(pdf.columns)
                for t in zip(*(pdf[c].tolist() for c in colnames)):
                    r = dict(zip(colnames, t))
                    if r["doc_id"] != cur:
                        flush()
                        cur, buf = r["doc_id"], []
                    buf.append(r)
                if len(out_docs) > 2000:
                    yield pd.DataFrame({"doc_id": out_docs, "json": out_json})
                    out_docs, out_json = [], []
            flush()
            if out_docs:
                yield pd.DataFrame({"doc_id": out_docs, "json": out_json})

        return src.mapInPandas(run, schema=_JSON_DDL)

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = pdf.to_dict("records")
        doc = rows[0]["doc_id"]
        js = _encode_doc(rows, stringless)
        if js is None:
            return pd.DataFrame(columns=["doc_id", "json"])
        return pd.DataFrame({"doc_id": [doc], "json": [js]})

    return src.groupBy("doc_id").applyInPandas(encode, schema=_JSON_DDL)


def _require_pawpaw(pawpaw_path: str | None = None):
    """Optional interop dependency: building pickle streams that
    unpickle as ``pawpaw.Ito`` requires the public ``pawpaw`` package
    importable on the executors (pip install pawpaw, or pass its path —
    driver sys.path does not propagate to python workers). The engine
    itself never depends on it — only these two interop sinks do."""
    import sys as _sys

    if pawpaw_path and pawpaw_path not in _sys.path:
        # APPEND, never prepend: python workers are reused across jobs,
        # and a checkout of pawpaw ships sibling packages (tests/, docs
        # helpers) that would otherwise shadow same-named modules for
        # every later task in the worker's lifetime
        _sys.path.append(pawpaw_path)
    try:
        from pawpaw import Ito  # noqa: F401

        return Ito
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "segments_to_pickle/from_pickle need the public 'pawpaw' package "
            "(pip install pawpaw) available to the Spark executors"
        ) from exc


def segments_to_pickle(
    segments: DataFrame,
    source: DataFrame,
    text_col: str = "content",
    pawpaw_path: str | None = None,
) -> DataFrame:
    """(doc_id, pkl: binary) — one pickled ``pawpaw.Ito`` tree per doc
    (the reference's ``__getstate__`` surface, ``ito.py:404-421``).
    Unlike the JSON form, pickle always carries the string (that is the
    reference's pickle contract), so the source table is required."""
    cols = [c for c in _SEG_COLS if c in segments.columns]
    src = segments.select(*cols).join(
        source.selectExpr("doc_id", f"{text_col} as __text"), "doc_id", "left"
    )

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        import pickle

        Ito = _require_pawpaw(pawpaw_path)
        rows = pdf.to_dict("records")
        doc = rows[0]["doc_id"]
        text = rows[0].get("__text") or ""
        by_id = {r["seg_id"]: r for r in rows}
        kids: dict[object, list] = {r["seg_id"]: [] for r in rows}
        roots = []
        for r in rows:
            p = r.get("parent_id")
            (kids[p] if p is not None and p in by_id else roots).append(r)

        def build(r):
            ito = Ito(text, int(r["start"]), int(r["stop"]), r["desc"])
            for c in sorted(kids[r["seg_id"]], key=lambda c: (c["start"], -c["stop"])):
                ito.children.add(build(c))
            return ito

        if len(roots) == 1:
            tree = build(roots[0])
        else:
            tree = Ito(text, desc=None)
            for r in sorted(roots, key=lambda c: (c["start"], -c["stop"])):
                tree.children.add(build(r))
        return pd.DataFrame({"doc_id": [doc], "pkl": [pickle.dumps(tree)]})

    return src.groupBy("doc_id").applyInPandas(encode, schema="doc_id string, pkl binary")


def from_pickle(
    pdf_in: DataFrame, pkl_col: str = "pkl", id_col: str = "doc_id",
    pawpaw_path: str | None = None,
) -> DataFrame:
    """Pickled ``pawpaw.Ito`` trees -> segments rows (pre-order DFS)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pickle

        _require_pawpaw(pawpaw_path)
        for pdf in batches:
            out = {c: [] for c in _SEG_COLS}
            for doc, blob in zip(pdf[id_col].values, pdf[pkl_col].values):
                tree = pickle.loads(bytes(blob))
                stack = [(tree, None, 0)]
                next_id = 0
                while stack:
                    node, parent, depth = stack.pop()
                    sid = next_id
                    next_id += 1
                    out["doc_id"].append(str(doc))
                    out["seg_id"].append(sid)
                    out["parent_id"].append(parent)
                    out["start"].append(int(node.start))
                    out["stop"].append(int(node.stop))
                    out["desc"].append(node.desc)
                    out["depth"].append(depth)
                    for c in reversed(list(node.children)):
                        stack.append((c, sid, depth + 1))
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return pdf_in.mapInPandas(decode, schema=_SEG_DDL)


def from_pawpaw_json(
    jdf: DataFrame, json_col: str = "json", id_col: str = "doc_id"
) -> DataFrame:
    """pawpaw-encoded JSON -> segments rows (seg_id = pre-order DFS
    index, the document order the reference's tree walk yields)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in _SEG_COLS}
            for doc, js in zip(pdf[id_col].values, pdf[json_col].values):
                obj = json.loads(js)
                if obj.get("__type__") != _JS_TYPE:
                    continue
                stack = [(obj["ito"], None, 0)]
                next_id = 0
                # iterative pre-order, children already span-ordered
                while stack:
                    node, parent, depth = stack.pop()
                    sid = next_id
                    next_id += 1
                    out["doc_id"].append(str(doc))
                    out["seg_id"].append(sid)
                    out["parent_id"].append(parent)
                    out["start"].append(int(node["span"][0]))
                    out["stop"].append(int(node["span"][1]))
                    out["desc"].append(node.get("desc"))
                    out["depth"].append(depth)
                    for c in reversed(node.get("children") or []):
                        stack.append((c, sid, depth + 1))
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return jdf.mapInPandas(decode, schema=_SEG_DDL)
