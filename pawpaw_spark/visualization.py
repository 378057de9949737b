"""Debug visualization surface — the reference's remaining pepo dumpers
(``Compact``/``Xml``/``Json``) and console ``Highlighter``
(``pawpaw/visualization/pepo/pepo.py:39-189``,
``visualization/highlighter.py:8-50``) over segment rows.

Like :func:`pawpaw_spark.plans.tree.tree_dump` (the Tree pepo), these
are DEBUG surfaces: they collect ONE document's segments to the driver
by design and render char-compatible output (parity-tested against the
reference dumpers in tests/test_visualization.py). Not a data-plane
path — corpus-scale reporting goes through
:func:`pawpaw_spark.functions.format.format_segments`.
"""

from __future__ import annotations

import json as _json
import os
from typing import Callable, Iterable
from xml.sax.saxutils import escape as _xml_escape

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pawpaw_spark.functions.format import parse_format, render

_LINESEP = os.linesep

# the reference Compact/Tree format string (pepo.py:41)
_COMPACT_FSTR = "%span %desc!r : '%substr!1r1:40…% '"


def _collect_doc(segments: DataFrame, doc_id: str):
    rows = sorted(
        (r.asDict() for r in segments.filter(F.col("doc_id") == doc_id).collect()),
        key=lambda r: r["seg_id"],
    )
    by_id = {r["seg_id"]: r for r in rows}
    kids: dict[object, list] = {}
    for r in rows:
        p = r["parent_id"] if r["parent_id"] in by_id else None
        kids.setdefault(p, []).append(r)
    for v in kids.values():
        v.sort(key=lambda r: (r["start"], -r["stop"]))
    return by_id, kids


def _children(kids, r):
    return kids.get(r["seg_id"], [])


def compact_dump(
    segments: DataFrame,
    text_by_doc: dict[str, str],
    doc_id: str,
    indent: str = "    ",
    children: bool = True,
) -> str:
    """Reference ``Compact`` pepo: ``index: (span) 'desc' : 'substr'``
    rows, children indented one level, enumerated from 1 per level."""
    text = text_by_doc[doc_id]
    by_id, kids = _collect_doc(segments, doc_id)
    pieces = parse_format(_COMPACT_FSTR)
    out: list[str] = []

    def fmt(r) -> str:
        return render(
            pieces, r["start"], r["stop"], r["desc"],
            substr=text[r["start"] : r["stop"]],
        )

    def emit(r, index: int, level: int) -> None:
        out.append(f"{indent * level}{index:,}: {fmt(r)}{_LINESEP}")
        if children:
            for i, c in enumerate(_children(kids, r), start=1):
                emit(c, i, level + 1)

    for i, r in enumerate(kids.get(None, []), start=1):
        emit(r, i, 0)
    return "".join(out)


def xml_dump(
    segments: DataFrame,
    text_by_doc: dict[str, str],
    doc_id: str,
    indent: str = "    ",
    children: bool = True,
) -> str:
    """Reference ``Xml`` pepo (pepo.py:95-130), char-compatible —
    including its quirks (the ``</ito>`` de-dent and the unclosed
    trailing ``<itos>``), so goldens diff cleanly across engines."""
    text = text_by_doc[doc_id]
    by_id, kids = _collect_doc(segments, doc_id)
    out: list[str] = []

    def emit(r, level: int) -> None:
        out.append(f"{level * indent}<ito")
        out.append(f' start="{r["start"]}"')
        out.append(f' stop="{r["stop"]}"')
        out.append(f' desc="{_xml_escape(r["desc"] or "")}">')
        out.append(_LINESEP)
        out.append(f"{level * indent}<substring>")
        out.append(_xml_escape(text[r["start"] : r["stop"]]))
        out.append(f"</substring>{_LINESEP}")
        cs = _children(kids, r)
        if children and cs:
            out.append(f"{level * indent}<children>{_LINESEP}")
            for c in cs:
                emit(c, level + 1)
            out.append(f"{level * indent}</children>{_LINESEP}")
        out.append(f"{(level - 1) * indent}</ito>{_LINESEP}")

    out.append(f'<?xml version="1.0" encoding="UTF-8" ?>{_LINESEP}')
    out.append(f"<itos>{_LINESEP}")
    for r in kids.get(None, []):
        emit(r, 1)
    out.append(f"<itos>{_LINESEP}")
    return "".join(out)


def json_dump(
    segments: DataFrame,
    text_by_doc: dict[str, str],
    doc_id: str,
    indent: str = "    ",
    children: bool = True,
) -> str:
    """Reference ``Json`` pepo (pepo.py:133-189), char-compatible."""
    text = text_by_doc[doc_id]
    by_id, kids = _collect_doc(segments, doc_id)
    out: list[str] = []

    def emit(r, level: int) -> None:
        out.append(level * indent + "{" + _LINESEP)
        level += 1
        out.append(f'{level * indent}"start": {r["start"]},{_LINESEP}')
        out.append(f'{level * indent}"stop": {r["stop"]},{_LINESEP}')
        desc = "null" if r["desc"] is None else _json.encoder.encode_basestring(r["desc"])
        out.append(f'{level * indent}"desc": {desc},{_LINESEP}')
        substr = _json.encoder.encode_basestring(text[r["start"] : r["stop"]])
        out.append(f'{level * indent}"substr": {substr},{_LINESEP}')
        if children:
            out.append(f'{level * indent}"children": [')
            cs = _children(kids, r)
            if not cs:
                out.append(f"]{_LINESEP}")
            else:
                out.append(_LINESEP)
                level += 1
                for i, c in enumerate(cs):
                    emit(c, level)
                    if i < len(cs) - 1:
                        out.append(",")
                    out.append(_LINESEP)
                level -= 1
                out.append(f"{level * indent}]{_LINESEP}")
        level -= 1
        out.append(level * indent + "}")

    out.append("{" + _LINESEP)
    out.append(f'{indent}"itos": [')
    first = True
    for r in kids.get(None, []):
        if not first:
            out.append(",")
        out.append(_LINESEP)
        emit(r, 2)
        first = False
    out.append(_LINESEP)
    out.append(indent + "]" + _LINESEP)
    out.append("}" + _LINESEP)
    return "".join(out)


BACK_RESET = "\x1b[49m"


def highlight(
    segments: DataFrame,
    text_by_doc: dict[str, str],
    doc_id: str,
    palette: Iterable[str],
    predicate: Callable[[dict], bool] = lambda r: True,
    reset: str = BACK_RESET,
) -> str:
    """Reference console ``Highlighter``: in-order walk over the tree,
    each uncovered stretch of a segment's text wrapped in the next
    background color from the cycled palette (color advances per
    composed chunk, so any segment boundary is a color change).
    ``palette`` entries are SGR prefix strings (e.g. ``"\\x1b[48;5;17m"``)."""
    import itertools

    text = text_by_doc[doc_id]
    by_id, kids = _collect_doc(segments, doc_id)
    it_back = itertools.cycle(list(palette))
    out: list[str] = []

    def compose(r, a: int, b: int) -> None:
        if predicate(r):
            out.append(f"{next(it_back)}{text[a:b]}{reset}")
        else:
            out.append(text[a:b])

    def walk(r) -> None:
        last = r["start"]
        for c in _children(kids, r):
            if last < c["start"]:
                compose(r, last, c["start"])
            walk(c)
            last = c["stop"]
        if last < r["stop"]:
            compose(r, last, r["stop"])

    for r in kids.get(None, []):
        walk(r)
    return "".join(out)
