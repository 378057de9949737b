"""XML segmentation: element trees as offset segments.

The reference ships an ElementTree-hooking parser that stamps spans on
every element (``pawpaw/xml/xml_parser.py:12-190``; descriptor taxonomy
``pawpaw/xml/descriptors.py``). That implementation breaks on
CPython >= 3.11 (SURVEY.md §5), so this is a clean reimplementation:
expat byte offsets -> char offsets via a vectorized UTF-8
continuation-byte map, attribute/tag sub-spans via local regex within
the start tag. Runs per-row inside mapInPandas like every other rule.

Descriptors (matching the reference taxonomy): element, start_tag, tag,
name, attributes, attribute, key, value, text, end_tag, comment, pi.
"""

from __future__ import annotations

import re as _stdre
from typing import Iterator
from xml.parsers import expat

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pawpaw_spark.operators.segment import doc_id_col
from pawpaw_spark.schemas import SEGMENT_DDL

_ATTR_RE = _stdre.compile(r'(?P<key>[\w:.\-]+)\s*=\s*(?P<q>["\'])(?P<value>.*?)(?P=q)', _stdre.S)
_NAME_RE = _stdre.compile(r"<\s*(?P<name>[\w:.\-]+)")
# start-tag extent: '>' outside quoted attribute values
_TAG_RE = _stdre.compile(r"<(?:[^>\"']|\"[^\"]*\"|'[^']*')*>", _stdre.S)

_SEG_COLS = [
    "doc_id", "seg_id", "parent_id", "start", "stop", "desc", "depth",
    "rule_tag", "value", "path", "n_children", "sibling_idx", "dfs_idx",
]


def _byte_to_char_map(data: bytes) -> np.ndarray:
    """byte offset -> char offset, vectorized over UTF-8 continuation bytes."""
    arr = np.frombuffer(data, dtype=np.uint8)
    starts = (arr & 0xC0) != 0x80
    return np.cumsum(starts) - 1


class _Collector:
    """Builds segment records with parent indices during the expat walk."""

    def __init__(self, text: str, b2c: np.ndarray):
        self.text = text
        self.b2c = b2c
        self.n_bytes = len(b2c)
        # (start, stop, desc, parent_idx, depth) — stop patched on close
        self.recs: list[list] = [[0, len(text), "$doc", -1, 0]]
        self.stack: list[int] = [0]
        self.self_closed: set[int] = set()

    def char(self, byte_idx: int) -> int:
        if byte_idx >= self.n_bytes:
            return len(self.text)
        return int(self.b2c[byte_idx])

    def add(self, start: int, stop: int, desc: str, parent: int) -> int:
        depth = self.recs[parent][4] + 1
        self.recs.append([start, stop, desc, parent, depth])
        return len(self.recs) - 1

    # --- expat handlers ---------------------------------------------------

    def start_element(self, parser, name, attrs) -> None:
        c0 = self.char(parser.CurrentByteIndex)
        m = _TAG_RE.match(self.text, c0)
        tag_stop = m.end() if m else self.text.index(">", c0) + 1
        elem = self.add(c0, -1, "element", self.stack[-1])  # stop patched at end
        if self.text.startswith("/>", tag_stop - 2):
            # self-closing: expat's end event reports the byte index PAST
            # the token (which may coincide with a following real end
            # tag), so the extent must be fixed here, not on close
            self.recs[elem][1] = tag_stop
            self.self_closed.add(elem)
        st = self.add(c0, tag_stop, "start_tag", elem)
        tag_src = self.text[c0:tag_stop]
        nm = _NAME_RE.match(tag_src)
        if nm:
            t0, t1 = c0 + nm.start("name"), c0 + nm.end("name")
            tag = self.add(t0, t1, "tag", st)
            qname = tag_src[nm.start("name") : nm.end("name")]
            if ":" in qname:
                cut = t0 + qname.index(":")
                self.add(t0, cut, "namespace", tag)
                self.add(cut + 1, t1, "name", tag)
            else:
                self.add(t0, t1, "name", tag)
        first_attr = None
        for m in _ATTR_RE.finditer(tag_src):
            if first_attr is None:
                first_attr = self.add(
                    c0 + m.start(), -2, "attributes", st
                )  # stop patched after loop
            a = self.add(c0 + m.start(), c0 + m.end(), "attribute", first_attr)
            self.add(c0 + m.start("key"), c0 + m.end("key"), "key", a)
            self.add(c0 + m.start("value"), c0 + m.end("value"), "value", a)
            last_attr_end = c0 + m.end()
        if first_attr is not None:
            self.recs[first_attr][1] = last_attr_end
        self.stack.append(elem)

    def end_element(self, parser, name) -> None:
        elem = self.stack.pop()
        if elem in self.self_closed:
            return  # extent already set in start_element
        c0 = self.char(parser.CurrentByteIndex)
        gt = self.text.index(">", c0)
        self.recs[elem][1] = gt + 1
        self.add(c0, gt + 1, "end_tag", elem)

    def character_data(self, parser, data) -> None:
        if not data.strip():
            return
        c0 = self.char(parser.CurrentByteIndex)
        self.add(c0, c0 + len(data), "text", self.stack[-1])

    def comment(self, parser, data) -> None:
        c0 = self.char(parser.CurrentByteIndex)
        stop = self.text.index("-->", c0) + 3
        self.add(c0, stop, "comment", self.stack[-1])

    def pi(self, parser, target, data) -> None:
        c0 = self.char(parser.CurrentByteIndex)
        stop = self.text.index("?>", c0) + 2
        self.add(c0, stop, "pi", self.stack[-1])


def xml_segment_records(doc_id: str, text: str, include_root: bool = False) -> list[dict]:
    data = text.encode("utf-8")
    col = _Collector(text, _byte_to_char_map(data))
    parser = expat.ParserCreate("utf-8")
    parser.StartElementHandler = lambda n, a: col.start_element(parser, n, a)
    parser.EndElementHandler = lambda n: col.end_element(parser, n)
    parser.CharacterDataHandler = lambda d: col.character_data(parser, d)
    parser.CommentHandler = lambda d: col.comment(parser, d)
    parser.ProcessingInstructionHandler = lambda t, d: col.pi(parser, t, d)
    parser.Parse(data, True)

    from pawpaw_spark.kernel import tree_indexes

    recs = [tuple(r) + ("xml",) for r in col.recs]
    # reshape to kernel SegRecord (start, stop, desc, parent, depth, tag)
    segs = [(r[0], r[1], r[2], r[3], r[4], "xml") for r in recs]
    paths, n_children, sibling_idx, dfs_idx = tree_indexes(segs)
    rows = []
    for seg_id, (start, stop, desc, parent_idx, depth, tag) in enumerate(segs):
        if seg_id == 0 and not include_root:
            continue
        rows.append(
            {
                "doc_id": doc_id,
                "seg_id": seg_id,
                "parent_id": parent_idx if parent_idx >= 0 else None,
                "start": start,
                "stop": stop,
                "desc": desc,
                "depth": depth,
                "rule_tag": tag,
                "value": None,
                "path": paths[seg_id],
                "n_children": n_children[seg_id],
                "sibling_idx": sibling_idx[seg_id],
                "dfs_idx": dfs_idx[seg_id],
            }
        )
    return rows


def xml_spans(text: str, start: int, stop: int):
    """Kernel ``custom``-rule adapter: structural XML spans as
    ``(start, stop, desc)`` triples (absolute offsets), for use inside
    the one-pass segmentation kernel via ``rules.custom(xml_spans)``.

    Parentage is recovered by the kernel's containment stack; XML
    element nesting is strict span containment, and the intra-record
    equal-span ties (element/start_tag of a childless self-closing
    element, tag/name without namespace, attributes/attribute for a
    single attribute) resolve correctly because emission order is
    parent-first and the containment sort is stable. Differentially
    tested against :func:`xml_segment_records` (tests/test_xml.py).

    Malformed XML yields no spans (the doc still carries its root
    segment; pipeline lineage counts surface the skip)."""
    sub = text[start:stop]
    data = sub.encode("utf-8")
    col = _Collector(sub, _byte_to_char_map(data))
    parser = expat.ParserCreate("utf-8")
    parser.StartElementHandler = lambda n, a: col.start_element(parser, n, a)
    parser.EndElementHandler = lambda n: col.end_element(parser, n)
    parser.CharacterDataHandler = lambda d: col.character_data(parser, d)
    parser.CommentHandler = lambda d: col.comment(parser, d)
    parser.ProcessingInstructionHandler = lambda t, d: col.pi(parser, t, d)
    try:
        parser.Parse(data, True)
    except expat.ExpatError:
        return []
    return [(r[0] + start, r[1] + start, r[2]) for r in col.recs[1:]]


def segment_xml(df: DataFrame, text_col: str = "content", include_root: bool = False) -> DataFrame:
    """XML-aware segmentation pass (same output schema as segment())."""
    src = df.select(doc_id_col(df).alias("__doc_id"), F.col(text_col).alias("__text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for did, text in zip(pdf["__doc_id"].values, pdf["__text"].values):
                if text is None:
                    continue
                try:
                    rows.extend(xml_segment_records(str(did), str(text), include_root))
                except Exception:
                    continue  # malformed XML: skip doc (lineage counts catch it)
            if rows:
                yield pd.DataFrame(rows, columns=_SEG_COLS)

    return src.mapInPandas(run, schema=SEGMENT_DDL)
