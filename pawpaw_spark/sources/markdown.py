"""Structural Markdown segmentation: heading-section trees.

The Markdown analog of :mod:`pawpaw_spark.sources.xml`: a custom kernel
rule (``rulesets.MARKDOWN_RULES``) that turns a document into nested
spans the containment stack assembles into a section TREE — the
reference's hierarchical-segmentation core applied to the grammar that
dominates real documentation corpora:

* ``md_heading``       — an ATX heading line (``#{1,6} title``);
* ``md_section_h<L>``  — from a level-L heading's first char to just
  before the next heading of level <= L (or the document end): the
  heading's whole subtree region, so h2 sections nest inside their h1
  section by plain span containment;
* ``md_fence``         — a fenced code block including its delimiter
  lines; an unclosed fence runs to the end.  Headings and items INSIDE
  a fence are literal text and emit nothing — which also guarantees a
  fence never straddles a section boundary;
* ``md_item``          — a bullet (``- ``/``* ``) or ordered
  (``1. ``) list-item line;
* ``md_link``          — an inline ``[text](target)`` link occurrence
  on any non-fence line, nested under its section/item by containment
  (the anchor-graph substrate: q_md_links derives LINKS_TO edges from
  these spans).

Pure offset arithmetic on the original text (zero-copy doctrine: spans
only, no substring materialization); runs inside the one-pass KG build
for ``lang='markdown'`` files via ``rulesets.LANG_RULES``.
"""

from __future__ import annotations

import re

_HEADING = re.compile(r"^(#{1,6})[ \t]+\S")
_ITEM = re.compile(r"^[ \t]*(?:[-*]|\d+\.)[ \t]+\S")
_LINK = re.compile(r"\[[^\]\n]*\]\([^)\s]+\)")


def md_spans(text: str, start: int, stop: int):
    """Yield ``(start, stop, desc)`` spans for ``text[start:stop]``."""
    # line table: (absolute line start, absolute line end WITHOUT the
    # newline, line string)
    lines = []
    pos = start
    while pos < stop:
        nl = text.find("\n", pos, stop)
        end = stop if nl == -1 else nl
        lines.append((pos, end, text[pos:end]))
        pos = stop if nl == -1 else nl + 1

    spans: list[tuple[int, int, str]] = []
    # pass 1: fences (toggle), recording which lines are inside
    in_fence = [False] * len(lines)
    open_i = None
    for i, (_, _, s) in enumerate(lines):
        if s.startswith("```"):
            if open_i is None:
                open_i = i
            else:
                for j in range(open_i, i + 1):
                    in_fence[j] = True
                spans.append(
                    (lines[open_i][0], lines[i][1], "md_fence")
                )
                open_i = None
    if open_i is not None:  # unclosed: runs to the end
        for j in range(open_i, len(lines)):
            in_fence[j] = True
        spans.append((lines[open_i][0], stop, "md_fence"))

    # pass 2: headings / items outside fences
    headings = []  # (line index, level)
    for i, (ls, le, s) in enumerate(lines):
        if in_fence[i]:
            continue
        m = _HEADING.match(s)
        if m:
            headings.append((i, len(m.group(1))))
            spans.append((ls, le, "md_heading"))
        elif _ITEM.match(s):
            spans.append((ls, le, "md_item"))
        # inline links (``[text](target)``) on any non-fence line —
        # nested under their section/item by containment
        for lm in _LINK.finditer(s):
            spans.append((ls + lm.start(), ls + lm.end(), "md_link"))

    # pass 3: sections — a level-L heading owns everything up to the
    # next heading with level <= L
    for n, (i, level) in enumerate(headings):
        end = stop
        for j, lvl in headings[n + 1 :]:
            if lvl <= level:
                end = lines[j][0]
                break
        spans.append((lines[i][0], end, f"md_section_h{level}"))

    spans.sort(key=lambda s: (s[0], -s[1]))
    return spans
