"""Span-bounded str-equivalence suite (reference ``ito.py:962-1313``).

The reference reimplements the ``str`` API over (string, start, stop)
without copying. Here the same operations are Column expressions over
(content, start, stop) — all JVM-side, whole-stage-codegen'd; the
"zero copy" analog is that ``substring`` is evaluated inside the
projection, never materialized to storage.

All offsets in/out are 0-based half-open [start, stop) like the
reference; Spark's SQL functions are 1-based internally — conversions
happen here so callers never see them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def seg_text(content: Column, start: Column, stop: Column) -> Column:
    """The segment's text — the lazy ``str(ito)`` equivalent."""
    return F.substring(content, start + 1, stop - start)


def str_count(content: Column, start: Column, stop: Column, sub: str) -> Column:
    """Occurrences of ``sub`` within the span (non-overlapping),
    like ``str.count`` (``ito.py`` str_count)."""
    t = seg_text(content, start, stop)
    return ((F.length(t) - F.length(F.replace(t, F.lit(sub), F.lit("")))) / len(sub)).cast("int")


def str_find(content: Column, start: Column, stop: Column, sub: str) -> Column:
    """First index of ``sub`` relative to the span start; -1 if absent
    (``str.find`` semantics)."""
    pos = F.locate(sub, seg_text(content, start, stop))  # 1-based, 0 = missing
    return (pos - 1).cast("int")


def str_startswith(content: Column, start: Column, stop: Column, prefix: str) -> Column:
    return seg_text(content, start, stop).startswith(prefix)


def str_endswith(content: Column, start: Column, stop: Column, suffix: str) -> Column:
    return seg_text(content, start, stop).endswith(suffix)


def str_strip_span(content: Column, start: Column, stop: Column) -> tuple[Column, Column]:
    """New (start, stop) with whitespace stripped — returns SPANS, not
    text (the zero-copy ``str_strip``, ``ito.py`` str_strip)."""
    t = seg_text(content, start, stop)
    lead = F.length(t) - F.length(F.ltrim(t))
    trail = F.length(t) - F.length(F.rtrim(t))
    new_start = start + lead
    new_stop = stop - trail
    # all-whitespace segment -> empty span at stripped start
    empty = new_stop <= new_start
    return (
        F.when(empty, start + lead).otherwise(new_start).cast("int"),
        F.when(empty, start + lead).otherwise(new_stop).cast("int"),
    )


def str_partition_spans(
    content: Column, start: Column, stop: Column, sep: str
) -> tuple[Column, Column, Column, Column]:
    """(before_stop, sep_start, sep_stop, after_start) absolute offsets;
    if sep missing, before = whole span and sep/after collapse at stop
    (``str.partition`` semantics)."""
    idx = str_find(content, start, stop, sep)
    found = idx >= 0
    sep_start = F.when(found, start + idx).otherwise(stop)
    sep_stop = F.when(found, start + idx + len(sep)).otherwise(stop)
    return (sep_start.cast("int"), sep_start.cast("int"), sep_stop.cast("int"), sep_stop.cast("int"))


def str_isdigit(content: Column, start: Column, stop: Column) -> Column:
    t = seg_text(content, start, stop)
    return (F.length(t) > 0) & t.rlike(r"^\d+$")


def str_isalpha(content: Column, start: Column, stop: Column) -> Column:
    t = seg_text(content, start, stop)
    return (F.length(t) > 0) & t.rlike(r"^[^\W\d_]+$")


def str_isspace(content: Column, start: Column, stop: Column) -> Column:
    t = seg_text(content, start, stop)
    return (F.length(t) > 0) & t.rlike(r"^\s+$")


def removeprefix_span(content: Column, start: Column, stop: Column, prefix: str) -> Column:
    """New start offset after ``str.removeprefix``."""
    return F.when(str_startswith(content, start, stop, prefix), start + len(prefix)).otherwise(start)


def removesuffix_span(content: Column, start: Column, stop: Column, suffix: str) -> Column:
    """New stop offset after ``str.removesuffix``."""
    return F.when(str_endswith(content, start, stop, suffix), stop - len(suffix)).otherwise(stop)


def to_line_col(content: Column, start: Column, eol: str = "\n") -> tuple[Column, Column]:
    """1-based (line, col) of an offset (reference ``ito.py:1376-1403``).

    col via the reverse trick: the 1-based position of the reversed EOL
    in the reversed prefix == chars since the last EOL + 1."""
    before = F.substring(content, F.lit(1), start)
    n_eol = ((F.length(before) - F.length(F.replace(before, F.lit(eol), F.lit("")))) / len(eol)).cast("int")
    line = n_eol + 1
    rpos = F.locate(eol[::-1], F.reverse(before))
    col = F.when(rpos == 0, start + 1).otherwise(rpos)
    return line.cast("int"), col.cast("int")
