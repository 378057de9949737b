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

import sys
import unicodedata as _ud
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact Unicode predicate classes. Java regex lacks the Numeric_Type /
# XID_Start / XID_Continue properties several str predicates need, so
# the char classes are computed ONCE per driver process from the same
# unicodedata tables CPython's own predicates read, compressed to
# codepoint ranges, and shipped to executors as plain pattern strings.
# Build cost ~0.5 s per class, lazy, driver-only.
_UNISET_CACHE: dict[str, str] = {}


def _uniset_body(name: str, pred: Callable[[str], bool]) -> str:
    """Class BODY (no brackets, so call sites can union/negate) of
    every non-surrogate codepoint where ``pred(chr(cp))`` is true, as
    compressed ``\\x{a}-\\x{b}`` ranges."""
    cached = _UNISET_CACHE.get(name)
    if cached is not None:
        return cached
    ranges: list[list[int]] = []
    for cp in range(sys.maxunicode + 1):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        if pred(chr(cp)):
            if ranges and ranges[-1][1] == cp - 1:
                ranges[-1][1] = cp
            else:
                ranges.append([cp, cp])
    out = "".join(
        rf"\x{{{a:x}}}" if a == b else rf"\x{{{a:x}}}-\x{{{b:x}}}"
        for a, b in ranges
    )
    _UNISET_CACHE[name] = out
    return out


def _uniset_class(name: str, pred: Callable[[str], bool]) -> str:
    return "[" + _uniset_body(name, pred) + "]"


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
    """Exact ``str.isdigit``: Numeric_Type Digit or Decimal. Java regex
    has no Numeric_Type property, so the char class is computed once
    from the driver's own unicodedata tables (see _uniset_class)."""
    t = seg_text(content, start, stop)
    return (F.length(t) > 0) & t.rlike(
        rf"\A{_uniset_class('isdigit', lambda ch: _ud.digit(ch, None) is not None)}+\z"
    )


def str_isalpha(content: Column, start: Column, stop: Column) -> Column:
    # python isalpha == general category L* — NOT java \w (ASCII-only
    # by default, caught by the stratified-unicode differential corpus),
    # and computed rather than \p{L} so letters from Unicode versions
    # newer than the JVM's UCD still count
    t = seg_text(content, start, stop)
    return (F.length(t) > 0) & t.rlike(
        rf"\A{_uniset_class('isalpha', str.isalpha)}+\z"
    )


# python's str whitespace set (str.isspace / whitespace-mode split):
# Unicode White_Space plus the \x1c-\x1f separators Java \s lacks
_PY_WS = r"\A[\p{IsWhite_Space}\x1c-\x1f]\z"
_PY_WS_RUN = r"\A[\p{IsWhite_Space}\x1c-\x1f]+\z"


def str_isspace(content: Column, start: Column, stop: Column) -> Column:
    t = seg_text(content, start, stop)
    return (F.length(t) > 0) & t.rlike(_PY_WS_RUN)


def removeprefix_span(content: Column, start: Column, stop: Column, prefix: str) -> Column:
    """New start offset after ``str.removeprefix``."""
    return F.when(str_startswith(content, start, stop, prefix), start + len(prefix)).otherwise(start)


def removesuffix_span(content: Column, start: Column, stop: Column, suffix: str) -> Column:
    """New stop offset after ``str.removesuffix``."""
    return F.when(str_endswith(content, start, stop, suffix), stop - len(suffix)).otherwise(stop)


def str_rfind(content: Column, start: Column, stop: Column, sub: str) -> Column:
    """Last index of ``sub`` relative to the span start; -1 if absent
    (``str.rfind`` semantics) — reverse-locate trick, pure JVM."""
    t = seg_text(content, start, stop)
    rpos = F.locate(sub[::-1], F.reverse(t))  # 1-based from the end
    return F.when(rpos == 0, F.lit(-1)).otherwise(
        F.length(t) - (rpos - 1) - len(sub)
    ).cast("int")


def str_rindex(content: Column, start: Column, stop: Column, sub: str) -> Column:
    """Like rfind but NULL when absent (the Column analog of the
    ValueError ``str.rindex`` raises)."""
    idx = str_rfind(content, start, stop, sub)
    return F.when(idx >= 0, idx)


def str_rpartition_spans(
    content: Column, start: Column, stop: Column, sep: str
) -> tuple[Column, Column, Column, Column]:
    """(before_stop, sep_start, sep_stop, after_start) absolute offsets;
    if sep missing, before/sep collapse at START and after = whole span
    (``str.rpartition`` semantics)."""
    idx = str_rfind(content, start, stop, sep)
    found = idx >= 0
    sep_start = F.when(found, start + idx).otherwise(start)
    sep_stop = F.when(found, start + idx + len(sep)).otherwise(start)
    return (sep_start.cast("int"), sep_start.cast("int"), sep_stop.cast("int"), sep_stop.cast("int"))


_SPAN = lambda a, b: F.struct(a.cast("int").alias("start"), b.cast("int").alias("stop"))


# the python str whitespace set, enumerated (all chars with
# str.isspace() == True): used for O(1) set-membership char tests —
# substring(t, i, 1) is O(i) on UTF8String, so a regex-per-char scan
# would be O(L^2) per row (measured 7 s at sf0.1); element_at on a
# pre-split char array plus isin is O(L)
_PY_WS_CHARS = [
    "\t", "\n", "\x0b", "\x0c", "\r", "\x1c", "\x1d", "\x1e", "\x1f",
    " ", "\x85", "\xa0", "\u1680",
    "\u2000", "\u2001", "\u2002", "\u2003", "\u2004", "\u2005", "\u2006",
    "\u2007", "\u2008", "\u2009", "\u200a",
    "\u2028", "\u2029", "\u202f", "\u205f", "\u3000",
]



def _let(value: Column, build) -> Column:
    """Let-binding for column expressions: evaluate ``value`` ONCE and
    reference it via a lambda variable. Higher-order-function lambdas
    inline their argument expression at every use site — indexing a
    ``split(t, '')`` array per character re-splits the string per
    character, turning an O(L) scan into O(L^2) (measured 14 s at
    sf0.1). ``transform`` over a 1-element array binds the computed
    value to a lambda variable instead, so inner lambdas reference it."""
    return F.element_at(F.transform(F.array(value), build), 1)

def _ws_token_spans(content: Column, start: Column, stop: Column) -> Column:
    """Array of absolute (start, stop) spans of the maximal non-space
    runs — the whitespace mode of ``str.split``, span-emitting. Char
    classification over a pre-split char array keeps it a pure column
    expression (no UDF) at O(len) per row."""
    t = seg_text(content, start, stop)
    L = F.length(t)

    def build(wsarr):
        # bounds-guarded access: F.when evaluates its branch lazily, so
        # out-of-range indexes yield NULL instead of an ANSI-mode error
        # (NULL then falls out of the three-valued-logic filters
        # correctly). The per-char class test ran ~6x per char as
        # inline filters; classifying once into a boolean array first
        # measured 2.8 s -> ~1 s at sf0.1.
        ws = lambda i: F.when((i >= 0) & (i < L), F.element_at(wsarr, i + 1))
        idx = F.sequence(F.lit(0), L - 1)
        starts = F.filter(idx, lambda i: ~ws(i) & ((i == 0) | ws(i - 1)))
        ends = F.filter(idx, lambda i: ~ws(i) & ((i == L - 1) | ws(i + 1)))
        return F.zip_with(starts, ends, lambda a, b: _SPAN(start + a, start + b + 1))

    wsarr = F.transform(F.split(t, ""), lambda ch: ch.isin(_PY_WS_CHARS))
    spans = _let(wsarr, build)
    return F.when(L > 0, spans).otherwise(F.array().cast("array<struct<start:int,stop:int>>"))


def _sep_positions(t: Column, L: Column, sep: str) -> Column:
    """Relative start offsets of the leftmost non-overlapping ``sep``
    occurrences (the occurrence discipline of ``str.split``): candidate
    positions from a char scan, then a fold keeps each candidate only
    if it starts at/after the previous kept occurrence's end."""
    idx = F.sequence(F.lit(0), L - 1)
    cand = _let(
        F.split(t, ""),
        lambda chars: F.filter(
            idx,
            lambda i: (
                F.element_at(chars, i + 1) if len(sep) == 1
                else F.array_join(F.slice(chars, i + 1, len(sep)), "")
            ) == sep,
        ),
    )
    init = F.struct(
        F.lit(0).alias("nxt"), F.array().cast("array<int>").alias("keep")
    )
    merge = lambda acc, i: F.when(
        i >= acc["nxt"],
        F.struct(
            (i + len(sep)).cast("int").alias("nxt"),
            F.concat(acc["keep"], F.array(i.cast("int"))).alias("keep"),
        ),
    ).otherwise(acc)
    kept = F.aggregate(cand, init, merge, lambda acc: acc["keep"])
    return F.when(L > 0, kept).otherwise(F.array().cast("array<int>"))


def str_split_spans(
    content: Column, start: Column, stop: Column, sep: str | None = None,
    maxsplit: int = -1,
) -> Column:
    """Array of absolute (start, stop) spans, ``str.split`` semantics
    (span-emitting form of the reference's ``str_split``): whitespace
    mode drops empty parts; separator mode keeps them; with ``maxsplit``
    the tail part runs to the span's stop."""
    if sep is None:
        spans = _ws_token_spans(content, start, stop)
        if maxsplit >= 0:
            tail = _SPAN(F.element_at(spans, maxsplit + 1)["start"], stop)
            spans = F.when(
                F.size(spans) > maxsplit,
                F.concat(F.slice(spans, 1, maxsplit), F.array(tail)),
            ).otherwise(spans)
        return spans
    if sep == "":
        raise ValueError("empty separator")
    t = seg_text(content, start, stop)
    L = F.length(t)
    seps = _sep_positions(t, L, sep)
    starts_rel = F.concat(
        F.array(F.lit(0)), F.transform(seps, lambda s: s + len(sep))
    )
    stops_rel = F.concat(seps, F.array(L))
    spans = F.zip_with(starts_rel, stops_rel, lambda a, b: _SPAN(start + a, start + b))
    if maxsplit >= 0:
        tail = _SPAN(F.element_at(spans, maxsplit + 1)["start"], stop)
        spans = F.when(
            F.size(spans) > maxsplit + 1,
            F.concat(F.slice(spans, 1, maxsplit), F.array(tail)),
        ).otherwise(spans)
    return spans


def _rsep_positions(t: Column, L: Column, sep: str) -> Column:
    """Rightmost non-overlapping occurrences (the discipline of
    ``str.rsplit``: 'aaa'.rsplit('aa') == ['a', ''])."""
    idx = F.sequence(F.lit(0), L - 1)
    cand = _let(
        F.split(t, ""),
        lambda chars: F.filter(
            idx,
            lambda i: (
                F.element_at(chars, i + 1) if len(sep) == 1
                else F.array_join(F.slice(chars, i + 1, len(sep)), "")
            ) == sep,
        ),
    )
    init = F.struct(
        (L + F.lit(0)).cast("int").alias("prv"),
        F.array().cast("array<int>").alias("keep"),
    )
    merge = lambda acc, i: F.when(
        i + len(sep) <= acc["prv"],
        F.struct(
            i.cast("int").alias("prv"),
            F.concat(acc["keep"], F.array(i.cast("int"))).alias("keep"),
        ),
    ).otherwise(acc)
    kept = F.aggregate(F.reverse(cand), init, merge, lambda acc: F.reverse(acc["keep"]))
    return F.when(L > 0, kept).otherwise(F.array().cast("array<int>"))


def str_rsplit_spans(
    content: Column, start: Column, stop: Column, sep: str | None = None,
    maxsplit: int = -1,
) -> Column:
    """``str.rsplit`` span form: occurrences scanned right-to-left, and
    with ``maxsplit`` the HEAD part runs from the span's start to the
    stop of the (n-maxsplit-1)th part (mirrors python:
    ' a b '.rsplit(None, 1) == [' a', 'b'])."""
    if sep is None:
        spans = str_split_spans(content, start, stop, None)
    else:
        if sep == "":
            raise ValueError("empty separator")
        t = seg_text(content, start, stop)
        L = F.length(t)
        seps = _rsep_positions(t, L, sep)
        starts_rel = F.concat(
            F.array(F.lit(0)), F.transform(seps, lambda s: s + len(sep))
        )
        stops_rel = F.concat(seps, F.array(L))
        spans = F.zip_with(starts_rel, stops_rel, lambda a, b: _SPAN(start + a, start + b))
    if maxsplit < 0:
        return spans
    n = F.size(spans)
    head = _SPAN(start, F.element_at(spans, n - maxsplit)["stop"])
    return F.when(
        n > maxsplit + (1 if sep is not None else 0),
        F.concat(F.array(head), F.slice(spans, n - maxsplit + 1, maxsplit)),
    ).otherwise(spans)


# full Unicode EOL set of str.splitlines (reference ito.py:1288)
_EOL_CHARS = ["\n", "\r", "\x0b", "\x0c", "\x1c", "\x1d", "\x1e", "\x85", "\u2028", "\u2029"]


def str_splitlines_spans(
    content: Column, start: Column, stop: Column, keepends: bool = False
) -> Column:
    """Array of absolute (start, stop) line spans, ``str.splitlines``
    semantics: full Unicode EOL set, '\\r\\n' as one separator, interior
    empty lines kept, trailing empty line dropped."""
    t = seg_text(content, start, stop)
    L = F.length(t)

    def build(chars):
        # bounds-guarded (lazy) char access — see _ws_token_spans
        c = lambda i: F.when((i >= 0) & (i < L), F.element_at(chars, i + 1))
        is_eol = lambda i: c(i).isin(_EOL_CHARS)
        idx = F.sequence(F.lit(0), L - 1)
        # break starts: EOL chars, except a '\n' that completes '\r\n'
        brk = F.filter(
            idx, lambda i: is_eol(i) & ~((c(i) == "\n") & (i > 0) & (c(i - 1) == "\r"))
        )
        blen = lambda i: F.when((c(i) == "\r") & (c(i + 1) == "\n"), 2).otherwise(1)
        # bind the break array too: each break's offset math re-runs the
        # filter otherwise
        def with_brk(brk):
            next_starts = F.transform(brk, lambda b: b + blen(b))
            starts_rel = F.concat(F.array(F.lit(0)), next_starts)
            if keepends:
                stops_rel = F.concat(next_starts, F.array(L))
            else:
                stops_rel = F.concat(brk, F.array(L))
            lines = F.zip_with(
                starts_rel, stops_rel, lambda a, b: _SPAN(start + a, start + b)
            )
            # drop the trailing empty line (text ending in an EOL)
            last_start = F.element_at(starts_rel, -1)
            return F.when(
                last_start >= L, F.slice(lines, 1, F.size(lines) - 1)
            ).otherwise(lines)

        return _let(brk, lambda b: with_brk(b))

    lines = _let(F.split(t, ""), build)
    return F.when(L > 0, lines).otherwise(F.array().cast("array<struct<start:int,stop:int>>"))


# --- remaining is-predicates -------------------------------------------------
# Pure-JVM regexes. Properties Java regex has natively (categories,
# binary Uppercase/Lowercase/White_Space) are used directly; the ones
# it lacks (Numeric_Type, XID_Start/XID_Continue, the per-char isalnum
# union) are EXACT computed classes from the driver's unicodedata (see
# _uniset_class) — the stratified-unicode differential corpus holds
# every predicate to CPython bit-for-bit.


def _nonempty_rlike(content: Column, start: Column, stop: Column, pat: str) -> Column:
    t = seg_text(content, start, stop)
    return (F.length(t) > 0) & t.rlike(pat)


def str_isalnum(content: Column, start: Column, stop: Column) -> Column:
    # python isalnum == per-char isalpha|isdecimal|isdigit|isnumeric;
    # the numeric side includes Numeric_Type chars outside \p{N}
    # (e.g. Han numerals, category Lo)
    return _nonempty_rlike(
        content, start, stop,
        rf"\A{_uniset_class('isalnum', str.isalnum)}+\z",
    )


def str_isdecimal(content: Column, start: Column, stop: Column) -> Column:
    # computed Nd (CPython UCD), not \p{Nd} (JVM UCD) — version skew
    return _nonempty_rlike(
        content, start, stop,
        rf"\A{_uniset_class('isdecimal', str.isdecimal)}+\z",
    )


def str_isnumeric(content: Column, start: Column, stop: Column) -> Column:
    """Exact ``str.isnumeric``: any Numeric_Type (Decimal/Digit/
    Numeric), which reaches outside \\p{N} (Han numerals are Lo)."""
    return _nonempty_rlike(
        content, start, stop,
        rf"\A{_uniset_class('isnumeric', lambda ch: _ud.numeric(ch, None) is not None)}+\z",
    )


# case-predicate building blocks, computed from CPython's own tables
# (binary Uppercase/Lowercase + Lt): Java's \p{IsUppercase} reads the
# JVM's UCD, which lags CPython's by several Unicode versions — chars
# from newer blocks (e.g. Latin Extended-F, 14.0) would disagree
def _upper_body() -> str:
    return _uniset_body("upper", str.isupper)


def _lower_body() -> str:
    return _uniset_body("lower", str.islower)


def _lt_body() -> str:
    return _uniset_body("lt", lambda ch: _ud.category(ch) == "Lt")


def str_isupper(content: Column, start: Column, stop: Column) -> Column:
    """At least one cased char and no non-uppercase cased char
    (``str.isupper``): python counts e.g. Roman numerals (Nl,
    Uppercase=True) as cased; titlecase (Lt, e.g. 'ǅ') is cased but
    NOT uppercase, so its presence disqualifies."""
    t = seg_text(content, start, stop)
    return t.rlike(rf"[{_upper_body()}]") & ~t.rlike(rf"[{_lower_body()}{_lt_body()}]")


def str_islower(content: Column, start: Column, stop: Column) -> Column:
    t = seg_text(content, start, stop)
    return t.rlike(rf"[{_lower_body()}]") & ~t.rlike(rf"[{_upper_body()}{_lt_body()}]")


def str_istitle(content: Column, start: Column, stop: Column) -> Column:
    """Title case: upper/title only after uncased, lower only after
    cased, at least one cased char (``str.istitle``)."""
    t = seg_text(content, start, stop)
    # word = upper/title head + lowercase run; words must be separated
    # by >=1 uncased char (an alternation like (uncased|word)* wrongly
    # accepts 'ABc': upper may only FOLLOW uncased, per CPython's
    # previous_is_cased state machine)
    _n = rf"[^{_upper_body()}{_lower_body()}{_lt_body()}]"
    _w = rf"[{_upper_body()}{_lt_body()}][{_lower_body()}]*"
    return t.rlike(
        rf"\A{_n}*(?:{_w}(?:{_n}+{_w})*{_n}*)?\z"
    ) & t.rlike(rf"[{_upper_body()}{_lt_body()}]")


def str_isascii(content: Column, start: Column, stop: Column) -> Column:
    return seg_text(content, start, stop).rlike(r"\A[\x00-\x7F]*\z")


def str_isidentifier(content: Column, start: Column, stop: Column) -> Column:
    """Exact ``str.isidentifier``: XID_Start then XID_Continue* —
    classes computed from CPython itself (a char starts an identifier
    iff ch.isidentifier(); continues one iff ('a'+ch) does)."""
    head = _uniset_class("xid_start", str.isidentifier)
    tail = _uniset_class("xid_continue", lambda ch: ("a" + ch).isidentifier())
    return _nonempty_rlike(content, start, stop, rf"\A{head}{tail}*\z")


def str_isprintable(content: Column, start: Column, stop: Column) -> Column:
    """No control/format/separator/unassigned chars except the plain
    space (``str.isprintable``; empty is printable). Computed class:
    the JVM's \\p{C} covers a different unassigned set than CPython's
    newer UCD."""
    bad = _uniset_body("unprintable", lambda ch: not ch.isprintable())
    return seg_text(content, start, stop).rlike(rf"\A[^{bad}]*\z")


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
