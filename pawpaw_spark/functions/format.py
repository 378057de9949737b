"""Segment format mini-language (debug/report surface).

Behavioral parity with the reference ``Ito.__format__``
(``pawpaw/ito.py:599-715``; written from the documented grammar +
black-box probes, not from the code): a format spec is a literal string
with ``%`` directives —

* ``%span`` / ``%start`` / ``%stop``  — int directives; an optional
  ``:<python-format-spec>`` suffix is applied with ``format()`` (so
  ``%start:3d`` / ``%stop:>5`` behave exactly like Python formatting);
  ``%span`` renders ``(start, stop)`` with the spec applied to each end.
* ``%desc`` / ``%string`` / ``%substr`` / ``%value`` — str directives;
  optional ``!<lslice><a|r><rslice>`` conversion (``ascii``/``repr``,
  then slicing that many chars off each end) and optional
  ``:[<|^|>]<width><abbr>`` abbreviation (truncate to ``width`` chars,
  splicing ``abbr`` at the left/middle/right).
* ``% `` — zero-width space: renders as '' (lets adjacent directives
  touch without a literal separator).
* a ``%`` that starts no valid directive (including ``%%``) stays
  literal.

The spec is parsed ONCE at plan time; rendering is a vectorized pandas
UDF over the segment columns (this is a debug/report operator, not a
data-plane hot path — the reference uses it for visualization only).
"""

from __future__ import annotations

import re as _stdre

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INT_DIRS = ("span", "start", "stop")
_STR_DIRS = ("desc", "string", "substr", "value")

# int directive: name plus optional ':' + Python format-spec fields
_INT_RE = _stdre.compile(
    r"%(?P<dir>span|start|stop)"
    r"(?::(?P<fstr>(?:.?[<>=^])?[+\-]?#?0?\d*[_,]?[bcdeEfFgGnosxX%]?))?"
)
# str directive: name plus optional '!' conversion and ':' abbreviation
_STR_RE = _stdre.compile(
    r"%(?P<dir>desc|string|substr|value)"
    r"(?:!(?P<lslice>\d+)?(?P<conv>[ar])(?P<rslice>\d+)?)?"
    r"(?::(?P<abbr_pos>[<^>])?(?P<width>\d+)(?P<abbr>.+)?)?",
    _stdre.DOTALL,
)
_ZWS_RE = _stdre.compile(r"% ")


def parse_format(spec: str) -> list:
    """Spec -> list of pieces: str literals and directive dicts.

    Directive matches are anchored at each unescaped ``%`` and may not
    extend past the next ``%`` (mirrors the reference scan); ``%%``
    toggles the escape so both chars stay literal.
    """
    # positions of '%' that can start a directive (odd '%' runs only)
    starts = []
    esc = False
    for i, c in enumerate(spec):
        if c == "%":
            esc = not esc
        elif esc:
            starts.append(i - 1)
            esc = False
    pieces: list = []
    pos = 0
    for k, s in enumerate(starts):
        limit = starts[k + 1] if k + 1 < len(starts) else len(spec)
        m = None
        for rx in (_ZWS_RE, _INT_RE, _STR_RE):
            m = rx.match(spec, s, limit)
            if m:
                break
        if m is None:
            continue
        if s > pos:
            pieces.append(spec[pos:s])
        pos = m.end()
        if m.re is _ZWS_RE:
            continue
        d = m.groupdict()
        d["kind"] = "int" if d["dir"] in _INT_DIRS else "str"
        pieces.append(d)
    if pos < len(spec):
        pieces.append(spec[pos:])
    return pieces


def needed_inputs(pieces: list) -> set[str]:
    return {p["dir"] for p in pieces if isinstance(p, dict)}


def _render_str(d: dict, sub: str) -> str:
    if d.get("conv"):
        sub = ascii(sub) if d["conv"] == "a" else repr(sub)
        lo = int(d["lslice"]) if d.get("lslice") else 0
        rs = d.get("rslice")
        hi = None if rs is None or rs == "0" else -int(rs)
        sub = sub[lo:hi]
    if d.get("width") is not None:
        width = int(d["width"])
        if width < len(sub):
            abbr = d.get("abbr") or ""
            if len(abbr) >= width:
                sub = abbr[len(abbr) - width:]
            else:
                pos = d.get("abbr_pos")
                if pos == "<":
                    sub = abbr + sub[len(abbr) - width:]
                elif pos == "^":
                    post_len = (width - len(abbr)) // 2
                    post = sub[-post_len:] if post_len > 0 else ""
                    sub = sub[: width - len(post) - len(abbr)] + abbr + post
                else:  # '>' or default
                    sub = sub[: width - len(abbr)] + abbr
    return sub


def render(
    pieces: list,
    start: int,
    stop: int,
    desc: str | None,
    substr: str = "",
    value: str | None = None,
    string: str = "",
) -> str:
    out = []
    for p in pieces:
        if isinstance(p, str):
            out.append(p)
            continue
        if p["kind"] == "int":
            fstr = p.get("fstr") or ""
            if p["dir"] == "span":
                out.append(f"({format(start, fstr)}, {format(stop, fstr)})")
            else:
                out.append(format(start if p["dir"] == "start" else stop, fstr))
        else:
            base = {
                "desc": desc or "",
                "string": string,
                "substr": substr,
                "value": str(value) if value is not None else substr,
            }[p["dir"]]
            out.append(_render_str(p, base))
    return "".join(out)


def format_segments(
    segments: DataFrame,
    spec: str,
    source: DataFrame | None = None,
    text_col: str = "content",
    out_col: str = "formatted",
) -> DataFrame:
    """Add a ``formatted`` column rendering ``spec`` per segment row.

    The source text is joined (on ``doc_id``) ONLY when the spec uses
    ``%substr`` or ``%string`` — pure span/desc specs never touch the
    content table (zero-copy discipline preserved even in debug paths).
    """
    pieces = parse_format(spec)
    needs = needed_inputs(pieces)
    df = segments
    # %value falls back to the rendered substring when no value was
    # materialized (reference: Ito.value() defaults to str(self))
    if needs & {"substr", "string", "value"}:
        if source is None:
            raise ValueError("spec needs %substr/%string/%value: pass the source DataFrame")
        from pawpaw_spark.operators.segment import doc_id_col

        src = source.select(
            doc_id_col(source).alias("doc_id"), F.col(text_col).alias("__content")
        )
        df = df.join(src, "doc_id")
        substr_col = F.substring(
            "__content", F.col("start") + 1, F.col("stop") - F.col("start")
        )
        df = df.withColumn("__substr", substr_col)
        if "string" in needs:
            df = df.withColumn("__string", F.col("__content"))
    cols = [
        F.col("start"),
        F.col("stop"),
        F.col("desc"),
        (F.col("__substr") if "__substr" in df.columns else F.lit("")).alias("__substr"),
        (F.col("value") if "value" in df.columns else F.lit(None).cast("string")).alias(
            "value"
        ),
        (F.col("__string") if "__string" in df.columns else F.lit("")).alias("__string"),
    ]

    @F.pandas_udf("string")
    def fmt(
        start: pd.Series, stop: pd.Series, desc: pd.Series,
        substr: pd.Series, value: pd.Series, string: pd.Series,
    ) -> pd.Series:
        return pd.Series(
            [
                render(pieces, int(a), int(b), d, s if s is not None else "", v, g)
                for a, b, d, s, v, g in zip(start, stop, desc, substr, value, string)
            ]
        )

    out = df.withColumn(out_col, fmt(*cols))
    return out.drop("__content", "__substr", "__string")
