"""ASCII-table detection as segmentation rules.

Spark form of the reference's ``StyledTable`` (behavior spec:
``pawpaw/table/table.py:30-85``, style grammar ``table/styles/styles.py``):
a ``TableStyle`` describes start / row-separator / end / caption line
patterns; it compiles to ONE extract rule whose named groups become
``table`` / ``header_row`` / ``row`` / ``pre_caption`` / ``post_caption``
segments nested by span containment — i.e. just another rule row for
the shared segmentation kernel, applied corpus-wide in the same
mapInPandas pass as everything else.

With ``equi_distant_indent`` the style is applied inside equidistantly
indented line blocks (two chained rules: chunk extract, then the table
rule ``on='chunk'`` — the kernel's equivalent of the reference's
Delegate connector; our output additionally materializes the ``chunk``
segments, which callers filter out if unwanted).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from pawpaw_spark.rules import ROOT, Rule, RuleSet, extract

TABLE_GROUPS = ("pre_caption", "table", "header_row", "row", "post_caption")

_INDENT = r"[ \t]*"
_CHUNK_PAT = (
    rf"(?s)(?<=^|\n)(?P<chunk>(?P<chunk_indent>{_INDENT})[^ \t][^\n]+?\n"
    rf"(?:(?P=chunk_indent)[^ \t][^\n]+?(?:\n|$))+)"
)


@dataclass(frozen=True)
class TableStyle:
    table_start_pat: str = ""
    row_sep_pat: str = ""
    table_end_pat: str | None = None
    header_row_end_pat: str | None = None
    pre_caption_pat: str | None = None
    post_caption_pat: str | None = None
    equi_distant_indent: bool = True


def build_table_pattern(style: TableStyle) -> str:
    """Compose the style grammar into a single (?s) regex with the
    TABLE_GROUPS capture groups (the reference's ``_build_re`` grammar,
    reproduced as a spec — ``table.py:36-66``)."""
    if style.equi_distant_indent:
        lead, ind = rf"(?P<indent>{_INDENT})", r"(?P=indent)"
    else:
        lead, ind = "", ""
    parts = [r"(?s)(?<=^|\n)", lead, r"(?P<table>"]
    if style.pre_caption_pat is not None:
        parts.append(rf"(?:(?P<pre_caption>{style.pre_caption_pat})\n{ind})?")
    parts.append(style.table_start_pat)
    if style.header_row_end_pat is not None:
        parts.append(rf"(?:\n{ind}(?P<header_row>.+?)\n{ind}{style.header_row_end_pat})?")
    if style.table_end_pat is None:
        parts.append(rf"(?:\n{ind}(?P<row>.+?)\n{ind}{style.row_sep_pat})+")
    else:
        parts.append(rf"(?:\n{ind}(?P<row>.+?)\n{ind}{style.row_sep_pat})*")
        parts.append(rf"\n{ind}(?P<row>.+?)\n{ind}{style.table_end_pat}")
    if style.post_caption_pat is not None:
        parts.append(rf"\n{ind}(?P<post_caption>{style.post_caption_pat})(?=\n|$)")
    parts.append(r")(?=$|\n)")
    return "".join(parts)


# Grid style:  -----+-----+-----  separators between every row
GRID = TableStyle(
    table_start_pat=r"(?:-{2,}(?:\+-+)+)",
    row_sep_pat=r"(?:-{2,}(?:\+-+)+)",
    equi_distant_indent=False,
)

# Markdown pipe tables have no trailing row separator, which the
# style grammar cannot express — matched with an explicit pattern:
# header line, |---|:-:| separator, then contiguous |-prefixed rows.
PIPE_PAT = (
    r"(?s)(?<=^|\n)(?P<indent>[ \t]*)(?P<table>(?P<header_row>\|[^\n]*)\n"
    r"(?P=indent)\|(?::?-+:?\|)+(?:\n(?P=indent)(?P<row>\|[^\n]*))+)(?=$|\n)"
)


def _present_groups(pattern: str) -> tuple[str, ...]:
    import regex

    names = regex.compile(pattern).groupindex
    return tuple(g for g in TABLE_GROUPS if g in names)


def table_rules(style: TableStyle | str, tag: str = "table", cells: bool = False) -> RuleSet:
    """RuleSet detecting this style; optionally splits each row into
    ``cell`` segments (pipe-delimited). ``style`` may be a TableStyle
    or a prebuilt table pattern string (e.g. ``PIPE_PAT``)."""
    rules: list[Rule] = []
    if isinstance(style, str):
        rules.append(extract(style, on=ROOT, group_filter=_present_groups(style), tag=tag))
    else:
        pat = build_table_pattern(style)
        groups = _present_groups(pat)
        if style.equi_distant_indent:
            rules.append(
                extract(_CHUNK_PAT, desc="chunk", group_filter=("chunk",), tag=f"{tag}:chunk")
            )
            rules.append(extract(pat, on="chunk", group_filter=groups, tag=tag))
        else:
            rules.append(extract(pat, on=ROOT, group_filter=groups, tag=tag))
    if cells:
        rules.append(
            extract(r"(?P<cell>[^|\n]+)", on=("row", "header_row"), tag=f"{tag}:cell")
        )
    return RuleSet.of(*rules, name=f"table:{tag}")


def detect_tables(df: DataFrame, style: TableStyle | str = GRID, text_col: str = "content",
                  cells: bool = False) -> DataFrame:
    """Segments table for table structures found in every document."""
    from pawpaw_spark.operators.segment import segment

    return segment(df, table_rules(style, cells=cells), text_col=text_col)
