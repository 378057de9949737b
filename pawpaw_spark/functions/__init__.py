from pawpaw_spark.functions.strings import (
    seg_text,
    str_count,
    str_endswith,
    str_find,
    str_startswith,
    str_strip_span,
    to_line_col,
)

__all__ = [
    "seg_text",
    "str_count",
    "str_endswith",
    "str_find",
    "str_startswith",
    "str_strip_span",
    "to_line_col",
]
