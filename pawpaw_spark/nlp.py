"""SimpleNlp-parity rule program.

The reference's canned NLP pipeline (``pawpaw/nlp/nlp.py:472-508``) is
Paragraph split -> Sentence split -> Number extract -> word extract
(words only outside numbers). Here the same semantics are a 4-row
RuleSet for the shared segmentation kernel; the patterns below are
rebuilt from the published grammar (Unicode whitespace/quote classes
from UNIDATA NamesList, the sentence-boundary rule/exception structure
of ``nlp.py:314-469``, the locale number grammar of ``nlp.py:121-223``)
and differentially tested against the reference pipeline
(tests/test_nlp.py).

The reference composes its sentence regex with `regex` named lists
(``\\L<name>``); equivalent alternations/char classes are inlined here
so rules stay plain picklable strings.
"""

from __future__ import annotations

import regex as _re

from pawpaw_spark.rules import RuleSet, extract, split

# --- character sets (UNIDATA) ----------------------------------------------

EOL_CHARS = "\u000A\u0085\u2028\u2029"
WS_OTHER_CHARS = (
    "\u0009\u000C\u000D\u0020\u00A0"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200A\u200B"
    "\u202F\u205F\u3000"
)
SINGLE_QUOTES = "\u0027\u0060\u00B4\u2018\u2019\u201A\u201B\u275B\u275C\u275F"
DOUBLE_QUOTES = "\u0022\u201C\u201D\u201E\u201F\u275D\u275E\u2760"


def _cls(chars: str) -> str:
    return "[" + _re.escape(chars) + "]"


# --- paragraph --------------------------------------------------------------

def paragraph_pattern(min_separators: int = 2) -> str:
    """>= min_separators EOLs, each optionally preceded by other-WS
    (reference Paragraph._build_re, ``nlp.py:259-260``)."""
    return rf"(?s)(?:{_cls(WS_OTHER_CHARS)}*{_cls(EOL_CHARS)}){{{min_separators},}}"


# --- sentence ---------------------------------------------------------------

_TERMINATORS = r"(?:\.|\.{3,}|…|[\!\?]+)"
_SEN_SUF = _cls(SINGLE_QUOTES + DOUBLE_QUOTES + ")]}")
_SEN_PRE = _cls(SINGLE_QUOTES + DOUBLE_QUOTES + "([{")
# '\r\n' first: the reference named-list matches longest-first
_SEN_WS = rf"(?:\r\n|{_cls(EOL_CHARS + WS_OTHER_CHARS)})"

HF_START_WORDS = (
    "A", "How", "In", "It", "The", "There", "This", "What", "When",
    "Where", "Who", "Why",
)
NUMERIC_ABBRS = ("c.", "ca.", "ed.", "illus.", "no.", "p.", "pp.", "ver.", "vol.")
IGNORE_ABBRS = (
    "Ald.", "Asst.", "Dr.", "Drs.", "ed.", "e.g.", "Fr.", "Gov.", "Hon.",
    "ibid.", "i.e.", "illus.", "Insp.", "Messrs.", "Mlle.", "Mmes.", "Mr.",
    "Mrs.", "Ms.", "Msgr.", "Mt.", "pub.", "pseud.", "Pres.", "Prof.",
    "qtd.", "Rep.", "Reps.", "Rev.", "Sen.", "Sens.", "St.", "vis.", "v.",
    "vs.",
    # military ranks
    "Lt.", "Capt.", "Cpt.", "Maj.", "Cmdr.", "Col.", "Brig.", "Gen.", "Adm.",
    "Pvt.", "Pfc.", "Spc.", "Cpl.", "Sgt.",
)


def _alt(words: tuple[str, ...]) -> str:
    # longest-first, mirroring regex named-list matching
    return "(?:" + "|".join(_re.escape(w) for w in sorted(words, key=len, reverse=True)) + ")"


def sentence_pattern() -> str:
    """Sentence-boundary splitter: terminator lookbehind + boundary
    rules with abbreviation/name exceptions (reference Sentence,
    ``nlp.py:434-462``)."""
    exceptions = (
        rf"(?<!{_alt(IGNORE_ABBRS)})"
        rf"(?<!{_alt(NUMERIC_ABBRS)}(?={_SEN_WS}\d))"
        rf"(?<![A-Z][a-z]+{_SEN_WS}[A-Z]\.(?={_SEN_WS}[A-Z][a-z]+))"
        rf"(?<!U\.S\.(?={_SEN_WS}Government))"
    )
    rules = [
        rf"{_SEN_WS}*$",                                        # end of document
        rf"{_SEN_WS}{{2,}}",                                     # 2+ whitespace
        rf"{_SEN_WS}(?={_SEN_PRE}*{_alt(HF_START_WORDS)}{_SEN_WS})",  # hf start word
        exceptions + rf"{_SEN_WS}(?={_SEN_PRE}*[A-Z\d])",        # catch-all
    ]
    combined = "|".join(f"(?:{r})" for r in rules)
    return rf"(?s)(?<=\w{_TERMINATORS}{_SEN_SUF}*)(?:{combined})"


# --- number -----------------------------------------------------------------

def number_pattern(decimal_point: str = ".", thousands_sep: str = ",",
                   thousands_sep_optional: bool = True) -> str:
    """Locale-aware number grammar: sign, grouped integer, decimal,
    e/x10^ scientific exponent (reference Number, ``nlp.py:121-146``).
    Group names (number/sign/integer/decimal/exponent) repeat exactly as
    in the reference so the emitted tree shapes match."""
    sign = r"(?P<sign>[-+])"
    integer = rf"(?P<integer>\d{{1,3}}(?:{_re.escape(thousands_sep)}\d{{3}})+"
    if thousands_sep_optional:
        integer += r"|\d+"
    integer += r")"
    decimal = rf"(?P<decimal>{_re.escape(decimal_point)}\d+)"
    exponent = rf"(?P<exponent>[Ee]{sign}?\d+| ?[Xx✕] ?10\^ ?{sign}?\d+)"
    return (
        rf"(?s)(?P<number>{sign}?"
        rf"(?:{integer}{decimal}?|{decimal})"
        rf"{exponent}?)"
    )


# --- words ------------------------------------------------------------------

def word_pattern() -> str:
    """Word with optional internal single-quote / hyphen joins
    (reference SimpleNlp._word_pat, ``nlp.py:473``)."""
    sq = _cls(SINGLE_QUOTES)
    return rf"(?s)(?P<word>\w(?:(?:{sq}|-\s*)?\w)*)"


def simple_nlp_rules(chars: bool = False) -> RuleSet:
    """The SimpleNlp pipeline as rules. Words are extracted only in the
    sub-ranges of each sentence not covered by number matches — the
    kernel's form of the reference's Delegate-on-None-part wiring."""
    rules = [
        split(paragraph_pattern(), desc="paragraph", tag="nlp:para"),
        split(sentence_pattern(), on="paragraph", desc="sentence", tag="nlp:sentence"),
        extract(number_pattern(), on="sentence", tag="nlp:number"),
        extract(
            word_pattern(), on="sentence", tag="nlp:word",
            within_gaps_of="nlp:number",
        ),
    ]
    if chars:
        rules.append(extract(r"(?s)(?P<char>\w)", on="word", tag="nlp:char"))
    return RuleSet.of(*rules, name="simple_nlp")


NLP_RULES = simple_nlp_rules()
