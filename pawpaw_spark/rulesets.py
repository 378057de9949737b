"""Named rule programs (the engine's equivalents of pawpaw's demo
parsers and SimpleNlp pipeline) + per-language dispatch.

These are data, not code: each is a RuleSet the segmentation kernel
interprets. The python-code rules drive DEFINES/REFERENCES triple
extraction; text rules drive paragraph/sentence/word trees
(reference pipeline shape: ``pawpaw/nlp/nlp.py:472-508``).
"""

from __future__ import annotations

from pawpaw_spark.rules import ROOT, RuleSet, custom, extract, gaps, split

# --- python-ish source code ------------------------------------------------
# def blocks with name + body; body ends at the next top-or-any-indent
# def/class or EOF. Methods inside classes match too.
DEF_BLOCK_PAT = (
    r"(?ms)^(?P<def_block>[ \t]*def\s+(?P<def_name>\w+)"
    r"(?P<def_body>.*?(?=\n[ \t]*def\s|\n[ \t]*class\s|\Z)))"
)
CLASS_PAT = r"(?m)^[ \t]*class\s+(?P<class_name>\w+)"
IMPORT_PAT = r"(?m)^[ \t]*import\s+(?P<import_name>[\w.]+)"
# call sites: identifier followed by '(' — not a def/class header name
CALL_PAT = r"(?<!def\s)(?<!class\s)\b(?P<call_name>[A-Za-z_]\w*)\s*\("

CODE_RULES = RuleSet.of(
    extract(DEF_BLOCK_PAT, tag="def", value_for=("def_name",)),
    extract(CLASS_PAT, tag="class", value_for=("class_name",)),
    extract(IMPORT_PAT, tag="import", value_for=("import_name",)),
    extract(CALL_PAT, on="def_body", tag="call", value_for=("call_name",)),
    name="code",
)

# --- prose text --------------------------------------------------------------
SENTENCE_SPLIT_PAT = r"(?<=[.!?])\s+(?=[A-Z])"
WORD_NUM_PAT = r"(?P<word>[A-Za-z]+)|(?P<number>\d+(?:\.\d+)?)"

TEXT_RULES = RuleSet.of(
    split(r"\n\n+", desc="para", tag="para"),
    split(SENTENCE_SPLIT_PAT, on="para", desc="sentence", tag="sentence"),
    extract(WORD_NUM_PAT, on="sentence", tag="word"),
    name="text",
)

# --- the canonical five-level demo tree (README.md:137) ----------------------
PHRASE_PAT = r"(?P<phrase>(?P<word>(?P<char>\w)+) (?P<number>(?P<digit>\d)+))"
CANONICAL_RULES = RuleSet.of(extract(PHRASE_PAT, tag="phrase"), name="canonical")

# --- us_constitution demo parser shape (docs/demos/us_constitution) ---------
CONSTITUTION_RULES = RuleSet.of(
    split(r"(?=Article\.?\s+[IVX]+\.?)", desc="article", tag="article"),
    split(r"(?=Section\.?\s+\d+\.?)", on="article", desc="section", tag="section"),
    split(r"\n\n+", on="section", desc="para", tag="para"),
    extract(r"(?P<word>[A-Za-z]+)", on="para", tag="word"),
    name="constitution",
)

# --- structural XML --------------------------------------------------------
# one custom rule: expat-offset parse emitting the reference descriptor
# taxonomy (element/start_tag/tag/name/attributes/attribute/key/value/
# text/end_tag/comment/pi); nested by the kernel's containment stack.
def _xml_spans(text, start, stop):
    from pawpaw_spark.sources.xml import xml_spans

    return xml_spans(text, start, stop)


XML_RULES = RuleSet.of(custom(_xml_spans, tag="xml"), name="xml")


# --- structural Markdown ---------------------------------------------------
# heading-section trees (md_section_h<L> nests by containment), fenced
# code blocks, list items — see sources/markdown.py
def _md_spans(text, start, stop):
    from pawpaw_spark.sources.markdown import md_spans

    return md_spans(text, start, stop)


MARKDOWN_RULES = RuleSet.of(custom(_md_spans, tag="md"), name="markdown")

#: lang -> RuleSet used by the KG pipeline
LANG_RULES: dict[str, RuleSet] = {
    "python": CODE_RULES,
    "text": TEXT_RULES,
    # markdown stays on TEXT_RULES: the KG triple oracles (and the
    # reference-parity P/R gate) pin the word/phrase segmentation of
    # the corpus's .md files. MARKDOWN_RULES (heading-section trees)
    # is the opt-in structural alternative — pass it to segment()
    # explicitly, as q_md_sections does.
    "markdown": TEXT_RULES,
    "xml": XML_RULES,
}


def rules_for_lang(lang: str) -> RuleSet:
    return LANG_RULES.get(lang, TEXT_RULES)
