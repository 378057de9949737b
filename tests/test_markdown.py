"""Structural Markdown segmentation: span rules + kernel tree shape."""

from pawpaw_spark.sources.markdown import md_spans

DOC = """# Top
intro text
## Items
- one
- two
1. three
## Code
```
# not a heading
- not an item
```
tail
# Second
* last
"""


def _by_desc(spans):
    out = {}
    for s, e, d in spans:
        out.setdefault(d, []).append((s, e))
    return out


class TestMdSpans:
    def test_structure(self):
        spans = md_spans(DOC, 0, len(DOC))
        by = _by_desc(spans)
        assert len(by["md_heading"]) == 4
        assert len(by["md_section_h1"]) == 2
        assert len(by["md_section_h2"]) == 2
        assert len(by["md_fence"]) == 1
        # fence hides one fake heading and one fake item
        assert len(by["md_item"]) == 4  # one, two, three, last
        # h2 sections nest inside the first h1 section
        h1a = by["md_section_h1"][0]
        for h2 in by["md_section_h2"]:
            assert h1a[0] <= h2[0] and h2[1] <= h1a[1]
        # second h1 section starts where the first ends
        h1b = by["md_section_h1"][1]
        assert h1b[0] == h1a[1]
        # fence fully inside the Code section
        code_sec = by["md_section_h2"][1]
        f = by["md_fence"][0]
        assert code_sec[0] <= f[0] and f[1] <= code_sec[1]

    def test_heading_requires_space_and_level_cap(self):
        txt = "#nospace\n####### seven\n### ok\n"
        by = _by_desc(md_spans(txt, 0, len(txt)))
        assert len(by.get("md_heading", [])) == 1
        assert "md_section_h3" in by

    def test_unclosed_fence_runs_to_end(self):
        txt = "# h\n```\ncode\n# hidden\n"
        by = _by_desc(md_spans(txt, 0, len(txt)))
        assert len(by["md_heading"]) == 1
        assert by["md_fence"][0][1] == len(txt)

    def test_offsets_respect_window(self):
        pad = "XXXX"
        txt = pad + "# h\n- i\n"
        spans = md_spans(txt, len(pad), len(txt))
        assert all(s >= len(pad) for s, _, _ in spans)
        by = _by_desc(spans)
        assert txt[slice(*by["md_heading"][0])] == "# h"

    def test_kernel_builds_section_tree(self, spark):
        from pawpaw_spark.operators.segment import segment
        from pawpaw_spark.rulesets import MARKDOWN_RULES

        df = spark.createDataFrame(
            [("d1", DOC)], "doc_id string, content string"
        )
        segs = segment(df, MARKDOWN_RULES).collect()
        rows = {
            (r["start"], r["stop"], r["desc"]): r for r in segs
            if r["desc"].startswith("md_")
        }
        want = {
            (s, e, d) for s, e, d in md_spans(DOC, 0, len(DOC))
        }
        assert {k for k in rows} == want
        # the kernel's containment: "- one" sits under the Items h2
        # section, which sits under the first h1 section
        def depth_of(desc, txt):
            s = DOC.find(txt)
            return next(
                r["depth"] for (a, b, d), r in rows.items()
                if d == desc and a == s
            )

        d_item = depth_of("md_item", "- one")
        d_h2 = depth_of("md_section_h2", "## Items")
        d_h1 = depth_of("md_section_h1", "# Top")
        assert d_item > d_h2 > d_h1


class TestMdLinks:
    def test_link_spans_and_nesting(self):
        txt = ("# h\nsee [a](x/y) and [b b](doc://2)\n"
               "- item with [c](z)\n```\n[hidden](no)\n```\n")
        spans = md_spans(txt, 0, len(txt))
        links = sorted(
            txt[s:e] for s, e, d in spans if d == "md_link"
        )
        assert links == ["[a](x/y)", "[b b](doc://2)", "[c](z)"]
        # the item's link sits inside the item line span
        item = next((s, e) for s, e, d in spans if d == "md_item")
        c = next(
            (s, e) for s, e, d in spans
            if d == "md_link" and txt[s:e] == "[c](z)"
        )
        assert item[0] <= c[0] and c[1] <= item[1]

    def test_malformed_links_ignored(self):
        txt = "# h\n[no target] and (no text) and [open](unclosed\n"
        spans = md_spans(txt, 0, len(txt))
        assert not [d for _, _, d in spans if d == "md_link"]
