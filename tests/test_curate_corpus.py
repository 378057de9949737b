"""End-to-end composition test for jobs/curate_corpus.py (the way
build_kg is tested in test_linking_canon_pipeline.py): a constructed
corpus with one planted casualty per stage, run through curate(), with
every per-stage survivor count asserted against independently computed
values, plus the split-partitioned layout and stats.json."""

import json
import os

import pytest
from pyspark.sql import functions as F

from jobs.curate_corpus import curate

# letter-only pseudo-words: each doc draws 48 words from its own
# disjoint slice, so cross-doc shingle Jaccard is ~0 (only stopwords
# shared) and the ONLY near-dup pair is the planted one.
_SYL = ["ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "ne"]
_WORDS = [a + b + c for a in _SYL for b in _SYL for c in _SYL]


def _doc_text(doc_idx: int) -> str:
    """4 lines x 14 words, every line '.'-terminated: passes Gopher
    (56 words, 4 distinct stopwords, ~6-char mean, >90% alpha) and C4
    (4 sentences of >=5 words) with clean_text == text."""
    base = doc_idx * 48
    lines = []
    for l in range(4):
        ws = _WORDS[base + l * 12: base + (l + 1) * 12]
        lines.append("the " + " ".join(ws) + " and with that.")
    return "\n".join(lines)


def _base_rows():
    rows = [(f"d{i:02d}", _doc_text(i), "en") for i in range(8)]
    rows.append(("d08", "the cat sat.", "en"))  # fails min_words
    rows.append(("d09", _doc_text(0), "en"))  # exact dup of d00
    # near-dup of d01: one extra word appended -> shingle Jaccard ~0.98
    nd = _doc_text(1).rsplit(" ", 1)[0] + " extra that."
    rows.append(("d10", nd, "en"))
    rows.append(("d11", _doc_text(11), "en"))
    return rows


def _write(spark, tmp_path, rows):
    src = os.path.join(str(tmp_path), "docs")
    spark.createDataFrame(
        rows, "doc_id string, text string, lang string"
    ).write.mode("overwrite").parquet(src)
    return src


class TestCurateComposition:
    def test_stage_survivor_counts(self, spark, tmp_path):
        src = _write(spark, tmp_path, _base_rows())
        out = os.path.join(str(tmp_path), "out")
        stats = curate(
            spark, src, out,
            ppl_drop=0.0, val_frac=0.2, test_frac=0.2,
        )
        # independently computed: 12 in; Gopher drops the 3-word d08;
        # C4 keeps every survivor (all lines sentence-terminated);
        # exact dedup drops d09 (byte-identical to d00, larger id);
        # MinHash drops d10 (the planted near-dup's larger id);
        # ppl_drop=0 keeps all.
        assert stats["input"] == 12
        assert stats["after_gopher"] == 11
        assert stats["after_c4"] == 11
        assert stats["after_exact_dedup"] == 10
        assert stats["after_neardup"] == 9
        assert stats["after_perplexity"] == 9
        assert (
            stats["split_train"] + stats["split_val"] + stats["split_test"]
            == 9
        )

        # stats.json is the returned dict
        with open(os.path.join(out, "stats.json")) as f:
            on_disk = json.load(f)
        assert on_disk == stats

        # split-partitioned layout + written rows match the stats
        cur = spark.read.parquet(os.path.join(out, "curated"))
        for s in ("train", "val", "test"):
            assert cur.filter(F.col("split") == s).count() == stats[
                f"split_{s}"
            ]
            if stats[f"split_{s}"]:
                assert os.path.isdir(
                    os.path.join(out, "curated", f"split={s}")
                )
        got_ids = {r["doc_id"] for r in cur.select("doc_id").collect()}
        assert got_ids == {f"d{i:02d}" for i in range(8)} | {"d11"}
        # survivors carry their perplexity score
        assert cur.filter(F.col("avg_nll").isNull()).count() == 0

    def test_optional_lang_and_dsir_stages(self, spark, tmp_path):
        rows = _base_rows()
        # two German docs on a disjoint word slice: NB trained on the
        # corpus's own labels separates them perfectly
        rows.append(("d12", _doc_text(14), "de"))
        rows.append(("d13", _doc_text(15), "de"))
        src = _write(spark, tmp_path, rows)
        out = os.path.join(str(tmp_path), "out2")
        stats = curate(
            spark, src, out,
            ppl_drop=0.0, val_frac=0.2, test_frac=0.2,
            lang_keep={"en"}, dsir_target="en", dsir_keep=5,
        )
        assert stats["input"] == 14
        assert stats["after_gopher"] == 13
        assert stats["after_exact_dedup"] == 12
        assert stats["after_neardup"] == 11
        assert stats["after_perplexity"] == 11
        assert stats["after_lang_filter"] == 9  # the two de docs out
        assert stats["after_dsir"] == 5  # exact-k Gumbel top-k
        assert (
            stats["split_train"] + stats["split_val"] + stats["split_test"]
            == 5
        )
        cur = spark.read.parquet(os.path.join(out, "curated"))
        assert cur.count() == 5
        assert {r["lang"] for r in cur.select("lang").collect()} == {"en"}

    def test_dsir_empty_target_raises(self, spark, tmp_path):
        src = _write(spark, tmp_path, _base_rows())
        out = os.path.join(str(tmp_path), "out3")
        with pytest.raises(SystemExit, match="matches no rows"):
            curate(
                spark, src, out,
                ppl_drop=0.0, dsir_target="zz", dsir_keep=3,
            )
