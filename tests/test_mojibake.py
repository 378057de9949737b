"""Mojibake repair vs the Python codec chain it inverts."""

from pawpaw_spark.operators.text import fix_mojibake


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return {
        r["doc_id"]: (r["fixed"], r["was_fixed"], r["n_marks"])
        for r in fix_mojibake(df).collect()
    }


def _corrupt(s: str) -> str:
    """The corruption the operator inverts: UTF-8 bytes read as Latin-1."""
    return s.encode("utf-8").decode("latin-1")


class TestMojibake:
    def test_two_byte_sequences_repair(self, spark):
        clean = ["café", "naïve", "straße", "niño"]
        rows = [(f"d{i}", _corrupt(s)) for i, s in enumerate(clean)]
        got = _run(spark, rows)
        for i, s in enumerate(clean):
            fixed, was, marks = got[f"d{i}"]
            assert fixed == s and was and marks >= 1

    def test_three_byte_sequence_repairs(self, spark):
        # U+20AC euro: E2 82 AC -> all chars <= FF when read as Latin-1
        s = "price €5"
        got = _run(spark, [("d0", _corrupt(s))])
        assert got["d0"][0] == s and got["d0"][1]

    def test_clean_text_untouched(self, spark):
        rows = [("a", "plain ascii"), ("b", "café naïve")]
        got = _run(spark, rows)
        assert got["a"] == ("plain ascii", False, 0)
        # real accents alone never match the lead+continuation signature
        assert got["b"] == ("café naïve", False, 0)

    def test_mixed_unicode_gated(self, spark):
        # mojibake marks + a CJK char: Latin-1 re-encode can't reproduce
        # the bytes, so the row must pass through UNCHANGED
        t = _corrupt("café") + " 語"
        got = _run(spark, [("d0", t)])
        assert got["d0"][0] == t and not got["d0"][1]
        assert got["d0"][2] >= 1  # still detected

    def test_invalid_utf8_signature_gated(self, spark):
        # E3 81 then ASCII: matches the signature but is not valid
        # UTF-8 — the U+FFFD guard keeps the row byte-identical
        t = "x ãx y"
        got = _run(spark, [("d0", t)])
        assert got["d0"][0] == t and not got["d0"][1]

    def test_double_mojibake_single_pass(self, spark):
        # corrupt twice -> one repair pass unwinds exactly one layer
        s = "café"
        twice = _corrupt(_corrupt(s))
        got = _run(spark, [("d0", twice)])
        assert got["d0"][0] == _corrupt(s) and got["d0"][1]

    def test_differential_random_latin_phrases(self, spark):
        base = [
            "résumé and déjà vu",
            "über alles",
            "Garçon!",
            "Ångström",
            "touché — em dash",  # U+2014: 3-byte sequence
        ]
        rows = [(f"d{i}", _corrupt(s)) for i, s in enumerate(base)]
        got = _run(spark, rows)
        for i, s in enumerate(base):
            assert got[f"d{i}"][0] == s, s
