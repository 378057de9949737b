"""Flesch reading ease vs a from-first-principles Python recompute."""

import re

from pawpaw_spark.operators.text import flesch_reading_ease


def _py_flesch(text):
    w_raw = len(re.findall(r"[A-Za-z]+", text))
    s_raw = len(re.findall(r"[.!?]+", text))
    lower = text.lower()
    groups = len(re.findall(r"[aeiouy]+", lower))
    words = [x for x in re.split(r"[^a-z]+", lower) if x]
    silent = sum(1 for x in words if not re.search(r"[aeiouy]", x))
    y = groups + silent
    w, s = max(w_raw, 1), max(s_raw, 1)
    num = 206835 * s * w - 1015 * w * w - 84600 * y * s
    den = 1000 * s * w
    return w_raw, s_raw, y, round(num / den, 4)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return {
        r["doc_id"]: (
            r["n_words"], r["n_sentences"], r["n_syllables"], r["flesch"]
        )
        for r in flesch_reading_ease(df).collect()
    }


class TestFlesch:
    def test_known_texts(self, spark):
        rows = [
            ("simple", "The cat sat on the mat. The dog ran."),
            ("complex",
             "Notwithstanding institutional considerations, the "
             "administrative infrastructure necessitates comprehensive "
             "reorganization! Does it?"),
            ("no_sentences", "words without any terminator here"),
            ("vowelless", "Mr Nth Tsk. Hmm!"),
            ("empty", ""),
            ("digits", "In 1995, 42 things happened... twice?!"),
        ]
        got = _run(spark, rows)
        for k, t in rows:
            assert got[k] == _py_flesch(t), (k, got[k], _py_flesch(t))
        # sanity: simple text scores far above bureaucratic prose
        assert got["simple"][3] > got["complex"][3] + 40

    def test_vowelless_words_floor_one_syllable(self, spark):
        got = _run(spark, [("d", "tsk tsk brr.")])
        assert got["d"][2] == 3
