"""BM25 search scored against a from-first-principles Python oracle,
plus the C4 line-filter heuristics (operators/text.c4_filters)."""

import math

import pytest
from pyspark.sql import functions as F

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark shuffles the fox data across the cluster"),
    (2, "a lazy dog sleeps"),
    (3, "quick quick quick fox"),
    (4, "nothing relevant here at all"),
    (5, "   "),  # whitespace-only: zero tokens, never matches
]


def py_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    if avgdl == 0:
        return {}  # no tokens anywhere -> nothing can match
    dfreq = {q: sum(1 for v in toks.values() if q in v) for q in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for q in terms:
            tf = v.count(q)
            idf = math.log(1 + (n - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if any(q in v for q in terms):
            out[i] = s
    return out


class TestBM25:
    def test_scores_match_python_oracle(self, spark):
        from pawpaw_spark.operators.search import bm25_scores

        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        got = {
            r.doc_id: r.score
            for r in bm25_scores(df, ["fox", "lazy"]).collect()
        }
        want = py_bm25(CORPUS, ["fox", "lazy"])
        assert set(got) == set(want)
        for i in got:
            assert got[i] == pytest.approx(want[i], rel=1e-12)

    def test_topk_order_and_tiebreak(self, spark):
        from pawpaw_spark.operators.search import bm25_topk

        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        rows = bm25_topk(df, ["fox"], k=3).collect()
        want = py_bm25(CORPUS, ["fox"])
        expect = sorted(want, key=lambda i: (-want[i], i))[:3]
        assert [r.doc_id for r in rows] == expect

    def test_higher_tf_scores_higher_same_dl(self, spark):
        from pawpaw_spark.operators.search import bm25_scores

        df = spark.createDataFrame(
            [(0, "fox cat dog bird"), (1, "fox fox dog bird")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.score for r in bm25_scores(df, ["fox"]).collect()}
        assert got[1] > got[0]

    def test_empty_terms_raise(self, spark):
        from pawpaw_spark.operators.search import bm25_scores

        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        with pytest.raises(ValueError):
            bm25_scores(df, [])


class TestC4Filters:
    def test_line_and_doc_rules(self, spark):
        from pawpaw_spark.operators.text import c4_filters

        docs = [
            # 3 good sentences -> keep
            (0, "This is a good first line.\nHere is another proper line!\nAnd a third full sentence?"),
            # only 2 sentences -> drop
            (1, "This is a good first line.\nHere is another proper line."),
            # short line + unterminated line don't count
            (2, "One good line sits right here.\ntiny line\nno terminal punctuation on this line\nA second full sentence stands here.\nA third full sentence stands here."),
            # lorem ipsum anywhere kills the doc
            (3, "A first full sentence right here.\nA second full sentence right here.\nlorem ipsum dolor sit amet."),
            # curly brace anywhere kills the doc
            (4, "A first full sentence right here.\nA second full sentence right here.\nA third but config { present }."),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {r.doc_id: r for r in c4_filters(df).collect()}
        assert out[0].keep and out[0].n_kept_lines == 3 and out[0].n_sentences == 3
        assert not out[1].keep and out[1].n_sentences == 2
        assert out[2].n_lines == 5 and out[2].n_kept_lines == 3 and out[2].keep
        assert not out[3].keep and out[3].has_lorem
        assert not out[4].keep and out[4].has_brace

    def test_clean_text_is_kept_lines_joined(self, spark):
        from pawpaw_spark.operators.text import c4_filters

        df = spark.createDataFrame(
            [(0, "Keep this full proper sentence.\nskip\nKeep this other proper sentence.")],
            "doc_id long, text string",
        )
        row = c4_filters(df).first()
        assert row.clean_text == (
            "Keep this full proper sentence.\nKeep this other proper sentence."
        )


class TestInvertedIndex:
    def test_indexed_equals_brute_bitwise(self, spark, tmp_path_factory):
        from pawpaw_spark.operators.search import (
            bm25_scores,
            bm25_scores_from_index,
            build_inverted_index,
        )

        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        path = str(tmp_path_factory.mktemp("inv_idx"))
        build_inverted_index(df, path, n_buckets=16)
        terms = ["fox", "lazy", "cluster"]
        brute = {
            (r.doc_id, r.dl): r.score for r in bm25_scores(df, terms).collect()
        }
        indexed = {
            (r.doc_id, r.dl): r.score
            for r in bm25_scores_from_index(spark, path, terms).collect()
        }
        assert brute == indexed  # exact float equality, not approx

    def test_scan_prunes_to_query_buckets(self, spark, tmp_path_factory):
        from pawpaw_spark.operators.search import (
            bm25_scores_from_index,
            build_inverted_index,
        )

        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        path = str(tmp_path_factory.mktemp("inv_idx2"))
        build_inverted_index(df, path, n_buckets=64)
        out = bm25_scores_from_index(spark, path, ["fox"])
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "PartitionFilters" in plan and "tok_bucket" in plan, plan

    def test_bucket_count_from_sidecar(self, spark, tmp_path_factory):
        """An index built with a non-default modulus still answers
        correctly — the query derives buckets from meta, never a
        caller-supplied (and possibly wrong) constant."""
        from pawpaw_spark.operators.search import (
            bm25_scores,
            bm25_scores_from_index,
            build_inverted_index,
        )

        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        path = str(tmp_path_factory.mktemp("inv_idx3"))
        build_inverted_index(df, path, n_buckets=3)
        got = {
            r.doc_id: r.score
            for r in bm25_scores_from_index(spark, path, ["dog"]).collect()
        }
        want = {r.doc_id: r.score for r in bm25_scores(df, ["dog"]).collect()}
        assert got == want


# --- property-based differential tests (one Spark job per example set,
# not per example: hypothesis generates corpora, Spark scores them in
# small batches to keep runtime sane) ---

from hypothesis import given, settings, strategies as st

WORDS = st.sampled_from(
    "the fox dog lazy quick spark data row alpha beta Gamma DOG".split()
)
DOC = st.lists(WORDS, min_size=0, max_size=12).map(" ".join)


class TestBM25Property:
    @given(docs=st.lists(DOC, min_size=2, max_size=8))
    @settings(max_examples=25, deadline=None, derandomize=True)
    def test_matches_python_reference(self, spark, docs):
        from pawpaw_spark.operators.search import bm25_scores

        corpus = list(enumerate(docs))
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {r.doc_id: r.score for r in bm25_scores(df, ["fox", "dog"]).collect()}
        want = py_bm25(corpus, ["fox", "dog"])
        assert set(got) == set(want)
        for i in got:
            assert got[i] == pytest.approx(want[i], rel=1e-12)


def py_c4(text, min_line_words=5, min_sentences=3):
    lines = text.split("\n")
    kept = [
        l for l in lines
        if len(l.split()) >= min_line_words
        and __import__("re").search(r'[.!?"]\s*$', l)
    ]
    clean = "\n".join(kept)
    n_sent = sum(clean.count(c) for c in ".!?")
    has_lorem = "lorem ipsum" in text.lower()
    has_brace = "{" in text
    return (
        len(lines), len(kept), n_sent, has_lorem, has_brace,
        n_sent >= min_sentences and not has_lorem and not has_brace,
    )


LINE = st.lists(
    st.sampled_from(
        'word sentence. stop! what? quote" lorem ipsum { tail'.split(" ")
    ),
    min_size=0,
    max_size=7,
).map(" ".join)


class TestC4Property:
    @given(docs=st.lists(st.lists(LINE, min_size=1, max_size=5).map("\n".join),
                         min_size=1, max_size=6))
    @settings(max_examples=25, deadline=None, derandomize=True)
    def test_matches_python_reference(self, spark, docs):
        from pawpaw_spark.operators.text import c4_filters

        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        got = {
            r.doc_id: (
                r.n_lines, r.n_kept_lines, r.n_sentences,
                r.has_lorem, r.has_brace, r.keep,
            )
            for r in c4_filters(df).collect()
        }
        want = {i: py_c4(t) for i, t in enumerate(docs)}
        assert got == want


class TestGopherFilters:
    def test_signals_and_keep(self, spark):
        from pawpaw_spark.operators.text import gopher_filters

        rows = [
            ("good", "The quick brown fox jumps over the lazy dog and "
                     "runs to a town of note that we have seen. " * 3),
            ("short", "tiny doc with few words"),
            ("bullets", "\n".join(f"- item {i} of the list"
                                  for i in range(10))),
            ("symbols", "# " * 60 + "the of and that"),
            ("ellipses", "\n".join("we trailed off the end..."
                                   for _ in range(4))),
            ("empty", ""),
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        out = {r.doc_id: r for r in
               gopher_filters(df, min_words=20).collect()}
        g = out["good"]
        assert g.keep and g.alpha_frac == 1.0 and g.stop_hits >= 2
        assert not out["short"].keep  # below min_words
        b = out["bullets"]
        assert b.bullet_frac == 1.0 and not b.keep
        s = out["symbols"]
        assert s.symbol_ratio > 0.9 and s.alpha_frac < 0.8 and not s.keep
        e = out["ellipses"]
        assert e.ellipsis_frac == 1.0 and not e.keep
        em = out["empty"]
        # empty doc fails CLOSED: NULL signals coalesce to keep=False
        assert em.n_words == 0 and em.keep is False

    def test_thresholds_are_parameters(self, spark):
        from pawpaw_spark.operators.text import gopher_filters

        df = spark.createDataFrame(
            [("d", "the cat and the dog have fun with all of that")],
            "doc_id string, text string",
        )
        strict = gopher_filters(df).collect()[0]      # min_words=50
        loose = gopher_filters(df, min_words=5).collect()[0]
        assert not strict.keep and loose.keep


class TestBigramLm:
    def test_counts_and_score_vs_mirror(self, spark):
        import math

        from pawpaw_spark.operators.lm import bigram_lm, perplexity_score

        rows = [("a", "the cat sat on the mat"),
                ("b", "the dog sat"),
                ("c", "cat mat cat")]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        uni, bi, V = bigram_lm(df)
        u = {r.w: r.c for r in uni.collect()}
        b = {(r.w1, r.w2): r.c for r in bi.collect()}
        # mirror counts
        toks = {d: t.split() for d, t in rows}
        mu, mb = {}, {}
        for t in toks.values():
            for w in t:
                mu[w] = mu.get(w, 0) + 1
            for x, y in zip(t, t[1:]):
                mb[(x, y)] = mb.get((x, y), 0) + 1
        assert u == mu and b == mb and V == len(mu)
        got = {r.doc_id: (r.n_transitions, r.avg_nll)
               for r in perplexity_score(df, uni, bi, V).collect()}
        for d, t in toks.items():
            nlls = [
                -math.log((mb.get((x, y), 0) + 1.0) / (mu[x] + V))
                for x, y in zip(t, t[1:])
            ]
            assert got[d][0] == len(nlls)
            assert got[d][1] == round(sum(nlls) / len(nlls), 6)

    def test_min_count_prunes_to_unseen(self, spark):
        from pawpaw_spark.operators.lm import bigram_lm, perplexity_score

        df = spark.createDataFrame(
            [("a", "x y x y x y"), ("b", "p q")],
            "doc_id string, text string",
        )
        uni, bi, V = bigram_lm(df, min_count=2)
        kept = {(r.w1, r.w2) for r in bi.collect()}
        assert ("p", "q") not in kept and ("x", "y") in kept
        # the pruned pair scores as unseen but still scores
        out = {r.doc_id: r for r in
               perplexity_score(df, uni, bi, V).collect()}
        assert out["b"].n_transitions == 1

    def test_single_token_docs_drop(self, spark):
        from pawpaw_spark.operators.lm import bigram_lm, perplexity_score

        df = spark.createDataFrame(
            [("a", "hello"), ("b", "two words")],
            "doc_id string, text string",
        )
        uni, bi, V = bigram_lm(df)
        ids = {r.doc_id for r in
               perplexity_score(df, uni, bi, V).collect()}
        assert ids == {"b"}


def _kn_mirror(train_rows, score_rows, D=0.75):
    """Pure-Python interpolated KN bigram mirror (Chen & Goodman eq.
    4.25-4.27), same fallbacks as the engine."""
    import math

    mb = {}
    for _, t in train_rows:
        for x, y in zip(t.split(), t.split()[1:]):
            mb[(x, y)] = mb.get((x, y), 0) + 1
    c1, nf, np_ = {}, {}, {}
    for (x, y), c in mb.items():
        c1[x] = c1.get(x, 0) + c
        nf[x] = nf.get(x, 0) + 1
        np_[y] = np_.get(y, 0) + 1
    T = len(mb)
    out = {}
    for d, t in score_rows:
        nlls = []
        for x, y in zip(t.split(), t.split()[1:]):
            pcont = np_[y] / float(T) if y in np_ else 1.0 / T
            if x in c1:
                p = (max(mb.get((x, y), 0) - D, 0.0)
                     + D * nf[x] * pcont) / c1[x]
            else:
                p = pcont
            nlls.append(-math.log(p))
        if nlls:
            out[d] = (len(nlls), round(sum(nlls) / len(nlls), 6))
    return out


class TestKneserNey:
    ROWS = [("a", "the cat sat on the mat"),
            ("b", "the dog sat on the cat"),
            ("c", "cat mat cat the cat")]

    def test_score_vs_mirror(self, spark):
        from pawpaw_spark.operators.lm import bigram_lm, kneser_ney_score

        df = spark.createDataFrame(self.ROWS, "doc_id string, text string")
        _, bi, _ = bigram_lm(df)
        got = {r.doc_id: (r.n_transitions, r.avg_nll)
               for r in kneser_ney_score(df, bi).collect()}
        assert got == _kn_mirror(self.ROWS, self.ROWS)

    def test_distribution_normalizes(self, spark):
        # sum_{w2 seen as a continuation} p(w2|w1) == 1 for every seen
        # context: the property that distinguishes true KN stats (context
        # counts from the bigram table) from the unigram-count shortcut
        from pawpaw_spark.operators.lm import bigram_lm, kn_stats

        df = spark.createDataFrame(self.ROWS, "doc_id string, text string")
        _, bi, _ = bigram_lm(df)
        ctx, cont, T = kn_stats(bi)
        b = {(r.w1, r.w2): r.c for r in bi.collect()}
        c1 = {r.w1: (r.c1, r.n_follow) for r in ctx.collect()}
        np_ = {r.w: r.n_prec for r in cont.collect()}
        D = 0.75
        for w1, (c, nfol) in c1.items():
            s = sum(
                (max(b.get((w1, w2), 0) - D, 0.0)
                 + D * nfol * (np_[w2] / T)) / c
                for w2 in np_
            )
            assert abs(s - 1.0) < 1e-12

    def test_unseen_context_and_word_fallbacks(self, spark):
        from pawpaw_spark.operators.lm import bigram_lm, kneser_ney_score

        df = spark.createDataFrame(self.ROWS, "doc_id string, text string")
        _, bi, _ = bigram_lm(df)
        novel = [("z", "zebra quagga the cat")]  # unseen ctx + unseen cont
        out = {r.doc_id: (r.n_transitions, r.avg_nll) for r in
               kneser_ney_score(
                   spark.createDataFrame(
                       novel, "doc_id string, text string"),
                   bi).collect()}
        assert out == _kn_mirror(self.ROWS, novel)

    def test_discount_validation(self, spark):
        import pytest

        from pawpaw_spark.operators.lm import bigram_lm, kneser_ney_score

        df = spark.createDataFrame(self.ROWS, "doc_id string, text string")
        _, bi, _ = bigram_lm(df)
        for bad in (0.0, 1.0, -0.5, 1.5):
            with pytest.raises(ValueError):
                kneser_ney_score(df, bi, discount=bad)
