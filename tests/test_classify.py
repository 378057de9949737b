"""Naive Bayes classifier — operators/classify.py vs a pure-Python
mirror (same tokenizer, same md5 bucket hash, same add-1 smoothing,
same round-6 + label-asc argmax)."""

import hashlib
import math
import re

import pytest

from pawpaw_spark.operators.classify import nb_predict, nb_scores, nb_train

_TOK = re.compile(r"[^0-9a-z_]+")


def _grams_py(text):
    ws = [t for t in _TOK.split(text.lower()) if t]
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _bucket(g, n):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n


def mirror_train(rows, n_buckets):
    counts, docs, toks = {}, {}, {}
    for label, text in rows:
        docs[label] = docs.get(label, 0) + 1
        for g in _grams_py(text):
            b = _bucket(g, n_buckets)
            counts[(label, b)] = counts.get((label, b), 0) + 1
            toks[label] = toks.get(label, 0) + 1
    return counts, docs, toks


def mirror_predict(rows, counts, docs, toks, n_buckets):
    td = sum(docs.values())
    out = {}
    for doc_id, text in rows:
        best = None
        for label in sorted(docs):
            s = math.log(docs[label]) - math.log(td)
            for g in _grams_py(text):
                b = _bucket(g, n_buckets)
                n = counts.get((label, b), 0)
                s += math.log(n + 1.0) - math.log(
                    toks.get(label, 0) + float(n_buckets)
                )
            s = round(s, 6)
            if best is None or s > best[0] or (s == best[0] and label < best[1]):
                best = (s, label)
        out[doc_id] = best[1]
    return out


TRAIN = [
    ("en", "the cat sat on the mat and the dog barked"),
    ("en", "a quick brown fox jumps over the lazy dog"),
    ("en", "the rain in spain falls mainly on the plain"),
    ("fr", "le chat est sur le tapis et le chien aboie"),
    ("fr", "la pluie en espagne tombe surtout dans la plaine"),
    ("fr", "un renard brun rapide saute par dessus le chien"),
    ("de", "die katze sitzt auf der matte und der hund bellt"),
    ("de", "der schnelle braune fuchs springt ueber den hund"),
]
TEST = [
    (0, "the dog sat on the mat"),
    (1, "le chien est sur le tapis"),
    (2, "der hund sitzt auf der matte"),
    (3, "fox jumps over the dog"),
    (4, ""),  # gram-free: prior-only argmax
    (5, "zzz qqq xxx"),  # all-unseen grams
]
NB = 512


class TestNaiveBayes:
    @pytest.fixture(scope="class")
    def model(self, spark):
        df = spark.createDataFrame(TRAIN, "label string, text string")
        return nb_train(df, label_col="label", n_buckets=NB)

    def test_train_counts_match_mirror(self, spark, model):
        counts, priors = model
        mc, md, mt = mirror_train(TRAIN, NB)
        got = {(r.label, r.bucket): r.n for r in counts.collect()}
        assert got == mc
        gp = {r.label: (r.n_docs, r.n_tokens) for r in priors.collect()}
        assert gp == {l: (md[l], mt[l]) for l in md}

    def test_predict_matches_mirror(self, spark, model):
        counts, priors = model
        test = spark.createDataFrame(TEST, "doc_id long, text string")
        pred = nb_predict(test, counts, priors, n_buckets=NB)
        got = {r.doc_id: r.pred_label for r in pred.collect()}
        mc, md, mt = mirror_train(TRAIN, NB)
        assert got == mirror_predict(TEST, mc, md, mt, NB)
        # and the obvious language calls are right
        assert got[0] == "en" and got[1] == "fr" and got[2] == "de"

    def test_empty_doc_scores_prior_only(self, spark, model):
        counts, priors = model
        test = spark.createDataFrame([(4, "")], "doc_id long, text string")
        s = {
            r.label: r.score
            for r in nb_scores(test, counts, priors, n_buckets=NB).collect()
        }
        assert set(s) == {"en", "fr", "de"}
        assert s["en"] == round(math.log(3 / 8), 6)
        assert s["de"] == round(math.log(2 / 8), 6)

    def test_partitioning_invariance(self, spark, model):
        counts, priors = model
        test = spark.createDataFrame(TEST, "doc_id long, text string")
        p1 = nb_predict(test.coalesce(1), counts, priors, n_buckets=NB)
        p4 = nb_predict(test.repartition(4), counts, priors, n_buckets=NB)
        assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, p4.collect()))

    def test_bad_buckets_raise(self, spark):
        df = spark.createDataFrame(TRAIN, "label string, text string")
        with pytest.raises(ValueError, match="n_buckets"):
            nb_train(df, n_buckets=0)
