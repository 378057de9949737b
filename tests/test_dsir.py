"""DSIR importance resampling (operators/dsir.py) vs a pure-Python
mirror of the published recipe (Xie et al. 2023): hashed n-gram
featurization, add-alpha bucket models, log-likelihood-ratio weights,
deterministic Gumbel-top-k selection."""

import hashlib
import math
import re

import pytest


def _toks(text):
    return [t for t in re.split(r"[^0-9a-z_]+", text.lower()) if t]


def _bucket(g, B):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def _feats(text, B):
    toks = _toks(text)
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out = {}
    for g in grams:
        b = _bucket(g, B)
        out[b] = out.get(b, 0) + 1
    return out


def _mirror_weights(raw_rows, target_rows, B, alpha=1.0):
    cr, ct = {}, {}
    for _, t in raw_rows:
        for b, c in _feats(t, B).items():
            cr[b] = cr.get(b, 0) + c
    for _, t in target_rows:
        for b, c in _feats(t, B).items():
            ct[b] = ct.get(b, 0) + c
    tr, tt = sum(cr.values()), sum(ct.values())
    out = {}
    for d, t in raw_rows:
        f = _feats(t, B)
        if not f:
            continue
        lw = sum(
            c * (math.log((ct.get(b, 0) + alpha) / (tt + alpha * B))
                 - math.log((cr.get(b, 0) + alpha) / (tr + alpha * B)))
            for b, c in f.items()
        )
        out[d] = (sum(f.values()), round(lw, 6))
    return out


RAW = [
    ("r1", "the cat sat on the mat near the dog"),
    ("r2", "import numpy as np from collections import deque"),
    ("r3", "the dog and the cat play in the garden"),
    ("r4", "def main argv return zero exit code"),
    ("r5", ""),
]
TARGET = [
    ("t1", "the cat and the dog are friends in the garden"),
    ("t2", "a cat sat near a dog on a mat"),
]
B = 64


class TestFeaturize:
    def test_bucket_counts_vs_mirror(self, spark):
        from pawpaw_spark.operators.dsir import hashed_ngram_buckets

        df = spark.createDataFrame(RAW, "doc_id string, text string")
        got = {}
        for r in hashed_ngram_buckets(df, n_buckets=B).collect():
            got.setdefault(r.doc_id, {})[r.bucket] = r.c
        want = {d: _feats(t, B) for d, t in RAW if _feats(t, B)}
        assert got == want

    def test_empty_doc_has_no_features(self, spark):
        from pawpaw_spark.operators.dsir import hashed_ngram_buckets

        df = spark.createDataFrame(RAW, "doc_id string, text string")
        ids = {r.doc_id for r in
               hashed_ngram_buckets(df, n_buckets=B).collect()}
        assert "r5" not in ids


class TestWeights:
    def test_weights_vs_mirror(self, spark):
        from pawpaw_spark.operators.dsir import dsir_weights

        raw = spark.createDataFrame(RAW, "doc_id string, text string")
        tgt = spark.createDataFrame(TARGET, "doc_id string, text string")
        got = {r.doc_id: (r.n_feats, r.log_w)
               for r in dsir_weights(raw, tgt, n_buckets=B).collect()}
        assert got == _mirror_weights(RAW, TARGET, B)

    def test_targetlike_outranks_code(self, spark):
        # the English prose docs share target n-grams; the code-like
        # docs don't — DSIR's whole point
        from pawpaw_spark.operators.dsir import dsir_weights

        raw = spark.createDataFrame(RAW, "doc_id string, text string")
        tgt = spark.createDataFrame(TARGET, "doc_id string, text string")
        w = {r.doc_id: r.log_w
             for r in dsir_weights(raw, tgt, n_buckets=B).collect()}
        assert min(w["r1"], w["r3"]) > max(w["r2"], w["r4"])

    def test_alpha_validation(self, spark):
        from pawpaw_spark.operators.dsir import dsir_weights

        raw = spark.createDataFrame(RAW, "doc_id string, text string")
        tgt = spark.createDataFrame(TARGET, "doc_id string, text string")
        with pytest.raises(ValueError):
            dsir_weights(raw, tgt, n_buckets=B, alpha=0.0)


class TestGumbelTopK:
    def test_selection_vs_mirror_and_rerun(self, spark):
        from pawpaw_spark.operators.dsir import dsir_weights, gumbel_topk

        raw = spark.createDataFrame(RAW, "doc_id string, text string")
        tgt = spark.createDataFrame(TARGET, "doc_id string, text string")
        w = dsir_weights(raw, tgt, n_buckets=B)
        got = [(r.doc_id, r.score) for r in gumbel_topk(w, 2).collect()]
        # mirror: same hash noise chain
        mw = _mirror_weights(RAW, TARGET, B)
        scored = []
        for d, (_, lw) in mw.items():
            h = int(hashlib.md5(f"dsir:{d}".encode()).hexdigest()[:8], 16)
            u = (h + 0.5) / float(1 << 32)
            scored.append((d, round(lw + (-math.log(-math.log(u))), 6)))
        want = sorted(scored, key=lambda x: (-x[1], x[0]))[:2]
        assert got == want
        # deterministic across reruns / repartitionings
        again = [(r.doc_id, r.score)
                 for r in gumbel_topk(w.repartition(7), 2).collect()]
        assert again == got

    def test_seed_changes_selection_space(self, spark):
        from pawpaw_spark.operators.dsir import dsir_weights, gumbel_topk

        raw = spark.createDataFrame(RAW, "doc_id string, text string")
        tgt = spark.createDataFrame(TARGET, "doc_id string, text string")
        w = dsir_weights(raw, tgt, n_buckets=B)
        a = {r.doc_id: r.score for r in gumbel_topk(w, 4, seed="a").collect()}
        b = {r.doc_id: r.score for r in gumbel_topk(w, 4, seed="b").collect()}
        assert a != b  # different noise draws
