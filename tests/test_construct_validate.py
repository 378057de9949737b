"""Tests for the round-4 declarative-layer additions: SPARQL CONSTRUCT,
RDFS (rho-df) entailment, SHACL-lite validation, exact-integer
modularity, and distributed BPE training (diff-tested against a pure
Python reference implementation of the Sennrich algorithm)."""

import pytest
from pyspark.sql import functions as F

from pawpaw_spark.operators.bpe import (
    bpe_train,
    encode,
    encode_wordpiece,
    pair_counts,
    symbol_counts,
    to_symbols,
    to_symbols_wordpiece,
    word_freqs,
    wordpiece_pair_scores,
    wordpiece_train,
)
from pawpaw_spark.operators.graph import modularity_terms
from pawpaw_spark.operators.unigram import (
    encode_unigram,
    seed_pieces,
    unigram_train,
)
from pawpaw_spark.operators.graph_query import construct
from pawpaw_spark.operators.rdfs import rdfs_closure
from pawpaw_spark.operators.validate import shacl_report


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _t(df):
    return {tuple(r) for r in df.collect()}


# ---------------------------------------------------------------- CONSTRUCT


class TestConstruct:
    def test_emits_template_triples(self, spark):
        e = _triples(
            spark,
            [
                ("f1", "DEFINES", "s1"),
                ("f2", "DEFINES", "s2"),
                ("s1", "REFERENCES", "s2"),
            ],
        )
        out = construct(
            e,
            [
                ("?f", "DEFINES", "?s"),
                ("?s", "REFERENCES", "?t"),
                ("?g", "DEFINES", "?t"),
            ],
            [("?f", "DEPENDS_ON", "?g"), ("?g", "PROVIDES_TO", "?f")],
            neq=[("?f", "?g")],
        )
        assert _t(out) == {
            ("f1", "DEPENDS_ON", "f2"),
            ("f2", "PROVIDES_TO", "f1"),
        }

    def test_optional_null_skips_template_row(self, spark):
        # s2's target s3 is defined nowhere -> the DEFINED_IN template
        # row is skipped for that binding, the CALLS row is kept
        e = _triples(
            spark,
            [
                ("f1", "DEFINES", "s1"),
                ("f2", "DEFINES", "s2"),
                ("s1", "REFERENCES", "s2"),
                ("s2", "REFERENCES", "s3"),
            ],
        )
        out = construct(
            e,
            [("?s", "REFERENCES", "?t")],
            [("?s", "CALLS", "?t"), ("?t", "DEFINED_IN", "?g")],
            optional=[[("?g", "DEFINES", "?t")]],
        )
        assert _t(out) == {
            ("s1", "CALLS", "s2"),
            ("s2", "CALLS", "s3"),
            ("s2", "DEFINED_IN", "f2"),
        }

    def test_constant_and_var_predicate_templates(self, spark):
        e = _triples(spark, [("a", "CALLS", "b"), ("a", "IMPORTS", "c")])
        out = construct(
            e,
            [("?x", "?p", "?y")],
            [("?y", "?p", "?x"), ("?x", "TOUCHES", "?y")],
        )
        assert ("b", "CALLS", "a") in _t(out)
        assert ("a", "TOUCHES", "c") in _t(out)

    def test_distinct_across_templates(self, spark):
        e = _triples(spark, [("a", "CALLS", "b"), ("b", "CALLS", "a")])
        out = construct(
            e,
            [("?x", "CALLS", "?y")],
            [("?x", "LINKED", "?y"), ("?y", "LINKED", "?x")],
        )
        # both templates produce both orientations; the result is a SET
        assert _t(out) == {("a", "LINKED", "b"), ("b", "LINKED", "a")}

    def test_unbound_template_var_raises(self, spark):
        e = _triples(spark, [("a", "CALLS", "b")])
        with pytest.raises(ValueError, match="not bound"):
            construct(e, [("?x", "CALLS", "?y")], [("?x", "CALLS", "?z")])

    def test_path_template_predicate_raises(self, spark):
        e = _triples(spark, [("a", "CALLS", "b")])
        with pytest.raises(ValueError, match="template predicate"):
            construct(e, [("?x", "CALLS", "?y")], [("?x", "A/B", "?y")])


# ------------------------------------------------------------------- RDFS


_SCHEMA = [
    ("DEFINES", "subPropertyOf", "MENTIONS"),
    ("REFERENCES", "subPropertyOf", "MENTIONS"),
    ("MENTIONS", "subPropertyOf", "RELATES"),
    ("DEFINES", "domain", "File"),
    ("REFERENCES", "range", "Callee"),
    ("File", "subClassOf", "Resource"),
    ("Callee", "subClassOf", "Symbol"),
    ("Symbol", "subClassOf", "Resource"),
]


class TestRdfs:
    def test_full_entailment(self, spark):
        data = [
            ("f1", "DEFINES", "s1"),
            ("s1", "REFERENCES", "s2"),
            ("x", "type", "Callee"),
        ]
        out = rdfs_closure(_triples(spark, _SCHEMA + data))
        got = _t(out)
        # sub-property inheritance, one and two levels up
        assert ("f1", "MENTIONS", "s1") in got
        assert ("f1", "RELATES", "s1") in got
        assert ("s1", "RELATES", "s2") in got
        # transitive schema facts
        assert ("DEFINES", "subPropertyOf", "RELATES") in got
        assert ("Callee", "subClassOf", "Resource") in got
        # domain/range typing + subclass propagation
        assert ("f1", "type", "File") in got
        assert ("f1", "type", "Resource") in got
        assert ("s2", "type", "Callee") in got
        assert ("s2", "type", "Symbol") in got
        assert ("s2", "type", "Resource") in got
        # asserted type propagates too
        assert ("x", "type", "Symbol") in got
        # base facts are NOT in the derived-only output
        assert ("f1", "DEFINES", "s1") not in got

    def test_domain_applies_to_inherited_triples(self, spark):
        # MENTIONS itself has a domain; the (f1, MENTIONS, s1) triple
        # only exists AFTER inheritance, and must still be typed
        schema = _SCHEMA + [("MENTIONS", "domain", "Mentioner")]
        data = [("f1", "DEFINES", "s1")]
        got = _t(rdfs_closure(_triples(spark, schema + data)))
        assert ("f1", "type", "Mentioner") in got

    def test_include_base(self, spark):
        data = [("f1", "DEFINES", "s1")]
        got = _t(
            rdfs_closure(_triples(spark, _SCHEMA + data), include_base=True)
        )
        assert ("f1", "DEFINES", "s1") in got
        assert ("f1", "MENTIONS", "s1") in got

    def test_vocab_target_raises(self, spark):
        bad = [("MYPRED", "subPropertyOf", "type"), ("a", "MYPRED", "b")]
        with pytest.raises(ValueError, match="reserved vocabulary"):
            rdfs_closure(_triples(spark, bad)).collect()

    def test_no_schema_is_empty(self, spark):
        out = rdfs_closure(_triples(spark, [("a", "CALLS", "b")]))
        assert out.count() == 0


# ------------------------------------------------------------------ SHACL


class TestShacl:
    def _kg(self, spark):
        return _triples(
            spark,
            [
                ("f1", "DEFINES", "s1"),
                ("f1", "DEFINES", "s1b"),
                ("f2", "DEFINES", "s2"),
                ("s1", "REFERENCES", "s2"),
                ("s1", "REFERENCES", "missing!"),
                ("s2", "REFERENCES", "s1"),
                ("s1", "type", "Sym"),
                ("s2", "type", "Sym"),
            ],
        )

    def test_counts_class_pattern(self, spark):
        rep = shacl_report(
            self._kg(spark),
            [
                {
                    "name": "FileShape",
                    "target_subjects_of": "DEFINES",
                    "constraints": [
                        {"path": "DEFINES", "min_count": 2},
                        {"path": "DEFINES", "max_count": 1},
                    ],
                },
                {
                    "name": "SymShape",
                    "target_class": "Sym",
                    "constraints": [
                        {"path": "REFERENCES", "class": "Sym"},
                        {"path": "REFERENCES", "pattern": "^[a-z0-9]+$"},
                    ],
                },
            ],
        )
        got = {(r.shape, r.focus, r.constraint): (r.n, r.conforms) for r in rep.collect()}
        assert got[("FileShape", "f1", "min_count:DEFINES")] == (2, True)
        assert got[("FileShape", "f2", "min_count:DEFINES")] == (1, False)
        assert got[("FileShape", "f1", "max_count:DEFINES")] == (2, False)
        assert got[("SymShape", "s1", "class:REFERENCES")] == (1, False)
        assert got[("SymShape", "s2", "class:REFERENCES")] == (0, True)
        assert got[("SymShape", "s1", "pattern:REFERENCES")] == (1, False)
        assert got[("SymShape", "s2", "pattern:REFERENCES")] == (0, True)
        # one row per focus per constraint, conforming rows included
        assert len(got) == 2 * 2 + 2 * 2

    def test_zero_value_focus_conforms_class(self, spark):
        t = _triples(
            spark, [("a", "type", "Sym"), ("b", "REFERENCES", "c")]
        )
        rep = shacl_report(
            t,
            [
                {
                    "name": "S",
                    "target_class": "Sym",
                    "constraints": [{"path": "REFERENCES", "class": "Sym"}],
                }
            ],
        )
        rows = rep.collect()
        assert len(rows) == 1 and rows[0].n == 0 and rows[0].conforms

    def test_validation_errors(self, spark):
        t = self._kg(spark)
        with pytest.raises(ValueError, match="exactly one of target"):
            shacl_report(t, [{"name": "S", "constraints": [{}]}])
        with pytest.raises(ValueError, match="exactly one of"):
            shacl_report(
                t,
                [
                    {
                        "name": "S",
                        "target_class": "Sym",
                        "constraints": [
                            {"path": "X", "min_count": 1, "max_count": 2}
                        ],
                    }
                ],
            )
        with pytest.raises(ValueError, match="duplicate constraint"):
            shacl_report(
                t,
                [
                    {
                        "name": "S",
                        "target_class": "Sym",
                        "constraints": [
                            {"path": "X", "min_count": 1},
                            {"path": "X", "min_count": 2},
                        ],
                    }
                ],
            )


# -------------------------------------------------------------- modularity


class TestModularity:
    def test_two_cliques_and_bridge(self, spark):
        # K3 {a,b,c} + K3 {d,e,f} + one bridge c-d; m = 7
        edges = spark.createDataFrame(
            [
                ("a", "b"), ("b", "c"), ("a", "c"),
                ("d", "e"), ("e", "f"), ("d", "f"),
                ("c", "d"),
                # noise the canonicalization must collapse:
                ("b", "a"), ("c", "c"),
            ],
            "src string, dst string",
        )
        comm = spark.createDataFrame(
            [("a", 1), ("b", 1), ("c", 1), ("d", 2), ("e", 2), ("f", 2)],
            "node string, community int",
        )
        out = {r.community: r for r in modularity_terms(edges, comm).collect()}
        m = 7
        for c in (1, 2):
            r = out[c]
            assert r.n_nodes == 3 and r.in_edges == 3 and r.deg_sum == 7
            assert r.contrib == 4 * m * 3 - 7 * 7
        q = sum(r.contrib for r in out.values()) / (4 * m * m)
        # textbook: Q = 2*(3/7 - (7/14)^2) = 6/7 - 1/2
        assert abs(q - (6 / 7 - 0.5)) < 1e-12

    def test_partial_assignment_and_empty_community(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "src string, dst string"
        )
        comm = spark.createDataFrame(
            [("a", 1), ("b", 2)], "node string, community int"
        )
        out = {r.community: r for r in modularity_terms(edges, comm).collect()}
        assert out[1].in_edges == 0 and out[1].deg_sum == 1
        assert out[2].in_edges == 0 and out[2].deg_sum == 2
        assert out[1].contrib == -1 and out[2].contrib == -4


# --------------------------------------------------------------------- BPE


def _py_bpe(word_freq: dict, num_merges: int):
    """Pure-Python reference: Sennrich learn_bpe with min pair count 2
    and lexicographic tie-break — the algorithm bpe_train distributes."""
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in word_freq.items()}
    merges = []
    for _ in range(num_merges):
        pairs: dict = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + f
                )
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _n = best
        merges.append((a, b))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges, vocab


CORPUS = (
    "low low low low low lower lower newest newest newest newest "
    "newest newest widest widest widest banana bandana anna"
)


class TestBpe:
    def test_word_freqs_and_pair_counts(self, spark):
        docs = spark.createDataFrame([(CORPUS,)], "text string")
        wf = {r.word: r.freq for r in word_freqs(docs).collect()}
        assert wf["low"] == 5 and wf["newest"] == 6 and wf["anna"] == 1
        pc = {
            (r.a, r.b): r.n
            for r in pair_counts(to_symbols(word_freqs(docs))).collect()
        }
        # 'lo' appears in low(5) + lower(2); 'w</w>' only in low(5)
        assert pc[("l", "o")] == 7
        assert pc[("w", "</w>")] == 5
        # overlapping pairs count naively: anna has ('n','n') once,
        # banana ('a','n') twice + bandana twice + anna once
        assert pc[("a", "n")] == 5

    def test_train_matches_reference(self, spark):
        docs = spark.createDataFrame([(CORPUS,)], "text string")
        wf_df = word_freqs(docs)
        wf = {r.word: r.freq for r in wf_df.collect()}
        for k in (1, 5, 12):
            ref_merges, ref_vocab = _py_bpe(wf, k)
            merges, syms = bpe_train(wf_df, k, checkpoint_every=3)
            assert merges == ref_merges, f"k={k}"
            got_vocab = {
                tuple(r.syms): r.freq
                for r in syms.groupBy("syms")
                .agg(F.sum("freq").alias("freq"))
                .collect()
            }
            assert got_vocab == dict(ref_vocab), f"k={k}"
            syms.unpersist()

    def test_encode_roundtrip(self, spark):
        docs = spark.createDataFrame([(CORPUS,)], "text string")
        merges, syms = bpe_train(word_freqs(docs), 8)
        out = encode(
            spark.createDataFrame(
                [(1, "low lower newest"), (2, "unseen")],
                "id int, text string",
            ),
            merges,
        )
        rows = {r.id: r.tokens for r in out.collect()}
        # detokenizing restores the text: concatenation minus the
        # end-of-word markers
        for rid, text in ((1, "low lower newest"), (2, "unseen")):
            flat = "".join(rows[rid]).replace("</w>", " ").strip()
            assert flat == text
        # trained subwords actually fuse: 'newest</w>' is 6+1 chars but
        # fewer tokens after 8 merges
        assert len(rows[1]) < len("lowlowernewest") + 3
        syms.unpersist()

    def test_early_stop_on_singletons(self, spark):
        wf = spark.createDataFrame(
            [("ab", 1), ("cd", 1)], "word string, freq long"
        )
        merges, syms = bpe_train(wf, 10)
        assert merges == []
        syms.unpersist()


def _py_wordpiece(word_freq: dict, num_merges: int):
    """Pure-Python reference: WordPiece training — argmax of
    float(n)/(float(na)*float(nb)) (the exact IEEE expression the
    distributed scorer evaluates), lexicographic tie-break, min pair
    count 2, ##-continuation fusion."""
    vocab = {
        tuple([w[0]] + ["##" + c for c in w[1:]]): f
        for w, f in word_freq.items()
    }
    merges = []
    for _ in range(num_merges):
        pairs: dict = {}
        singles: dict = {}
        for syms, f in vocab.items():
            for s in syms:
                singles[s] = singles.get(s, 0) + f
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + f
                )
        if not pairs:
            break
        best = min(
            pairs.items(),
            key=lambda kv: (
                -(float(kv[1]) / (float(singles[kv[0][0]])
                                  * float(singles[kv[0][1]]))),
                kv[0],
            ),
        )
        if best[1] < 2:
            break
        (a, b), _n = best
        merged = a + (b[2:] if b.startswith("##") else b)
        merges.append(merged)
        new_vocab: dict = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges, vocab


class TestWordPiece:
    def test_symbols_and_scores(self, spark):
        docs = spark.createDataFrame([(CORPUS,)], "text string")
        wf = word_freqs(docs)
        syms = {
            r.word: list(r.syms)
            for r in to_symbols_wordpiece(wf).collect()
        }
        assert syms["low"] == ["l", "##o", "##w"]
        sc = {r.s: r.n for r in symbol_counts(to_symbols_wordpiece(wf)).collect()}
        # 'l' word-initial in low(5)+lower(2); '##o' in both as well
        assert sc["l"] == 7 and sc["##o"] == 7
        scores = {
            (r.a, r.b): (r.n, r.score)
            for r in wordpiece_pair_scores(to_symbols_wordpiece(wf)).collect()
        }
        n, s = scores[("l", "##o")]
        assert n == 7 and s == float(7) / (float(7) * float(7))

    def test_train_matches_reference(self, spark):
        docs = spark.createDataFrame([(CORPUS,)], "text string")
        wf_df = word_freqs(docs)
        wf = {r.word: r.freq for r in wf_df.collect()}
        for k in (1, 5, 12):
            ref_merges, ref_vocab = _py_wordpiece(wf, k)
            merges, syms = wordpiece_train(wf_df, k, checkpoint_every=3)
            assert merges == ref_merges, f"k={k}"
            got_vocab = {
                tuple(r.syms): r.freq
                for r in syms.groupBy("syms")
                .agg(F.sum("freq").alias("freq"))
                .collect()
            }
            assert got_vocab == dict(ref_vocab), f"k={k}"
            syms.unpersist()

    def test_encode_longest_match(self, spark):
        vocab = ["l", "##o", "##w", "low", "##er", "n", "##ew",
                 "##e", "##s", "##t", "##west"]
        out = encode_wordpiece(
            spark.createDataFrame(
                [(1, "low lower newest"), (2, "qqq low")],
                "id int, text string",
            ),
            vocab,
        )
        rows = {r.id: r.tokens for r in out.collect()}
        # greedy longest-match: 'low' whole, 'lower' = low + ##er,
        # 'newest' = n + ##ew (longest at pos 1) + ##e ##s ##t
        assert rows[1] == ["low", "low", "##er",
                           "n", "##ew", "##e", "##s", "##t"]
        # any unmatched position collapses the WORD to [UNK]
        assert rows[2] == ["[UNK]", "low"]

    def test_early_stop_on_singletons(self, spark):
        wf = spark.createDataFrame(
            [("ab", 1), ("cd", 1)], "word string, freq long"
        )
        merges, syms = wordpiece_train(wf, 10)
        assert merges == []
        syms.unpersist()


def _py_unigram(
    word_freq: dict,
    vocab_size: int,
    *,
    seed_size: int = 1000,
    max_piece_len: int = 8,
    em_iters: int = 2,
    prune_ratio: float = 0.2,
):
    """Pure-Python mirror of unigram_train's distributed control flow:
    the same seed scoring, the same per-word Viterbi (imported — it is
    a scalar function), exact-integer count aggregation, the same
    prune key. Only the DISTRIBUTION of the count aggregation differs,
    which is what the equality test pins."""
    from pawpaw_spark.operators.unigram import _to_logp, _viterbi

    cnt: dict = {}
    for w, f in word_freq.items():
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(n, i + max_piece_len) + 1):
                cnt[w[i:j]] = cnt.get(w[i:j], 0) + f
    seeds = {p: c for p, c in cnt.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cnt.items() if len(p) > 1),
        key=lambda kv: (-kv[1] * len(kv[0]), kv[0]),
    )[:seed_size]
    seeds.update(dict(multi))
    cur = _to_logp(seeds)

    def one_em(lp):
        got: dict = {}
        for w, f in word_freq.items():
            for piece in _viterbi(w, lp, max_piece_len):
                got[piece] = got.get(piece, 0) + f
        return got

    while True:
        counts: dict = {}
        for _ in range(max(1, em_iters)):
            counts = one_em(cur)
            cur = _to_logp(counts)
        multi = sorted(
            (p for p in cur if len(p) > 1),
            key=lambda p: (counts.get(p, 0), tuple(-ord(c) for c in p)),
        )
        n_single = sum(1 for p in cur if len(p) == 1)
        excess = len(cur) - max(int(vocab_size), n_single)
        if excess <= 0:
            break
        drop = set(
            multi[: max(1, min(excess, int(len(multi) * prune_ratio) or 1))]
        )
        if not drop:
            break
        cur = _to_logp({p: counts.get(p, 1) for p in cur if p not in drop})
    return cur


class TestUnigram:
    def test_seed_pieces_cells(self, spark):
        wf = spark.createDataFrame(
            [("anna", 2), ("an", 3)], "word string, freq long"
        )
        got = {
            r.piece: (r.n, r.score)
            for r in seed_pieces(wf, max_piece_len=3, seed_size=100).collect()
        }
        # 'an' occurs once in anna (a-n at 0; then nn, na) + the word
        # 'an' itself: 1*2 + 3 = 5
        assert got["an"] == (5, 10)
        assert got["a"] == (2 * 2 + 3, 7)
        assert got["ann"] == (2, 6)
        # seed_size cuts multi-char pieces by (score desc, piece asc)
        top = seed_pieces(wf, max_piece_len=3, seed_size=1)
        multi = [r.piece for r in top.collect() if len(r.piece) > 1]
        assert multi == ["an"]

    def test_train_matches_mirror(self, spark):
        docs = spark.createDataFrame([(CORPUS,)], "text string")
        wf_df = word_freqs(docs)
        wf = {r.word: r.freq for r in wf_df.collect()}
        for vs, ss in ((12, 20), (18, 40)):
            ref = _py_unigram(wf, vs, seed_size=ss, max_piece_len=6)
            got = unigram_train(
                wf_df, vs, seed_size=ss, max_piece_len=6
            )
            assert got == ref, f"vocab_size={vs}"

    def test_encode_viterbi(self, spark):
        docs = spark.createDataFrame([(CORPUS,)], "text string")
        wf_df = word_freqs(docs)
        lp = unigram_train(wf_df, 16, seed_size=30, max_piece_len=6)
        out = encode_unigram(
            spark.createDataFrame(
                [(1, "low lower newest")], "id int, text string"
            ),
            lp,
            max_piece_len=6,
        )
        [row] = out.collect()
        from pawpaw_spark.operators.unigram import _viterbi

        expect = [
            t for w in "low lower newest".split()
            for t in _viterbi(w, lp, 6)
        ]
        assert row.tokens == expect
        assert "".join(row.tokens) == "lowlowernewest"

    def test_unsegmentable_raises(self, spark):
        from pawpaw_spark.operators.unigram import _viterbi

        with pytest.raises(ValueError, match="not segmentable"):
            _viterbi("xyz", {"x": -1.0, "y": -1.0}, 4)


class TestSameAs:
    """owl:sameAs identity resolution + fusion (rdfs.sameas_canonical /
    sameas_fuse)."""

    def _t(self, spark, rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )

    def test_canonical_transitive_chain(self, spark):
        from pawpaw_spark.operators.rdfs import sameas_canonical

        t = self._t(spark, [
            ("b", "sameAs", "a"),
            ("c", "sameAs", "b"),     # a-b-c one cluster via transitivity
            ("z", "sameAs", "y"),     # y-z second cluster
            ("x", "CALLS", "c"),      # non-sameAs triples are ignored
        ])
        got = {tuple(r) for r in sameas_canonical(t).collect()}
        assert got == {
            ("a", "a"), ("b", "a"), ("c", "a"),
            ("y", "y"), ("z", "y"),
        }

    def test_fuse_rewrites_and_dedups(self, spark):
        from pawpaw_spark.operators.rdfs import sameas_fuse

        t = self._t(spark, [
            ("b", "sameAs", "a"),
            ("x", "CALLS", "b"),
            ("x", "CALLS", "a"),      # collapses with the rewritten row
            ("b", "CALLS", "q"),      # subject rewrite
            ("q", "CALLS", "q"),      # untouched identity
        ])
        got = {tuple(r) for r in sameas_fuse(t).collect()}
        # sameAs assertions are consumed; both CALLS rows unify
        assert got == {
            ("x", "CALLS", "a"),
            ("a", "CALLS", "q"),
            ("q", "CALLS", "q"),
        }

    def test_fuse_no_assertions_is_identity(self, spark):
        from pawpaw_spark.operators.rdfs import sameas_fuse

        rows = [("x", "CALLS", "y"), ("y", "CALLS", "x")]
        t = self._t(spark, rows)
        assert {tuple(r) for r in sameas_fuse(t).collect()} == set(rows)

    def test_custom_pred_and_cols(self, spark):
        from pawpaw_spark.operators.rdfs import sameas_canonical

        t = spark.createDataFrame(
            [("n2", "EQ", "n1")], "s string, p string, o string"
        )
        got = {tuple(r) for r in sameas_canonical(
            t, sameas_pred="EQ", subj_col="s", pred_col="p", obj_col="o"
        ).collect()}
        assert got == {("n1", "n1"), ("n2", "n1")}


class TestSchemaProfile:
    def test_profile_hand_graph(self, spark):
        from pawpaw_spark.operators.rdfs import schema_profile

        rows = [
            # owner: functional (each subj one obj), not inv-functional
            ("o1", "owner", "a"),
            ("o2", "owner", "a"),
            ("o3", "owner", "b"),
            # sha: inverse-functional, not functional
            ("f1", "sha", "h1"),
            ("f1", "sha", "h2"),
            # dup rows collapse (set semantics)
            ("f1", "sha", "h2"),
        ]
        df = spark.createDataFrame(rows, "subj string, pred string, obj string")
        got = {r.pred: r.asDict() for r in schema_profile(df).collect()}
        assert got["owner"] == {
            "pred": "owner", "n": 3, "n_subj": 3, "n_obj": 2,
            "max_out_fan": 1, "max_in_fan": 2,
            "functional": True, "inverse_functional": False,
        }
        assert got["sha"] == {
            "pred": "sha", "n": 2, "n_subj": 1, "n_obj": 2,
            "max_out_fan": 2, "max_in_fan": 1,
            "functional": False, "inverse_functional": True,
        }

    def test_profile_matches_functional_sameas_contract(self, spark):
        # a predicate the profile calls functional yields no clashes
        from pawpaw_spark.operators.owl import functional_sameas
        from pawpaw_spark.operators.rdfs import schema_profile

        rows = [
            ("s1", "p", "x"),
            ("s1", "p", "y"),
            ("s2", "p", "x"),
        ]
        df = spark.createDataFrame(rows, "subj string, pred string, obj string")
        prof = schema_profile(df).collect()[0]
        assert not prof.functional  # max_out_fan 2
        decl = spark.createDataFrame(
            [("p", "type", "FunctionalProperty")],
            "subj string, pred string, obj string",
        )
        pairs = functional_sameas(df.union(decl)).count()
        assert pairs == 1  # (x, y) via s1 — the clash the profile predicts
