"""Training-pipeline operators: dedup, text analysis, similarity,
multimodal plumbing — over the driver-provided testdata tables."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .withColumn("doc_id", F.col("doc_id").cast("string"))
        .cache()
    )


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


class TestDedup:
    def test_exact_dedup(self, spark, docs):
        from pawpaw_spark.operators.dedup import exact_dedup, exact_dup_groups

        n = docs.count()
        kept = exact_dedup(docs).count()
        n_dupes = exact_dup_groups(docs).agg(F.sum("n_dupes")).first()[0] or 0
        n_groups = exact_dup_groups(docs).count()
        assert kept == n - (n_dupes - n_groups)

    def test_ngram_jaccard_finds_self_dups(self, spark, docs):
        from pawpaw_spark.operators.dedup import ngram_jaccard_pairs

        # duplicate a few docs under new ids -> must be found at jaccard 1.0
        clones = docs.limit(3).withColumn("doc_id", F.concat(F.lit("clone_"), "doc_id"))
        pairs = ngram_jaccard_pairs(docs.unionByName(clones), threshold=0.99)
        found = {(r.a, r.b) for r in pairs.collect()}
        for r in clones.select("doc_id").collect():
            orig = r.doc_id.removeprefix("clone_")
            assert (orig, r.doc_id) in found or (r.doc_id, orig) in found

    def test_ngram_skew_guard_matches_cutoff_oracle(self, spark):
        """Engine with a TRIGGERED max_gram_freq vs a brute-force
        recompute applying the same doc-frequency cutoff (the contract
        oracle's construction) — proves the two stay aligned on corpora
        that actually have hot boilerplate shingles."""
        from pawpaw_spark.operators.dedup import ngram_jaccard_pairs

        boiler = "standard legal disclaimer text"  # 2 shingles, in EVERY doc
        rows = [
            ("d1", f"{boiler} alpha beta gamma delta"),
            ("d2", f"{boiler} alpha beta gamma epsilon"),
            ("d3", f"{boiler} zeta eta theta iota"),
            ("d4", f"{boiler} zeta eta theta kappa"),
            ("d5", f"{boiler} totally different body words"),
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = {
            (r.a, r.b): round(r.jaccard, 6)
            for r in ngram_jaccard_pairs(df, threshold=0.0, max_gram_freq=3).collect()
        }

        def shingles(t):
            toks = t.lower().split()
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)} or {t.lower()}

        sets = {i: shingles(t) for i, t in rows}
        from collections import Counter

        freq = Counter(g for s in sets.values() for g in s)
        hot = {g for g, c in freq.items() if c > 3}
        assert hot, "fixture must actually trigger the cap"
        exp = {}
        ids = sorted(sets)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                shared = len((sets[a] & sets[b]) - hot)
                j = shared / (len(sets[a]) + len(sets[b]) - shared)
                if shared:
                    exp[(a, b)] = round(j, 6)
        assert got == exp

    def test_cached_scope_keeps_persisted_set_flat(self, spark, docs):
        """N repeated dedup calls inside cached_scope leave the
        session's persisted-RDD set no larger than it started (round-2
        verdict item #6). No-growth, not equality: the JVM
        ContextCleaner asynchronously unpersists UNREFERENCED RDDs
        from earlier fixtures/tests, so the baseline can shrink
        beneath the loop — the operator-leak invariant is that OUR
        calls add nothing, which the registry check pins exactly."""
        from pawpaw_spark.operators.dedup import (
            cached_scope, minhash_dedup_pairs, ngram_jaccard_pairs,
        )

        def n_persisted():
            return spark.sparkContext._jsc.getPersistentRDDs().size()

        d = docs.limit(50)
        base = n_persisted()
        reg_base = len(getattr(spark, "_pawpaw_cache_registry", []) or [])
        for _ in range(3):
            with cached_scope(ngram_jaccard_pairs(d, threshold=0.5)) as p:
                p.count()
            with cached_scope(
                minhash_dedup_pairs(d, threshold=0.8, n_hashes=16, bands=4)
            ) as p:
                p.count()
        assert n_persisted() <= base
        reg = getattr(spark, "_pawpaw_cache_registry", []) or []
        assert len(reg) == reg_base  # every scoped handle released

    def test_session_registry_catches_dropped_attribute(self, spark, docs):
        """A projection drops the _pawpaw_cached attribute; the
        session-level registry must still release the handles."""
        from pawpaw_spark.operators.dedup import (
            ngram_jaccard_pairs, release_session_caches,
        )

        def n_persisted():
            return spark.sparkContext._jsc.getPersistentRDDs().size()

        release_session_caches(spark)  # clean slate
        base = n_persisted()
        projected = ngram_jaccard_pairs(docs.limit(50), threshold=0.5).select("a")
        assert not hasattr(projected, "_pawpaw_cached")
        projected.count()
        assert n_persisted() > base  # caches are live
        assert release_session_caches(spark) >= 1
        assert n_persisted() == base

    def test_minhash_lsh_finds_neardups(self, spark, docs):
        from pawpaw_spark.operators.dedup import minhash_dedup_pairs

        base = docs.limit(5)
        # near-dup: append one token
        clones = base.withColumn("doc_id", F.concat(F.lit("nd_"), "doc_id")).withColumn(
            "text", F.concat("text", F.lit(" extra"))
        )
        pairs = minhash_dedup_pairs(base.unionByName(clones), threshold=0.7)
        found = {(r.a, r.b) for r in pairs.collect()}
        hits = sum(
            1
            for r in base.select("doc_id").collect()
            if (r.doc_id, f"nd_{r.doc_id}") in found or (f"nd_{r.doc_id}", r.doc_id) in found
        )
        assert hits >= 4  # probabilistic but extremely safe at these params

    def test_minhash_estimate_close_to_true_jaccard(self, spark):
        from pawpaw_spark.operators.dedup import minhash_signatures

        a = "the quick brown fox jumps over the lazy dog " * 5
        b = a + "and then some more words here"
        df = spark.createDataFrame(
            [("a", a), ("b", b)], "doc_id string, text string"
        )
        sigs = {r.id: r.sig for r in minhash_signatures(df).collect()}
        est = np.mean(np.array(sigs["a"]) == np.array(sigs["b"]))

        def shingles(t):
            toks = t.lower().split()
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

        sa, sb = shingles(a), shingles(b)
        true_j = len(sa & sb) / len(sa | sb)
        assert abs(est - true_j) < 0.15

    def test_simhash_neardup(self, spark, docs):
        from pawpaw_spark.operators.dedup import simhash, simhash_neardup_pairs

        base = docs.limit(5)
        clones = base.withColumn("doc_id", F.concat(F.lit("sh_"), "doc_id"))
        fps = simhash(base.unionByName(clones))
        pairs = simhash_neardup_pairs(fps, max_hamming=0)
        found = {(r.a, r.b) for r in pairs.collect()}
        for r in base.select("doc_id").collect():
            assert (r.doc_id, f"sh_{r.doc_id}") in found or (f"sh_{r.doc_id}", r.doc_id) in found

    def test_neardup_groups_transitive_and_singletons(self, spark):
        """A~B and B~C put A,C in one group even when A!~C directly;
        unpaired docs are their own canonical singleton."""
        from pawpaw_spark.operators.dedup import neardup_groups

        docs = spark.createDataFrame(
            [("d1", ""), ("d2", ""), ("d3", ""), ("d9", "")],
            "doc_id string, text string",
        )
        pairs = spark.createDataFrame(
            [("d1", "d2"), ("d2", "d3")], "a string, b string"
        )
        got = {
            r.doc: (r.group_id, r.is_canonical)
            for r in neardup_groups(docs, pairs).collect()
        }
        assert got == {
            "d1": ("d1", True), "d2": ("d1", False), "d3": ("d1", False),
            "d9": ("d9", True),
        }

    def test_simhash_oracle_alignment_on_tricky_corpus(self, spark):
        """Engine fingerprints == the DuckDB oracle recompute on docs
        with leading whitespace, blank/whitespace-only text, and empty
        strings — the corpus shapes where a '\\s+'-split oracle would
        diverge from the engine's str.split() (ADVICE r2)."""
        import duckdb

        from pawpaw_spark.operators.dedup import simhash

        rows = [
            ("t1", "  leading space text"),
            ("t2", "leading space text"),
            ("t3", "   "),            # whitespace-only -> fp 0
            ("t4", ""),               # empty -> fp 0
            ("t5", "\ttab\nand  runs \r\n"),
            ("t6", "normal words here"),
        ]
        docs = spark.createDataFrame(rows, "doc_id string, text string")
        got = {
            r.id: r.fingerprint
            for r in simhash(docs, hash_fn="md5").collect()
        }
        con = duckdb.connect()
        con.register("tricky", __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]))
        # same bit-array form as the contract oracle (an integer
        # list_sum would round through DOUBLE and lose low bits)
        oracle = con.sql(r"""
            WITH d AS (
              SELECT doc_id AS id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 t -> t <> '') AS toks
              FROM tricky WHERE text IS NOT NULL),
            h AS (SELECT id, list_transform(toks, t -> md5_number_lower(t)) AS hs,
                         len(toks) AS n FROM d)
            SELECT id,
                   list_transform(range(0, 64),
                     b -> 2 * len(list_filter(hs, x -> (x >> b) & 1 = 1)) > n) AS bits
            FROM h
        """).df()

        def bits_to_signed(bits):
            v = sum(1 << i for i, b in enumerate(bits) if b)
            return v - (1 << 64) if v >= (1 << 63) else v

        exp = {r.id: bits_to_signed(list(r.bits)) for r in oracle.itertuples()}
        assert got == exp
        assert got["t3"] == 0 and got["t4"] == 0

    def test_embedding_neardup_blocked(self, spark, emb):
        from pawpaw_spark.operators.dedup import embedding_neardup_pairs

        e = emb.withColumn("vec_id", F.col("vec_id").cast("string"))
        pairs = embedding_neardup_pairs(e, threshold=0.99, block_col="label")
        # self-clone check
        clones = e.limit(2).withColumn("vec_id", F.concat(F.lit("c"), "vec_id"))
        pairs2 = embedding_neardup_pairs(e.unionByName(clones), threshold=0.999, block_col="label")
        found = {(r.a, r.b) for r in pairs2.collect()}
        for r in clones.select("vec_id").collect():
            orig = r.vec_id[1:]
            assert (orig, r.vec_id) in found or (r.vec_id, orig) in found
        assert pairs.columns == ["a", "b", "cosine"]


class TestParagraphDedup:
    def test_first_arrival_survives_later_drop(self, spark):
        from pawpaw_spark.operators.dedup import paragraph_dedup

        rows = [
            (1, "common\n\nunique-a\n\nshared-x"),
            (2, "common\n\nunique-b"),
            (3, "shared-x\n\nunique-c\n\ncommon"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.clean_text, r.n_paras, r.n_kept)
            for r in paragraph_dedup(df).collect()
        }
        # doc 1 keeps everything (first arrival of common + shared-x)
        assert got[1] == ("common\n\nunique-a\n\nshared-x", 3, 3)
        # doc 2 loses 'common', keeps unique-b
        assert got[2] == ("unique-b", 2, 1)
        # doc 3 loses both repeats, keeps unique-c
        assert got[3] == ("unique-c", 3, 1)

    def test_fully_duplicate_doc_becomes_empty(self, spark):
        from pawpaw_spark.operators.dedup import paragraph_dedup

        df = spark.createDataFrame(
            [(1, "a\n\nb"), (2, "a\n\nb")], "doc_id long, text string"
        )
        got = {r.doc_id: (r.clean_text, r.n_kept) for r in paragraph_dedup(df).collect()}
        assert got[1] == ("a\n\nb", 2)
        assert got[2] == ("", 0)

    def test_roundtrip_when_no_duplicates(self, spark, docs):
        """Corpus-unique texts (verified distinct) round-trip intact."""
        from pawpaw_spark.operators.dedup import paragraph_dedup

        d = docs.limit(50)
        out = paragraph_dedup(d).join(
            d.select("doc_id", F.col("text").alias("orig")), "doc_id"
        )
        assert out.filter(F.col("clean_text") != F.col("orig")).count() == 0


class TestIncrementalDedup:
    def test_delta_equals_full_run_restricted_to_new(
        self, spark, docs, tmp_path_factory
    ):
        """index(half A) + delta(half B) == full-corpus pairs touching
        B — the daily-ingest contract. Clones planted across the A/B
        boundary and inside B guarantee non-empty overlap both ways."""
        from pawpaw_spark.operators.dedup import (
            minhash_dedup_delta,
            minhash_dedup_pairs,
            minhash_index_write,
        )

        base = docs.limit(80).select("doc_id", "text")
        a_half = base.filter(F.col("doc_id").cast("long") % 2 == 0)
        b_half = base.filter(F.col("doc_id").cast("long") % 2 == 1)
        # cross-boundary clone (of an A doc) and an in-B clone pair
        clone_src = a_half.limit(1).select(
            F.lit("zz_cross").alias("doc_id"), "text"
        )
        b_doc = b_half.limit(1).select("text").first()["text"]
        b_clones = spark.createDataFrame(
            [("zz_in1", b_doc)], "doc_id string, text string"
        )
        b_all = b_half.unionByName(clone_src).unionByName(b_clones)
        full = base.unionByName(clone_src).unionByName(b_clones)

        path = str(tmp_path_factory.mktemp("mh_index"))
        minhash_index_write(a_half, path, n_hashes=64, bands=16)
        delta = {
            (r.a, r.b, round(r.jaccard, 6))
            for r in minhash_dedup_delta(b_all, path, threshold=0.8).collect()
        }
        full_pairs = {
            (r.a, r.b, round(r.jaccard, 6))
            for r in minhash_dedup_pairs(
                full, threshold=0.8, n_hashes=64, bands=16, verify="exact"
            ).collect()
        }
        b_ids = {r.doc_id for r in b_all.select("doc_id").collect()}
        expected = {t for t in full_pairs if t[0] in b_ids or t[1] in b_ids}
        assert delta == expected
        assert any("zz_cross" in t[:2] for t in delta)  # A-vs-B found
        assert any("zz_in1" in t[:2] for t in delta)  # B-vs-B found

    def test_param_sidecar_and_id_collision_guard(
        self, spark, docs, tmp_path_factory
    ):
        from pawpaw_spark.operators.dedup import (
            minhash_dedup_delta,
            minhash_index_write,
        )

        path = str(tmp_path_factory.mktemp("mh_index2"))
        a = docs.limit(10).select("doc_id", "text")
        minhash_index_write(a, path, n_hashes=64, bands=16)
        p = spark.read.parquet(f"{path}/params").first().asDict()
        assert {int(p["n_hashes"]), int(p["bands"])} == {64, 16}
        with pytest.raises(ValueError, match="already present"):
            minhash_dedup_delta(a, path)

    def test_append_mode_grows_index(self, spark, docs, tmp_path_factory):
        from pawpaw_spark.operators.dedup import minhash_index_write

        path = str(tmp_path_factory.mktemp("mh_index3"))
        a = docs.limit(10).select("doc_id", "text")
        b = (
            docs.limit(20)
            .filter(F.col("doc_id").cast("long") >= 10)
            .select("doc_id", "text")
        )
        minhash_index_write(a, path, n_hashes=64, bands=16)
        minhash_index_write(b, path, n_hashes=64, bands=16, mode="append")
        assert spark.read.parquet(f"{path}/rows").count() == a.count() + b.count()


class TestDecontaminate:
    def test_benchmark_members_always_contaminated(self, spark, docs):
        from pawpaw_spark.operators.dedup import decontaminate

        bench = docs.filter(F.col("doc_id").cast("long") < 5).select("text")
        flagged = decontaminate(docs, bench, k=3, keep_flag=True)
        bad = flagged.filter(
            (F.col("doc_id").cast("long") < 5) & ~F.col("contaminated")
        ).count()
        assert bad == 0
        # filter mode drops exactly the flagged set
        n_contam = flagged.filter("contaminated").count()
        clean = decontaminate(docs, bench, k=3)
        assert clean.count() == docs.count() - n_contam
        assert clean.filter(F.col("doc_id").cast("long") < 5).count() == 0

    def test_disjoint_benchmark_flags_nothing(self, spark, docs):
        from pawpaw_spark.operators.dedup import decontaminate

        bench = spark.createDataFrame(
            [("zzq qqz zqq xyzzy plugh",)], "text string"
        )
        assert decontaminate(docs, bench, k=3).count() == docs.count()

    def test_planted_overlap_is_caught(self, spark):
        from pawpaw_spark.operators.dedup import decontaminate

        train = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon"),
                (2, "one two three four five six"),
                (3, "totally different words here now"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [("the answer is two three four indeed",)], "text string"
        )
        kept = {r.doc_id for r in decontaminate(train, bench, k=3).collect()}
        assert kept == {1, 3}  # doc 2 shares 'two three four'


class TestRepetition:
    def test_scores_match_python(self, spark, docs):
        from collections import Counter

        from pawpaw_spark.operators.text import repetition_scores

        d = docs.limit(60)
        got = {
            r.doc_id: (r.n_toks, r.top_bigram_frac, r.dup_token_frac)
            for r in repetition_scores(d).collect()
        }
        for r in d.select("doc_id", "text").collect():
            toks = r.text.lower().split()
            tc = Counter(toks)
            dup = sum(c for c in tc.values() if c >= 2)
            bg = Counter(zip(toks, toks[1:]))
            top = round(max(bg.values()) / sum(bg.values()), 6) if bg else 0.0
            dupf = round(dup / len(toks), 6) if toks else 0.0
            assert got[r.doc_id] == (len(toks), top, dupf), r.doc_id

    def test_degenerate_docs(self, spark):
        from pawpaw_spark.operators.text import repetition_scores

        df = spark.createDataFrame(
            [(1, "spam spam spam spam"), (2, "word"), (3, "   ")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_toks, r.top_bigram_frac, r.dup_token_frac)
            for r in repetition_scores(df).collect()
        }
        assert got[1] == (4, 1.0, 1.0)  # pure loop
        assert got[2] == (1, 0.0, 0.0)  # nothing can repeat
        assert got[3] == (0, 0.0, 0.0)  # empty after tokenization


class TestSampling:
    def test_deterministic_and_partition_invariant(self, spark, docs):
        from pawpaw_spark.operators.sampling import deterministic_sample

        a = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.3).select("doc_id").collect()}
        b = {
            r.doc_id
            for r in deterministic_sample(docs.repartition(13), "doc_id", 0.3)
            .select("doc_id")
            .collect()
        }
        assert a == b and a  # same rows regardless of partitioning

    def test_fraction_is_approximately_honored(self, spark, docs):
        from pawpaw_spark.operators.sampling import deterministic_sample

        n = docs.count()
        for p in (0.1, 0.5, 0.9):
            k = deterministic_sample(docs, "doc_id", p).count()
            # md5 is uniform; 500 draws at p have sd ~ sqrt(500*p*(1-p))
            assert abs(k - n * p) < 5 * (n * p * (1 - p)) ** 0.5 + 5

    def test_stratified_respects_per_stratum_rates(self, spark, docs):
        from pawpaw_spark.operators.sampling import stratified_sample

        out = stratified_sample(docs, {"en": 1.0, "de": 0.0}, "lang", "doc_id")
        langs = {r.lang for r in out.select("lang").distinct().collect()}
        assert "de" not in langs and "en" in langs
        n_en = docs.filter(F.col("lang") == "en").count()
        # 1.0 keeps all but the 2^-32 top hash sliver — exact here
        assert out.filter(F.col("lang") == "en").count() == n_en

    def test_nested_samples(self, spark, docs):
        """Smaller fraction is a SUBSET of a larger one (hex-prefix
        thresholding is monotone) — lets pipelines carve nested
        train/val corpora without re-hashing."""
        from pawpaw_spark.operators.sampling import deterministic_sample

        small = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.1).collect()}
        big = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.4).collect()}
        assert small <= big

    def test_bad_fraction_raises(self):
        from pawpaw_spark.operators.sampling import _threshold_hex

        with pytest.raises(ValueError):
            _threshold_hex(1.5)


class TestPacking:
    def test_contiguous_fill_bins(self, spark):
        from pawpaw_spark.operators.packing import pack_sequences

        # order a,b,c,d with tokens 300,300,300,700 in one partition:
        # offsets 0,300,600,900 -> bins 0,0,1,1 at max=512
        rows = [("a", 300), ("b", 300), ("c", 300), ("d", 700)]
        df = spark.createDataFrame(rows, "k string, t long").withColumn(
            "p", F.lit("x")
        )
        got = {
            r.k: r.bin
            for r in pack_sequences(df, "t", 512, "k", "p").collect()
        }
        assert got == {"a": 0, "b": 0, "c": 1, "d": 1}

    def test_oversized_doc_advances_multiple_bins(self, spark):
        from pawpaw_spark.operators.packing import pack_sequences

        # 1200-token doc at offset 0 spans bins 0-2; next doc starts
        # at offset 1200 -> bin 2 (no empty bin invented for it)
        rows = [("a", 1200), ("b", 100)]
        df = spark.createDataFrame(rows, "k string, t long").withColumn(
            "p", F.lit("x")
        )
        got = {
            r.k: r.bin
            for r in pack_sequences(df, "t", 512, "k", "p").collect()
        }
        assert got == {"a": 0, "b": 2}

    def test_partitions_pack_independently(self, spark):
        from pawpaw_spark.operators.packing import pack_stats

        # p1: offsets 0,400,800 -> bins 0,0,1; p2 restarts at offset 0
        rows = [("a", 400, "p1"), ("b", 400, "p1"), ("c", 400, "p1"), ("d", 400, "p2")]
        df = spark.createDataFrame(rows, "k string, t long, p string")
        out = {
            (r.p, r.bin): (r.n_docs, r.total_tokens)
            for r in pack_stats(df, "t", 512, "k", "p").collect()
        }
        assert out == {("p1", 0): (2, 800), ("p1", 1): (1, 400), ("p2", 0): (1, 400)}

    def test_bad_budget_raises(self, spark):
        from pawpaw_spark.operators.packing import pack_sequences

        with pytest.raises(ValueError):
            pack_sequences(None, "t", 0, "k", "p")


class TestCorpusProfile:
    def test_matches_numpy_percentiles(self, spark, docs):
        from pawpaw_spark.operators.text import corpus_profile

        got = {
            r.lang: (r.n_docs, r.total_chars, r.chars_p25, r.chars_p50, r.chars_p75)
            for r in corpus_profile(docs).collect()
        }
        rows = docs.select("lang", "n_chars").collect()
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r.lang, []).append(r.n_chars)
        for lang, xs in by_lang.items():
            n, tot = len(xs), sum(xs)
            p25, p50, p75 = (
                round(float(v), 4)
                for v in np.percentile(xs, [25, 50, 75], method="linear")
            )
            assert got[lang] == (n, tot, p25, p50, p75)


class TestVocab:
    def test_vocab_topk_matches_python_counts(self, spark, docs):
        import re
        from collections import Counter

        from pawpaw_spark.operators.text import vocab_topk

        d = docs.limit(100)
        total, ndocs = Counter(), Counter()
        for r in d.select("doc_id", "text").collect():
            toks = [t for t in re.split(r"[^0-9a-z_]+", r.text.lower()) if t]
            total.update(toks)
            ndocs.update(set(toks))
        exp = sorted(
            ((t, c, ndocs[t]) for t, c in total.items()),
            key=lambda x: (-x[1], x[0]),
        )[:20]
        got = [
            (r.token, r.n_total, r.n_docs)
            for r in vocab_topk(d, "text", "doc_id", k=20).collect()
        ]
        assert got == exp


class TestText:
    def test_lang_id_on_english(self, spark):
        from pawpaw_spark.operators.text import with_lang_id

        df = spark.createDataFrame(
            [
                ("1", "the cat is on the mat and it was good"),
                ("2", "der hund ist ein tier und das ist gut"),
                ("3", "xyzzy plugh"),
            ],
            "doc_id string, text string",
        )
        got = {r.doc_id: r.lang_pred for r in with_lang_id(df).collect()}
        assert got["1"] == "en" and got["2"] == "de" and got["3"] == "und"

    def test_token_counts_and_quality(self, spark, docs):
        from pawpaw_spark.operators.text import with_quality_score, with_token_counts

        out = with_quality_score(with_token_counts(docs)).select(
            "doc_id", "n_ws_tokens", "n_bpe_tokens", "quality"
        )
        rows = out.collect()
        assert all(0 <= r.quality <= 1 for r in rows)
        assert all(r.n_bpe_tokens >= r.n_ws_tokens for r in rows)

    def test_quality_q4_matches_float_score(self, spark, docs):
        """The exact-integer quantization is the same formula: q4/10000
        must equal the float score to within one quantum everywhere."""
        from pawpaw_spark.operators.text import quality_q4, with_quality_score

        rows = (
            with_quality_score(docs)
            .select("quality", quality_q4().alias("q4"))
            .collect()
        )
        assert rows and all(abs(r.q4 / 10000 - r.quality) <= 1e-4 for r in rows)

    def test_fingerprint_ignores_whitespace_case(self, spark):
        from pawpaw_spark.operators.text import with_fingerprint

        df = spark.createDataFrame(
            [("1", "Hello   World"), ("2", "hello world"), ("3", "other")],
            "doc_id string, text string",
        )
        got = {r.doc_id: r.fingerprint for r in with_fingerprint(df).collect()}
        assert got["1"] == got["2"] != got["3"]


class TestSimilarity:
    def test_bruteforce_topk_matches_numpy(self, spark, emb):
        from pawpaw_spark.operators.similarity import cosine_topk

        rows = emb.collect()
        q = rows[0].embedding
        got = [r.id for r in cosine_topk(emb, q, k=5).collect()]
        M = np.array([r.embedding for r in rows])
        qv = np.array(q)
        cos = (M @ qv) / (np.linalg.norm(M, axis=1) * np.linalg.norm(qv))
        order = sorted(range(len(rows)), key=lambda i: (-cos[i], rows[i].vec_id))
        expected = [rows[i].vec_id for i in order[:5]]
        assert got == expected

    def test_lsh_topk_recall_on_planted_cluster(self, spark, emb):
        from pawpaw_spark.operators.similarity import (
            cosine_topk, hyperplanes, lsh_topk, with_lsh_bucket,
        )

        rows = emb.limit(1).collect()
        q = np.array(rows[0].embedding, dtype=float)
        rng = np.random.RandomState(0)
        planted = [
            (10_000 + i, (q + rng.randn(len(q)) * 0.01 * np.linalg.norm(q) / np.sqrt(len(q))).tolist())
            for i in range(8)
        ]
        extra = spark.createDataFrame(
            [(i, v, 0) for i, v in planted], "vec_id long, embedding array<float>, label int"
        )
        all_emb = emb.unionByName(extra)
        planes = hyperplanes(dim=len(q), n_planes=8)
        bucketed = with_lsh_bucket(all_emb, planes).cache()
        exact = {r.id for r in cosine_topk(all_emb, q.tolist(), k=8).collect()}
        approx = {r.id for r in lsh_topk(bucketed, q.tolist(), planes, k=8, n_probe=4).collect()}
        # near-identical vectors share the query's sign pattern -> found
        assert len(exact & approx) >= 7

    def test_topk_per_group(self, spark, docs):
        from pawpaw_spark.operators.similarity import topk_per_group

        out = topk_per_group(docs, "lang", "n_chars", k=2)
        counts = out.groupBy("lang").count().collect()
        assert all(r["count"] <= 2 for r in counts)


class TestMultimodal:
    def test_feature_plumbing(self, spark, docs):
        from pawpaw_spark.operators.multimodal import (
            FEATURE_DIM, extract_features, media_from_documents, sample_frames,
        )

        media = media_from_documents(docs).cache()
        feats = extract_features(media)
        row = feats.first()
        assert len(row.feature) == FEATURE_DIM
        assert feats.count() == media.count()
        frames = sample_frames(media, every_ms=1000, max_frames=8)
        assert frames.groupBy("media_id").count().agg(F.max("count")).first()[0] <= 8

    def test_fake_features_deterministic(self, spark, docs):
        from pawpaw_spark.operators.multimodal import extract_features, media_from_documents

        media = media_from_documents(docs.limit(5))
        f1 = {r.media_id: r.feature for r in extract_features(media).collect()}
        f2 = {r.media_id: r.feature for r in extract_features(media).collect()}
        assert f1 == f2

    @pytest.mark.parametrize("fmt", ["png", "jpeg", "gif", "bmp"])
    def test_header_roundtrip(self, fmt):
        from pawpaw_spark.operators.multimodal import make_image_bytes, parse_image_header

        for w, h in [(1, 1), (640, 480), (1920, 1080), (65535, 1), (1, 65535)]:
            assert parse_image_header(make_image_bytes(fmt, w, h)) == (fmt, w, h)

    def test_header_parse_rejects_garbage(self):
        from pawpaw_spark.operators.multimodal import make_image_bytes, parse_image_header

        assert parse_image_header(None) is None
        assert parse_image_header(b"") is None
        assert parse_image_header(b"plain text blob") is None
        # truncated headers must not raise (cut 9 < the 10-byte GIF
        # logical-screen prefix, the shortest complete header here)
        for fmt in ("png", "jpeg", "gif", "bmp"):
            full = make_image_bytes(fmt, 64, 32)
            for cut in (2, 6, 9):
                assert parse_image_header(full[:cut]) is None
        # JPEG with EOI before any SOF
        assert parse_image_header(b"\xff\xd8\xff\xd9") is None

    def test_header_parse_jpeg_skips_leading_segments(self):
        """SOF found after APPn/COM segments (marker-walk, not offset)."""
        from pawpaw_spark.operators.multimodal import make_image_bytes, parse_image_header

        base = make_image_bytes("jpeg", 320, 200)
        com = b"\xff\xfe" + (2 + 11).to_bytes(2, "big") + b"a comment!!"
        padded = base[:2] + com + base[2:]
        assert parse_image_header(padded) == ("jpeg", 320, 200)

    def test_header_parse_jpeg_fill_bytes(self):
        """ITU T.81 B.1.1.2: 0xFF fill bytes may pad marker space."""
        from pawpaw_spark.operators.multimodal import make_image_bytes, parse_image_header

        base = make_image_bytes("jpeg", 320, 200)
        padded = base[:2] + b"\xff\xff" + base[2:]
        assert parse_image_header(padded) == ("jpeg", 320, 200)

    def test_header_parse_bmp_os2_core_header(self):
        """BITMAPCOREHEADER (DIB size 12) packs uint16 dims at 18/20 —
        must parse those, not misread int32s at 18/22."""
        from pawpaw_spark.operators.multimodal import parse_image_header

        info = (
            (12).to_bytes(4, "little")
            + (10).to_bytes(2, "little") + (20).to_bytes(2, "little")
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        )
        header = b"BM" + (14 + len(info)).to_bytes(4, "little") + bytes(4) + (26).to_bytes(4, "little")
        assert parse_image_header(header + info) == ("bmp", 10, 20)
        # unknown DIB size -> None, not garbage dimensions
        weird = bytearray(header + info + bytes(16))
        weird[14:18] = (17).to_bytes(4, "little")
        assert parse_image_header(bytes(weird)) is None

    def test_header_parse_bmp_topdown_negative_height(self):
        from pawpaw_spark.operators.multimodal import make_image_bytes, parse_image_header

        b = bytearray(make_image_bytes("bmp", 10, 20))
        b[22:26] = (-20).to_bytes(4, "little", signed=True)
        assert parse_image_header(bytes(b)) == ("bmp", 10, 20)

    def test_decode_image_meta_distributed(self, spark):
        from pawpaw_spark.operators.multimodal import decode_image_meta, make_image_bytes

        rows = [
            ("a", make_image_bytes("png", 12, 34)),
            ("b", make_image_bytes("jpeg", 56, 78)),
            ("c", make_image_bytes("gif", 9, 10)),
            ("d", make_image_bytes("bmp", 11, 12)),
            ("e", b"not an image"),
            ("f", None),
        ]
        media = spark.createDataFrame(rows, "media_id string, payload binary")
        got = {r.media_id: (r.format, r.width, r.height) for r in decode_image_meta(media).collect()}
        assert got == {
            "a": ("png", 12, 34), "b": ("jpeg", 56, 78), "c": ("gif", 9, 10),
            "d": ("bmp", 11, 12), "e": (None, None, None), "f": (None, None, None),
        }

    def test_decode_stub_raises(self):
        from pawpaw_spark.operators.multimodal import decode_image

        try:
            import PIL  # noqa: F401
            pytest.skip("Pillow available; stub not exercised")
        except ImportError:
            pass
        with pytest.raises(NotImplementedError):
            decode_image(b"not an image")


class TestIVF:
    def test_ivf_recall_vs_bruteforce(self, spark, emb):
        from pawpaw_spark.operators.similarity import (
            cosine_topk, ivf_fit, ivf_topk, with_ivf_cluster,
        )

        centroids = ivf_fit(emb, n_centroids=8, iters=4)
        assert centroids.shape[1] == len(emb.first().embedding)
        clustered = with_ivf_cluster(emb, centroids).cache()
        # every vector got a cluster in range
        stats = clustered.agg(
            F.min("cluster").alias("lo"), F.max("cluster").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        assert stats.lo >= 0 and stats.hi < 8 and stats.n == emb.count()

        q = emb.first().embedding
        exact = [r.id for r in cosine_topk(emb, q, k=10).collect()]
        approx = [r.id for r in ivf_topk(clustered, centroids, q, k=10, n_probe=4).collect()]
        # labels form real clusters in the fixture: half the lists probed
        # must recover most of the exact top-10
        assert len(set(exact) & set(approx)) >= 8

    def test_ivf_fit_deterministic(self, spark, emb):
        from pawpaw_spark.operators.similarity import ivf_fit

        c1 = ivf_fit(emb, n_centroids=4, iters=2)
        c2 = ivf_fit(emb, n_centroids=4, iters=2)
        assert np.allclose(c1, c2)

    def test_ivf_fit_quantized_bit_identical_across_partitionings(self, spark, emb):
        """quantize=6 must make the ITERATED fit bit-identical even when
        the centroid-update sums run over different partitionings — the
        property the exact-rows IVF contract entry relies on."""
        from pawpaw_spark.operators.similarity import ivf_fit

        c1 = ivf_fit(emb.repartition(1), n_centroids=8, iters=3, quantize=6)
        c2 = ivf_fit(emb.repartition(13), n_centroids=8, iters=3, quantize=6)
        assert (c1 == c2).all()


class TestPQ:
    def test_encode_matches_numpy_reference(self, spark, emb):
        from pawpaw_spark.operators.similarity import pq_encode, pq_fit

        books = pq_fit(emb, m=8, n_codes=8, iters=2)
        m, kc, dsub = books.shape
        got = {r.id: list(r.codes) for r in pq_encode(emb, books).collect()}
        rows = emb.collect()
        for r in rows:
            v = np.asarray(r.embedding, dtype=float)
            v = v / max(np.linalg.norm(v), 1e-12)
            want = [
                int(np.argmax(v[s * dsub:(s + 1) * dsub] @ books[s].T
                              - 0.5 * (books[s] ** 2).sum(axis=1)))
                for s in range(m)
            ]
            assert got[r.vec_id] == want

    def test_fit_bit_identical_across_partitionings(self, spark, emb):
        from pawpaw_spark.operators.similarity import pq_fit

        b1 = pq_fit(emb.repartition(1), m=4, n_codes=8, iters=3, quantize=6)
        b2 = pq_fit(emb.repartition(13), m=4, n_codes=8, iters=3, quantize=6)
        assert (b1 == b2).all()

    def test_adc_topk_recall_with_rerank(self, spark, emb):
        from pawpaw_spark.operators.similarity import (
            cosine_topk, pq_encode, pq_fit, pq_topk,
        )

        books = pq_fit(emb, m=8, n_codes=16, iters=3)
        enc = pq_encode(emb, books).cache()
        q = emb.first().embedding
        exact = [r.id for r in cosine_topk(emb, q, k=5).collect()]
        n = emb.count()
        approx = [
            r.id for r in pq_topk(enc, emb, books, q, k=5, rerank=max(100, n // 4)).collect()
        ]
        assert approx == exact  # re-rank is exact cosine, order included

    def test_dim_not_divisible_raises(self, spark, emb):
        from pawpaw_spark.operators.similarity import pq_fit

        with pytest.raises(ValueError, match="divisible"):
            pq_fit(emb, m=7, n_codes=8, iters=1)


class TestPiiScrub:
    CASES = [
        "plain text, nothing to find",
        "mail me at jo.doe+spam@sub.example.co.uk. thanks",
        "two mails: a@b.io and c_d%e@f-g.org!",
        "call +1-555-0199 or +44-123-4567 now",
        "server at 10.0.255.7 and 192.168.1.1.",
        "card 4111-1111-1111-1234 expires soon",
        "combo u@v.de +1-555-1234 8.8.8.8 0000-9999-0000-9999",
        "not-an-ip 1.2.3 and 1.2.3.4.5 edge",
        "trailing dot ip 10.1.2.3.",
        "",
        "digits 12345-6789 and 1234-5678 only",
    ]

    def _py_scrub(self, text):
        import re

        from pawpaw_spark.operators.text import PII_PATTERNS

        counts = [len(re.findall(p, text)) for _, p, _ in PII_PATTERNS]
        clean = text
        for _, p, repl in PII_PATTERNS:
            clean = re.sub(p, repl.replace("\\", "\\\\"), clean)
        return (*counts, clean)

    def test_matches_python_re(self, spark):
        from pawpaw_spark.operators.text import pii_scrub

        df = spark.createDataFrame(
            list(enumerate(self.CASES)), "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.n_emails, r.n_cards, r.n_phones, r.n_ipv4s, r.clean)
            for r in pii_scrub(df).collect()
        }
        want = {i: self._py_scrub(t) for i, t in enumerate(self.CASES)}
        assert got == want

    def test_ip_substring_of_longer_quad_run(self, spark):
        # "1.2.3.4.5": leftmost match takes 1.2.3.4 — documents the
        # (python-re-identical) behavior rather than pretending it away
        from pawpaw_spark.operators.text import pii_scrub

        df = spark.createDataFrame([(0, "x 1.2.3.4.5 y")], "doc_id long, text string")
        row = pii_scrub(df).collect()[0]
        assert row.n_ipv4s == 1
        assert row.clean == "x [IP].5 y"


class TestWeightedMix:
    def _docs(self, spark, sizes):
        rows = [
            (f"{s}_{i}", s) for s, n in sizes.items() for i in range(n)
        ]
        return spark.createDataFrame(rows, "doc_id string, source string")

    def test_prefix_proportions_independent_of_source_size(self, spark):
        from pawpaw_spark.operators.sampling import weighted_mix_keys

        # source a has 10x the documents of b; equal weights must still
        # mix them ~50/50 in any prefix
        df = self._docs(spark, {"a": 2000, "b": 200})
        keys = weighted_mix_keys(df, {"a": 1.0, "b": 1.0}).collect()
        prefix = sorted(keys, key=lambda r: r.mix_key)[:200]
        n_a = sum(1 for r in prefix if r.source == "a")
        assert 70 <= n_a <= 130, n_a  # ~100 ± sampling noise

    def test_weighted_proportions(self, spark):
        from pawpaw_spark.operators.sampling import weighted_mix_keys

        df = self._docs(spark, {"a": 1500, "b": 1500})
        keys = weighted_mix_keys(df, {"a": 3.0, "b": 1.0}).collect()
        prefix = sorted(keys, key=lambda r: r.mix_key)[:400]
        n_a = sum(1 for r in prefix if r.source == "a")
        assert 240 <= n_a <= 360, n_a  # ~300 = 3/4 of 400

    def test_deterministic_across_partitioning(self, spark):
        from pawpaw_spark.operators.sampling import weighted_mix_keys

        df = self._docs(spark, {"a": 300, "b": 100})
        w = {"a": 2.0, "b": 1.0}
        one = {r.doc_id: r.mix_key
               for r in weighted_mix_keys(df.repartition(1), w).collect()}
        many = {r.doc_id: r.mix_key
                for r in weighted_mix_keys(df.repartition(13), w).collect()}
        assert one == many

    def test_unlisted_sources_dropped_bad_weight_raises(self, spark):
        import pytest as _pytest

        from pawpaw_spark.operators.sampling import weighted_mix_keys

        df = self._docs(spark, {"a": 10, "b": 10})
        out = weighted_mix_keys(df, {"a": 1.0})
        assert {r.source for r in out.collect()} == {"a"}
        with _pytest.raises(ValueError):
            weighted_mix_keys(df, {"a": 0.0})


class TestReviewFixes:
    """Regression tests for the round-3 code-review findings."""

    def test_fraction_one_keeps_every_row(self, spark):
        """fraction=1.0 must keep ALL rows, including keys whose md5
        prefix is exactly 'ffffffff' (strict '<' vs a clamped max
        threshold used to drop them)."""
        from pawpaw_spark.operators.sampling import (
            _threshold_hex, deterministic_sample,
        )

        assert _threshold_hex(1.0) == "g"
        # every 8-hex key sorts strictly below "g"
        assert "ffffffff" < "g"
        df = spark.createDataFrame(
            [(f"k{i}",) for i in range(200)], "doc_id string"
        )
        assert deterministic_sample(df, "doc_id", 1.0).count() == 200

    def test_paragraph_dedup_metachar_separator(self, spark):
        """A separator containing regex metacharacters ('|||') must be
        treated literally by the split, matching the literal rejoin."""
        from pawpaw_spark.operators.dedup import paragraph_dedup

        docs = spark.createDataFrame(
            [("a", "alpha|||beta"), ("b", "beta|||gamma")],
            "doc_id string, text string",
        )
        got = {
            r.doc_id: (r.clean_text, r.n_paras, r.n_kept)
            for r in paragraph_dedup(docs, sep="|||").collect()
        }
        # 'beta' first arrives in doc a; doc b keeps only 'gamma'
        assert got == {
            "a": ("alpha|||beta", 2, 2),
            "b": ("gamma", 2, 1),
        }

    def test_neardup_groups_absent_graph_minimum(self, spark):
        """Pairs computed on a superset of df: a cluster whose graph-
        minimum member was filtered out of df must still elect exactly
        one canonical keeper among the PRESENT members."""
        from pawpaw_spark.operators.dedup import neardup_groups

        docs = spark.createDataFrame(
            [("b2", ""), ("c3", ""), ("z9", "")], "doc_id string, text string"
        )
        # a1 (the min of the cluster) is NOT in docs
        pairs = spark.createDataFrame(
            [("a1", "b2"), ("b2", "c3")], "a string, b string"
        )
        got = {
            r.doc: (r.group_id, r.is_canonical)
            for r in neardup_groups(docs, pairs).collect()
        }
        assert got == {
            "b2": ("a1", True),   # min PRESENT member is the keeper
            "c3": ("a1", False),
            "z9": ("z9", True),
        }

    def test_index_append_param_mismatch_raises(self, spark, tmp_path):
        """Appending with different LSH parameters must fail loudly
        instead of mixing incompatible hash families in one index."""
        import pytest as _pytest

        from pawpaw_spark.operators.dedup import minhash_index_write

        docs = spark.createDataFrame(
            [("d1", "the quick brown fox jumps over the lazy dog")],
            "doc_id string, text string",
        )
        path = str(tmp_path / "idx")
        minhash_index_write(docs, path, n_hashes=16, bands=4, seed=42)
        with _pytest.raises(ValueError, match="do not match"):
            minhash_index_write(
                docs, path, n_hashes=32, bands=4, seed=42, mode="append"
            )
        # same params append is fine
        minhash_index_write(
            docs, path, n_hashes=16, bands=4, seed=42, mode="append"
        )
        assert spark.read.parquet(f"{path}/rows").count() == 2

    def test_registry_bounded_after_release(self, spark):
        """unpersist_attached/cached_scope must REMOVE released handles
        from the session registry, not leave dead entries forever."""
        from pawpaw_spark.operators.dedup import (
            cached_scope, ngram_jaccard_pairs, release_session_caches,
        )

        release_session_caches(spark)
        docs = spark.createDataFrame(
            [(f"d{i}", f"some text body number {i} with words") for i in range(30)],
            "doc_id string, text string",
        )
        for _ in range(4):
            with cached_scope(ngram_jaccard_pairs(docs, threshold=0.5)) as p:
                p.count()
        reg = getattr(spark, "_pawpaw_cache_registry", [])
        assert len(reg) == 0

    def test_quality_q4_no_int64_overflow_on_multi_mb_doc(self, spark):
        """c*w > ~3.8e11 wraps the old int64 form; DECIMAL(38,0) must
        return the exact Python-int value."""
        from pawpaw_spark.operators.text import quality_q4

        big = "word " * 300_000  # c=1.5e6, w=3e5 -> c*w = 4.5e11
        df = spark.createDataFrame([("d1", big)], "doc_id string, text string")
        got = df.select(quality_q4().alias("q")).first().q
        c, w = len(big), 300_000
        p, s, a = 0, 0, 4 * w
        n = (3 * c * w * min(w, 100) + 200 * w * max(c - 5 * p, 0)
             + 300 * c * min(3 * s, w) + 40 * c * max(5 * w - abs(a - 5 * w), 0))
        d = 1000 * c * w
        assert got == (20000 * n + d) // (2 * d)
        assert got > 0  # the wrapped int64 form went negative here

    def test_pii_counts_match_redactions_when_families_overlap(self, spark):
        """An email whose local part looks like a phone number: exactly
        one [EMAIL] token, and n_phones must be 0 because nothing was
        left for the phone family to redact."""
        from pawpaw_spark.operators.text import pii_scrub

        df = spark.createDataFrame(
            [("d1", "mail +1-555-1234@example.com")],
            "doc_id string, text string",
        )
        r = pii_scrub(df).first()
        assert r.clean == "mail [EMAIL]"
        assert (r.n_emails, r.n_phones, r.n_cards, r.n_ipv4s) == (1, 0, 0, 0)
        # counts == tokens actually present in clean, per family
        assert r.clean.count("[PHONE]") == r.n_phones


class TestAvHeaders:
    def test_wav_round_trip_and_duration_formula(self):
        from pawpaw_spark.operators.multimodal import (
            make_av_bytes, parse_av_header,
        )

        b = make_av_bytes("wav", n_samples=48000, sample_rate=16000, channels=2)
        assert parse_av_header(b) == ("wav", 3000, 16000, 2, None, None)
        # non-divisible rate: floor semantics of data*1000 // byte_rate
        b = make_av_bytes("wav", n_samples=12345, sample_rate=44100, channels=1)
        assert parse_av_header(b) == ("wav", 279, 44100, 1, None, None)

    def test_wav_odd_chunk_padding(self):
        """RIFF chunks are word-aligned: an odd-sized chunk before
        'fmt ' must not desynchronize the walk."""
        from pawpaw_spark.operators.multimodal import (
            make_av_bytes, parse_av_header,
        )

        good = make_av_bytes("wav", n_samples=64, sample_rate=8000, channels=1)
        # splice an odd-length LIST chunk right after the WAVE tag
        odd = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
        spliced = good[:12] + odd + good[12:]
        body_len = len(spliced) - 8
        spliced = b"RIFF" + body_len.to_bytes(4, "little") + spliced[8:]
        assert parse_av_header(spliced) == ("wav", 8, 8000, 1, None, None)

    def test_mp4_round_trip_and_no_video_track(self):
        from pawpaw_spark.operators.multimodal import (
            make_av_bytes, parse_av_header,
        )

        b = make_av_bytes("mp4", duration_ms=61500, width=1920, height=1080)
        assert parse_av_header(b) == ("mp4", 61500, None, None, 1920, 1080)
        audio_only = make_av_bytes("mp4", duration_ms=7, width=0, height=0)
        assert parse_av_header(audio_only) == ("mp4", 7, None, None, None, None)

    def test_garbage_and_truncation_yield_none(self):
        from pawpaw_spark.operators.multimodal import (
            make_av_bytes, parse_av_header,
        )

        assert parse_av_header(None) is None
        assert parse_av_header(b"") is None
        assert parse_av_header(b"\x00\x01\x02") is None
        assert parse_av_header(b"RIFFxxxxWAVE") is None  # no chunks
        full = make_av_bytes("mp4", duration_ms=5, width=10, height=20)
        assert parse_av_header(full[:20]) is None  # moov truncated away

    def test_decode_av_meta_distributed(self, spark):
        from pawpaw_spark.operators.multimodal import (
            decode_av_meta, make_av_bytes,
        )

        rows = [
            ("w1", make_av_bytes("wav", n_samples=8000, sample_rate=8000, channels=1)),
            ("v1", make_av_bytes("mp4", duration_ms=1234, width=640, height=480)),
            ("bad", b"\xde\xad\xbe\xef"),
        ]
        df = spark.createDataFrame(rows, "media_id string, payload binary")
        got = {r.media_id: r.asDict() for r in decode_av_meta(df).collect()}
        assert got["w1"]["format"] == "wav" and got["w1"]["duration_ms"] == 1000
        assert got["w1"]["sample_rate"] == 8000 and got["w1"]["channels"] == 1
        assert got["v1"]["format"] == "mp4" and got["v1"]["duration_ms"] == 1234
        assert (got["v1"]["width"], got["v1"]["height"]) == (640, 480)
        assert got["bad"]["format"] is None and got["bad"]["duration_ms"] is None


class TestTfidfKeywords:
    def _py(self, rows, k, log_idf=False):
        import math
        import re
        from collections import Counter

        n = len(rows)
        tf = {}
        dfreq = Counter()
        for doc_id, text in rows:
            toks = [t for t in re.split(r"[^0-9a-z_]+", text.lower()) if t]
            c = Counter(toks)
            tf[doc_id] = c
            dfreq.update(set(toks))
        out = set()
        for doc_id, c in tf.items():
            if log_idf:
                scored = [
                    (t, cnt, dfreq[t],
                     cnt * (math.log((n + 1) / (dfreq[t] + 1)) + 1))
                    for t, cnt in c.items()
                ]
            else:
                scored = [
                    (t, cnt, dfreq[t], cnt * (n + 1) / (dfreq[t] + 1))
                    for t, cnt in c.items()
                ]
            scored.sort(key=lambda x: (-x[3], x[0]))
            for rank, (t, cnt, d, s) in enumerate(scored[:k], 1):
                out.add((doc_id, t, cnt, d, rank))
        return out

    def test_matches_python_linear(self, spark):
        from pawpaw_spark.operators.text import tfidf_keywords

        rows = [
            ("a", "spark spark shuffle join the the the"),
            ("b", "the join graph graph graph"),
            ("c", "the the spark graph"),
            ("d", "unique_token only here; the rest are common the"),
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = {
            (r.doc_id, r.token, r.tf, r.df, r.rank)
            for r in tfidf_keywords(df, k=3).collect()
        }
        assert got == self._py(rows, k=3)

    def test_log_idf_variant(self, spark):
        from pawpaw_spark.operators.text import tfidf_keywords

        rows = [
            ("a", "alpha alpha beta the"),
            ("b", "beta gamma the the"),
            ("c", "gamma gamma alpha delta"),
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = {
            (r.doc_id, r.token, r.tf, r.df, r.rank)
            for r in tfidf_keywords(df, k=2, log_idf=True).collect()
        }
        assert got == self._py(rows, k=2, log_idf=True)

    def test_rare_beats_common_at_equal_tf(self, spark):
        from pawpaw_spark.operators.text import tfidf_keywords

        rows = [("a", "rare common"), ("b", "common"), ("c", "common")]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        top = {
            r.doc_id: r.token
            for r in tfidf_keywords(df, k=1).collect()
        }
        assert top["a"] == "rare"


class TestChunkTokens:
    def _py(self, rows, width, stride):
        out = set()
        for doc_id, text in rows:
            toks = text.split()
            n = len(toks)
            if n <= width:
                n_chunks = 1
            else:
                n_chunks = (n - width + stride - 1) // stride + 1
            for k in range(n_chunks):
                s = k * stride
                window = toks[s : s + width]
                out.add((doc_id, k, len(window), " ".join(window)))
        return out

    def test_matches_python(self, spark):
        from pawpaw_spark.operators.packing import chunk_tokens

        rows = [
            ("a", " ".join(f"t{i}" for i in range(10))),
            ("exact", " ".join(f"t{i}" for i in range(4))),
            ("short", "one two"),
            ("empty", "   "),
            ("one_over", " ".join(f"t{i}" for i in range(5))),
            ("punct", "Keep, CASE! and  multi   spaces\ttabs\nnewlines"),
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = {
            (r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_text)
            for r in chunk_tokens(df, width=4, stride=3).collect()
        }
        assert got == self._py(rows, 4, 3)

    def test_full_coverage_and_overlap(self, spark):
        from pawpaw_spark.operators.packing import chunk_tokens

        text = " ".join(str(i) for i in range(100))
        df = spark.createDataFrame([("d", text)], "doc_id string, text string")
        chunks = chunk_tokens(df, width=16, stride=12).collect()
        seen = set()
        for r in chunks:
            seen.update(r.chunk_text.split())
        assert seen == {str(i) for i in range(100)}
        # consecutive chunks share width - stride tokens
        by_idx = {r.chunk_idx: r.chunk_text.split() for r in chunks}
        for k in range(len(by_idx) - 2):  # last window may overlap more
            assert by_idx[k][12:] == by_idx[k + 1][:4]

    def test_guards(self, spark):
        from pawpaw_spark.operators.packing import chunk_tokens

        df = spark.createDataFrame([("d", "x")], "doc_id string, text string")
        with pytest.raises(ValueError, match="positive"):
            chunk_tokens(df, width=0, stride=1)
        with pytest.raises(ValueError, match="DROP"):
            chunk_tokens(df, width=4, stride=5)

    @settings(max_examples=10, deadline=None)
    @given(
        st.integers(0, 60), st.integers(1, 20), st.integers(1, 20)
    )
    def test_property_matches_python(self, spark, n, width, stride):
        from pawpaw_spark.operators.packing import chunk_tokens

        if stride > width:
            return
        rows = [("d", " ".join(f"w{i}" for i in range(n)))]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = {
            (r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_text)
            for r in chunk_tokens(df, width=width, stride=stride).collect()
        }
        assert got == self._py(rows, width, stride)


class TestEpochShuffle:
    def test_matches_python_md5_and_epochs_differ(self, spark):
        import hashlib

        from pawpaw_spark.operators.sampling import epoch_shuffle_key

        df = spark.createDataFrame(
            [(str(i),) for i in range(50)], "doc_id string"
        )
        got0 = {
            r.doc_id: r.shuffle_key
            for r in epoch_shuffle_key(df, seed=0).collect()
        }
        want0 = {
            str(i): hashlib.md5(f"0:{i}".encode()).hexdigest()
            for i in range(50)
        }
        assert got0 == want0
        # epoch 1 is an independent permutation: order differs
        got1 = {
            r.doc_id: r.shuffle_key
            for r in epoch_shuffle_key(df, seed=1).collect()
        }
        order0 = sorted(got0, key=lambda d: (got0[d], d))
        order1 = sorted(got1, key=lambda d: (got1[d], d))
        assert order0 != order1
        # rerun is bit-identical (pure function of the data)
        again = {
            r.doc_id: r.shuffle_key
            for r in epoch_shuffle_key(df, seed=0).collect()
        }
        assert again == got0


class TestLeakageSafeSplit:
    def _mk(self, spark):
        docs = spark.createDataFrame(
            [(f"d{i:02d}",) for i in range(12)], "doc_id string"
        )
        # two clusters: chain d00-d01-d02, pair d05-d06
        pairs = spark.createDataFrame(
            [("d00", "d01"), ("d01", "d02"), ("d05", "d06")],
            "a string, b string",
        )
        return docs, pairs

    def test_clusters_share_split(self, spark):
        from pawpaw_spark.operators.sampling import leakage_safe_split

        docs, pairs = self._mk(spark)
        out = leakage_safe_split(
            docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
        )
        got = {r.doc_id: (r.canon_id, r.split) for r in out.collect()}
        assert len(got) == 12  # left join: no blowup, no drops
        # connected docs share canon (= min id) and split
        assert got["d00"] == got["d01"] == got["d02"] == ("d00", got["d00"][1])
        assert got["d05"] == got["d06"] == ("d05", got["d05"][1])
        # singletons are their own cluster
        assert got["d07"][0] == "d07"

    def test_assignment_matches_hash_mirror(self, spark):
        import hashlib

        from pawpaw_spark.operators.sampling import leakage_safe_split

        docs, pairs = self._mk(spark)
        splits = {"train": 0.8, "val": 0.1, "test": 0.1}
        out = leakage_safe_split(docs, pairs, splits)
        got = {r.doc_id: r.split for r in out.collect()}

        def mirror(canon):
            u = int(hashlib.md5(canon.encode()).hexdigest()[:8], 16) / 16**8
            acc = 0.0
            for name in sorted(splits)[:-1]:
                acc += splits[name]
                if u < acc:
                    return name
            return sorted(splits)[-1]

        canon = {d: d for d in got}
        for c in (("d00", "d01", "d02"), ("d05", "d06")):
            for d in c:
                canon[d] = min(c)
        for d, s in got.items():
            assert s == mirror(canon[d]), d

    def test_stability_under_growth(self, spark):
        from pawpaw_spark.operators.sampling import leakage_safe_split

        docs, pairs = self._mk(spark)
        splits = {"train": 0.8, "val": 0.2}
        before = {
            r.doc_id: r.split
            for r in leakage_safe_split(docs, pairs, splits).collect()
        }
        more = docs.union(
            docs.sparkSession.createDataFrame([("zz1",), ("zz2",)],
                                              "doc_id string")
        )
        after = {
            r.doc_id: r.split
            for r in leakage_safe_split(more, pairs, splits).collect()
        }
        for d, s in before.items():
            assert after[d] == s

    def test_bad_fractions_raise(self, spark):
        import pytest as _pytest

        from pawpaw_spark.operators.sampling import leakage_safe_split

        docs, pairs = self._mk(spark)
        with _pytest.raises(ValueError, match="sum to 1"):
            leakage_safe_split(docs, pairs, {"train": 0.5, "val": 0.1})
        with _pytest.raises(ValueError, match="at least one"):
            leakage_safe_split(docs, pairs, {})


class TestSemDedup:
    """SemDeDup (dedup.semdedup) vs a pure-numpy mirror of the greedy
    cluster-then-drop recipe."""

    @staticmethod
    def _mirror(vecs, k, tau):
        import numpy as np

        ids = sorted(vecs)
        cents = ids[:k]
        asg, cosc = {}, {}
        for i in ids:
            v = np.array(vecs[i])
            best = None
            for c in cents:
                cv = np.array(vecs[c])
                cos = round(
                    float(v @ cv)
                    / (float(np.sqrt(v @ v)) * float(np.sqrt(cv @ cv))),
                    6,
                )
                key = (cos, -c)
                if best is None or key > best[0]:
                    best = (key, c, cos)
            asg[i], cosc[i] = best[1], best[2]
        keep = {}
        for i in ids:
            v = np.array(vecs[i])
            dup = False
            for j in ids:
                if j >= i or asg[j] != asg[i]:
                    continue
                w = np.array(vecs[j])
                cos = round(
                    float(v @ w)
                    / (float(np.sqrt(v @ v)) * float(np.sqrt(w @ w))),
                    6,
                )
                if cos >= tau:
                    dup = True
                    break
            keep[i] = not dup
        return asg, cosc, keep

    VECS = {
        0: [1.0, 0.0, 0.1, 0.0],
        1: [0.0, 1.0, 0.0, 0.1],
        2: [0.98, 0.02, 0.11, 0.0],   # near-dup of 0
        3: [0.0, 0.97, 0.01, 0.12],   # near-dup of 1
        4: [0.97, 0.01, 0.12, 0.01],  # near-dup of 0 and 2
        5: [0.3, 0.3, 0.9, 0.3],
    }

    def test_vs_mirror(self, spark):
        from pawpaw_spark.operators.dedup import semdedup

        df = spark.createDataFrame(
            [(i, v) for i, v in self.VECS.items()],
            "vec_id long, embedding array<double>",
        )
        got = {r.id: (r.cluster, r.cos_c, r.keep)
               for r in semdedup(df, n_clusters=2, tau=0.99).collect()}
        asg, cosc, keep = self._mirror(self.VECS, 2, 0.99)
        assert got == {i: (asg[i], cosc[i], keep[i]) for i in self.VECS}
        # the construction actually drops the greedy later-id dups
        assert not got[2][2] and not got[3][2] and not got[4][2]
        assert got[0][2] and got[1][2] and got[5][2]

    def test_keep_first_by_id(self, spark):
        # identical vectors: only the smallest id survives
        from pawpaw_spark.operators.dedup import semdedup

        df = spark.createDataFrame(
            [(i, [1.0, 2.0, 3.0]) for i in (7, 3, 5)],
            "vec_id long, embedding array<double>",
        )
        got = {r.id: r.keep for r in
               semdedup(df, n_clusters=1, tau=0.999999).collect()}
        assert got == {3: True, 5: False, 7: False}

    def test_custom_centroids(self, spark):
        from pawpaw_spark.operators.dedup import semdedup

        df = spark.createDataFrame(
            [(i, v) for i, v in self.VECS.items()],
            "vec_id long, embedding array<double>",
        )
        cents = spark.createDataFrame(
            [(100, [1.0, 0.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0, 0.0])],
            "cid long, cv array<double>",
        )
        got = {r.id: r.cluster
               for r in semdedup(df, tau=0.99, centroids=cents).collect()}
        assert got == {0: 100, 2: 100, 4: 100, 5: 100, 1: 200, 3: 200}

    def test_tau_validation(self, spark):
        import pytest

        from pawpaw_spark.operators.dedup import semdedup

        df = spark.createDataFrame(
            [(0, [1.0])], "vec_id long, embedding array<double>"
        )
        for bad in (0.0, -1.0, 1.5):
            with pytest.raises(ValueError):
                semdedup(df, tau=bad)


class TestContainmentPairs:
    def _run(self, spark, rows, **kw):
        from pawpaw_spark.operators.dedup import cached_scope, containment_pairs

        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = containment_pairs(df, **kw)
        with cached_scope(out):
            return {
                (r.inner, r.outer): r.containment for r in out.collect()
            }

    def test_quote_contained(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            (1, base),
            (2, "intro words here " + base + " closing words trail"),
            (3, "totally different content with no overlap at all x y"),
        ]
        got = self._run(spark, rows, threshold=0.9)
        # every 3-gram of doc 1 appears in doc 2; not vice versa
        assert got.get((1, 2)) == 1.0
        assert (2, 1) not in got
        assert all(3 not in pair for pair in got)

    def test_both_directions_on_twins(self, spark):
        t = "one two three four five six seven"
        got = self._run(spark, [(1, t), (2, t + " eight")], threshold=0.8)
        assert got[(1, 2)] == 1.0
        assert 0.8 <= got[(2, 1)] < 1.0

    def test_matches_brute_force(self, spark):
        import itertools

        rows = [
            (1, "a b c d e f g"),
            (2, "c d e f g h i"),
            (3, "a b c d e f g h i j"),
            (4, "zz yy xx ww vv"),
        ]
        got = self._run(spark, rows, threshold=0.0, max_gram_freq=None)

        def grams(t, k=3):
            ws = t.split()
            if len(ws) < k:
                return {t}
            return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}

        expect = {}
        for (i1, t1), (i2, t2) in itertools.permutations(rows, 2):
            inter = len(grams(t1) & grams(t2))
            if inter:
                expect[(i1, i2)] = round(inter / len(grams(t1)), 6)
        assert got == expect


class TestEmbeddingCrossJoinGuard:
    def test_blockless_raises(self, spark):
        from pawpaw_spark.operators.dedup import embedding_neardup_pairs

        e = spark.createDataFrame(
            [("a", [1.0, 0.0]), ("b", [1.0, 0.0])],
            "vec_id string, embedding array<double>",
        )
        with pytest.raises(ValueError, match="cross join"):
            embedding_neardup_pairs(e)

    def test_blockless_opt_in(self, spark):
        from pawpaw_spark.operators.dedup import embedding_neardup_pairs

        e = spark.createDataFrame(
            [("a", [1.0, 0.0]), ("b", [1.0, 0.0]), ("c", [0.0, 1.0])],
            "vec_id string, embedding array<double>",
        )
        got = embedding_neardup_pairs(
            e, threshold=0.99, allow_product=True
        ).collect()
        assert [(r["a"], r["b"]) for r in got] == [("a", "b")]
