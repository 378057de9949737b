"""Winnowing exact-substring dedup (operators/substring.py).

Three layers: a pure-Python reference implementation of Schleimer et
al.'s winnowing (the published algorithm, written here from the paper's
definition) as the differential oracle; the SIGMOD-2003 detection
guarantee on planted copies; and plan-shape guards (fingerprinting must
stay shuffle-free)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pawpaw_spark.operators.substring import (
    duplicated_spans,
    shared_fingerprint_pairs,
    winnow_fingerprints,
)


def py_winnow(text: str, k: int, w: int) -> set[tuple[str, int]]:
    """Reference winnowing: min (hash, -pos) per window of w k-gram
    hashes (rightmost minimal), truncated single window for short docs."""
    n = len(text)
    if n < k:
        return set()
    grams = [
        (hashlib.md5(text[i : i + k].encode()).hexdigest(), -i)
        for i in range(n - k + 1)
    ]
    out = set()
    for p in range(max(len(grams) - w, 0) + 1):
        h, np_ = min(grams[p : p + w])
        out.add((h, -np_))
    return out


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "XX the quick brown fox jumps over the lazy dog YY other tail text"),
    (3, "completely unrelated content with nothing shared at all zzz"),
    (4, "tiny"),
    (5, ""),
    (6, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),  # degenerate: one repeated gram
    (7, "abcdefghij"),  # fewer grams than w at k=8, w=4
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id: long, text: string")


class TestFingerprints:
    def test_matches_python_reference(self, spark, docs_df):
        got = {
            (r.doc_id, r.h, r.pos)
            for r in winnow_fingerprints(docs_df, k=8, w=4).collect()
        }
        want = {
            (d, h, p) for d, t in DOCS for (h, p) in py_winnow(t, 8, 4)
        }
        assert got == want

    @pytest.mark.parametrize("k,w", [(3, 2), (5, 5), (16, 8)])
    def test_matches_python_reference_params(self, spark, docs_df, k, w):
        got = {
            (r.doc_id, r.h, r.pos)
            for r in winnow_fingerprints(docs_df, k=k, w=w).collect()
        }
        want = {(d, h, p) for d, t in DOCS for (h, p) in py_winnow(t, k, w)}
        assert got == want

    def test_density(self, spark):
        # expected fingerprint density ~2/(w+1) of positions on random text
        import random

        rng = random.Random(7)
        text = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(4000))
        df = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
        n_fp = winnow_fingerprints(df, k=8, w=8).count()
        positions = len(text) - 8 + 1
        density = n_fp / positions
        assert 0.5 * 2 / 9 < density < 2.0 * 2 / 9

    def test_xxhash64_variant(self, spark, docs_df):
        fp = winnow_fingerprints(docs_df, k=8, w=4, hash_fn="xxhash64")
        assert dict(fp.dtypes)["h"] == "bigint"
        assert fp.count() > 0

    def test_fingerprinting_is_shuffle_free(self, spark, docs_df):
        plan = winnow_fingerprints(docs_df, k=8, w=4)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestGuarantee:
    def test_planted_copy_detected_at_any_alignment(self, spark):
        # SIGMOD 2003 Thm 2: shared substring of length >= w + k - 1
        # (= 23 here) yields a shared fingerprint hash at ANY offset
        import random

        rng = random.Random(11)
        alpha = "abcdefghijklmnopqrstuvwxyz"
        passage = "".join(rng.choice(alpha) for _ in range(23))
        rows = []
        for i, prefix_len in enumerate([0, 1, 7, 13, 50]):
            noise = "".join(rng.choice("0123456789") for _ in range(prefix_len))
            tail = "".join(rng.choice("0123456789") for _ in range(17))
            rows.append((i, noise + passage + tail))
        df = spark.createDataFrame(rows, "doc_id: long, text: string")
        pairs = shared_fingerprint_pairs(df, k=16, w=8, max_df=None)
        got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
        want = {(a, b) for a in range(5) for b in range(a + 1, 5)}
        assert want <= got

    def test_max_df_drops_boilerplate(self, spark):
        # 10 byte-identical docs: EVERY fingerprint has df=10, so the
        # df > 5 guard removes all 45 pairs (docs with unique affixes
        # would keep some low-df shared fingerprints from boundary
        # windows — winnowing selection near a boundary is context-
        # dependent, which is why the guard keys on doc frequency, not
        # on position)
        rows = [(i, "shared license header text, identical everywhere") for i in range(10)]
        rows += [(100, "one completely different document body here"), (101, "another unrelated document")]
        df = spark.createDataFrame(rows, "doc_id: long, text: string")
        n_uncapped = shared_fingerprint_pairs(df, k=16, w=4, max_df=None).count()
        n_capped = shared_fingerprint_pairs(df, k=16, w=4, max_df=5).count()
        assert n_uncapped == 45 and n_capped == 0


class TestSpans:
    def test_islands_merge_and_cover(self, spark, docs_df):
        spans = {
            (r.doc_id, r.start, r.stop)
            for r in duplicated_spans(docs_df, k=8, w=4, max_df=None).collect()
        }
        by_doc = {}
        for d, s, e in spans:
            by_doc.setdefault(d, []).append((s, e))
        # docs 1 and 2 share the 44-char passage; each gets ONE island
        # covering it (alignment differs by the 'XX ' prefix)
        assert len(by_doc[1]) == 1 and len(by_doc[2]) == 1
        (s1, e1), (s2, e2) = by_doc[1][0], by_doc[2][0]
        assert e1 - s1 >= 23 and e2 - s2 >= 23
        assert s2 - s1 == 3  # prefix shift visible in anchor positions
        assert 3 not in by_doc and 4 not in by_doc and 5 not in by_doc

    def test_spans_disjoint_and_sorted(self, spark, docs_df):
        rows = duplicated_spans(docs_df, k=8, w=4, max_df=None).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append((r.start, r.stop))
        for d, sp in by_doc.items():
            sp.sort()
            for (s1, e1), (s2, e2) in zip(sp, sp[1:]):
                assert e1 < s2, f"overlapping islands in doc {d}"


class TestValidation:
    def test_bad_params(self, spark, docs_df):
        with pytest.raises(ValueError):
            winnow_fingerprints(docs_df, k=0, w=4)
        with pytest.raises(ValueError):
            winnow_fingerprints(docs_df, k=4, w=0)
        with pytest.raises(ValueError):
            winnow_fingerprints(docs_df, k=4, w=4, hash_fn="sha1")


def py_remove_spans(text: str, spans: list[tuple[int, int]]) -> str:
    keep, pos = [], 0
    for s, e in sorted(spans):
        s, e = max(0, min(len(text), s)), max(0, min(len(text), e))
        if s > pos:
            keep.append(text[pos:s])
        pos = max(pos, e)
    keep.append(text[pos:])
    return "".join(keep)


class TestRemoveSpans:
    def test_matches_python_reference(self, spark):
        from pawpaw_spark.operators.substring import remove_spans

        docs = [(1, "abcdefghij"), (2, "hello world"), (3, "short"), (4, "")]
        spans = [(1, 2, 5), (1, 7, 9), (2, 0, 6), (2, 50, 60), (4, 0, 3)]
        ddf = spark.createDataFrame(docs, "doc_id: long, text: string")
        sdf = spark.createDataFrame(spans, "doc_id: long, start: long, stop: long")
        got = {
            r.doc_id: (r.clean_text, r.n_cut)
            for r in remove_spans(ddf, sdf).collect()
        }
        for d, t in docs:
            sp = [(s, e) for (i, s, e) in spans if i == d]
            assert got[d] == (py_remove_spans(t, sp), len(sp)), f"doc {d}"

    def test_roundtrip_with_duplicated_spans(self, spark, docs_df):
        # cutting the duplicated spans must remove the shared passage:
        # the cleaned docs 1 and 2 share no fingerprints at the original
        # parameters any more
        from pawpaw_spark.operators.substring import (
            duplicated_spans,
            remove_spans,
            shared_fingerprint_pairs,
        )

        spans = duplicated_spans(docs_df, k=8, w=4, max_df=None)
        cleaned = remove_spans(docs_df, spans).select(
            "doc_id", F.col("clean_text").alias("text")
        )
        assert shared_fingerprint_pairs(cleaned, k=8, w=4, max_df=None).count() == 0


class TestIncrementalWinnow:
    def _pairs(self, df):
        return {(r.a, r.b, r.n_shared) for r in df.collect()}

    def test_delta_equals_full_restricted_to_new(self, spark, tmp_path):
        from pawpaw_spark.operators.substring import (
            winnow_delta_pairs,
            winnow_index_write,
        )

        base = "the quick brown fox jumps over the lazy dog near the river"
        rows = [(i, f"{i:03d} {base} tail{i}") for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id: long, text: string")
        hist = df.filter(F.col("doc_id") % 2 == 0)
        new = df.filter(F.col("doc_id") % 2 == 1)
        path = str(tmp_path / "widx")
        winnow_index_write(hist, path, k=16, w=4)
        got = self._pairs(winnow_delta_pairs(new, path, max_df=None))
        full = shared_fingerprint_pairs(
            df.withColumn("doc_id", F.col("doc_id").cast("string")),
            k=16, w=4, max_df=None,
        )
        want = {
            (r.doc_a, r.doc_b, r.n_shared)
            for r in full.collect()
            if int(r.doc_a) % 2 == 1 or int(r.doc_b) % 2 == 1
        }
        assert got == want and len(got) > 0

    def test_append_folds_delta_and_validates(self, spark, tmp_path):
        from pawpaw_spark.operators.substring import (
            winnow_delta_pairs,
            winnow_index_write,
        )

        base = "shared passage that is long enough to fingerprint reliably"
        d1 = spark.createDataFrame([(1, f"one {base}")], "doc_id: long, text: string")
        d2 = spark.createDataFrame([(2, f"two {base}")], "doc_id: long, text: string")
        d3 = spark.createDataFrame([(3, f"ccc {base}")], "doc_id: long, text: string")
        path = str(tmp_path / "widx2")
        winnow_index_write(d1, path, k=16, w=4)
        assert {p[:2] for p in self._pairs(winnow_delta_pairs(d2, path, max_df=None))} == {("1", "2")}
        winnow_index_write(d2, path, k=16, w=4, mode="append")
        # day 3 sees BOTH eras
        assert {p[:2] for p in self._pairs(winnow_delta_pairs(d3, path, max_df=None))} == {
            ("1", "3"), ("2", "3")
        }
        with pytest.raises(ValueError, match="sidecar"):
            winnow_index_write(d3, path, k=8, w=4, mode="append")
        with pytest.raises(ValueError, match="already present"):
            winnow_delta_pairs(d2, path)

    def test_max_df_counts_whole_corpus(self, spark, tmp_path):
        from pawpaw_spark.operators.substring import (
            winnow_delta_pairs,
            winnow_index_write,
        )

        # 3 indexed + 2 new docs share one passage: whole-corpus df = 5,
        # so max_df=4 suppresses the pairs even though the NEW slice
        # alone (df=2) would pass — the guard must see index + delta
        # SAME-LENGTH, non-containing prefixes: boundary grams are then
        # unique per doc (df=1) and every shared-passage fingerprint is
        # selected identically by all 5 docs (df=5) — numeric prefixes
        # of different lengths would make doc "10..." CONTAIN doc
        # "0..." as a suffix, a genuine df=2 pair that survives the cap
        base = "boilerplate license header shared by every document body"
        hist = spark.createDataFrame(
            [(i, f"{p} {base}") for i, p in enumerate(["aa", "bb", "cc"])],
            "doc_id: long, text: string",
        )
        new = spark.createDataFrame(
            [(i, f"{p} {base}") for i, p in [(10, "xx"), (11, "yy")]],
            "doc_id: long, text: string",
        )
        path = str(tmp_path / "widx3")
        winnow_index_write(hist, path, k=16, w=4)
        assert len(self._pairs(winnow_delta_pairs(new, path, max_df=None))) == 7
        assert len(self._pairs(winnow_delta_pairs(new, path, max_df=4))) == 0

    def test_dfreq_sidecar_exact_fallback_and_backfill(self, spark, tmp_path):
        import shutil

        from pawpaw_spark.operators.substring import (
            winnow_delta_pairs,
            winnow_index_write,
        )

        base = "boilerplate license header shared by every document body"
        mk = lambda rows: spark.createDataFrame(
            rows, "doc_id: long, text: string"
        )
        hist = mk([(i, f"{p} {base}") for i, p in enumerate(["aa", "bb", "cc"])])
        era2 = mk([(i, f"{p} {base}") for i, p in [(20, "dd"), (21, "ee")]])
        new = mk([(i, f"{p} {base}") for i, p in [(10, "xx"), (11, "yy")]])
        path = str(tmp_path / "widx4")
        winnow_index_write(hist, path, k=16, w=4)
        winnow_index_write(era2, path, k=16, w=4, mode="append")
        # sidecar partials (2 eras) sum to the exact per-h recount of rows
        rows = spark.read.parquet(f"{path}/rows")
        recount = {
            r.h: r.df
            for r in rows.select(F.col(rows.columns[0]).alias("id"), "h")
            .distinct().groupBy("h").agg(F.count(F.lit(1)).alias("df"))
            .collect()
        }
        sidecar = {
            r.h: r.df
            for r in spark.read.parquet(f"{path}/dfreq")
            .groupBy("h").agg(F.sum("df").alias("df")).collect()
        }
        assert sidecar == recount and len(sidecar) > 0
        # the max_df guard gives identical pairs through the sidecar and
        # through the pre-sidecar full-recount fallback (dfreq deleted)
        with_sidecar = self._pairs(winnow_delta_pairs(new, path, max_df=6))
        shutil.rmtree(f"{path}/dfreq")
        assert self._pairs(winnow_delta_pairs(new, path, max_df=6)) == with_sidecar
        # appending to a pre-sidecar index backfills dfreq from rows
        # first — the sidecar must cover history, not just the new era
        winnow_index_write(new, path, k=16, w=4, mode="append")
        rows2 = spark.read.parquet(f"{path}/rows")
        recount2 = {
            r.h: r.df
            for r in rows2.select(F.col(rows2.columns[0]).alias("id"), "h")
            .distinct().groupBy("h").agg(F.count(F.lit(1)).alias("df"))
            .collect()
        }
        sidecar2 = {
            r.h: r.df
            for r in spark.read.parquet(f"{path}/dfreq")
            .groupBy("h").agg(F.sum("df").alias("df")).collect()
        }
        assert sidecar2 == recount2
