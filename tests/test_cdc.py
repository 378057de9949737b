"""Content-defined chunking vs a Python reference + the shift property."""

import hashlib
import random

from pawpaw_spark.operators.substring import cdc_chunks


def _py_chunks(text, k=8, mask_bits=6):
    d = 1 << mask_bits
    n = len(text)
    if n == 0:
        return []
    bounds = [
        p
        for p in range(k - 1, n - 1)
        if int(hashlib.md5(text[p - k + 1 : p + 1].encode()).hexdigest()[:8], 16)
        % d
        == 0
    ]
    starts = [0] + [p + 1 for p in bounds]
    ends = [p + 1 for p in bounds] + [n]
    out = []
    for i, (s, e) in enumerate(zip(starts, ends)):
        out.append(
            (i, s, e - s, hashlib.md5(text[s:e].encode()).hexdigest())
        )
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {}
    for r in cdc_chunks(df, **kw).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start"], r["length"], r["digest"])
        )
    return {k: sorted(v) for k, v in out.items()}


class TestCdcChunks:
    def test_matches_python_reference(self, spark):
        rng = random.Random(5)
        rows = [
            (f"d{i}", "".join(rng.choice("abcdefgh ") for _ in range(n)))
            for i, n in enumerate([0, 3, 7, 8, 50, 400, 2000])
        ]
        got = _run(spark, rows)
        for k, text in rows:
            want = sorted(_py_chunks(text))
            assert got.get(k, []) == want, k

    def test_chunks_tile_the_document(self, spark):
        rng = random.Random(6)
        text = "".join(rng.choice("xyzw.") for _ in range(1500))
        got = _run(spark, [("d", text)])["d"]
        assert got[0][1] == 0
        covered = sum(c[2] for c in got)
        assert covered == len(text)
        for (i1, s1, l1, _), (i2, s2, _, _) in zip(got, got[1:]):
            assert s2 == s1 + l1 and i2 == i1 + 1

    def test_shift_invariance_of_shared_tail(self, spark):
        # the same long passage embedded at DIFFERENT offsets must
        # produce identical interior chunk digests — the whole point
        rng = random.Random(7)
        shared = "".join(rng.choice("mnopq rstu") for _ in range(1200))
        rows = [
            ("a", "PREFIX-A " + shared),
            ("b", "a completely different and longer prefix " + shared),
        ]
        got = _run(spark, rows)
        da = {c[3] for c in got["a"]}
        db = {c[3] for c in got["b"]}
        common = da & db
        # interior chunks of `shared` align after the first cut inside it
        assert len(common) >= max(len(da), len(db)) - 3

    def test_short_doc_single_chunk(self, spark):
        got = _run(spark, [("d", "tiny")])
        assert got["d"] == [
            (0, 0, 4, hashlib.md5(b"tiny").hexdigest())
        ]

    def test_every_short_doc_whole_chunk_small_mask(self, spark):
        # Regression (round-5 ADVICE): sequence(k-1, n-2) steps
        # BACKWARD when n <= k, so unguarded short docs probed
        # positions past end-of-doc; with mask_bits=2 a quarter of
        # those phantom hashes cut, emitting negative-length chunks
        # and md5('') digests. Every doc of length 1..2k must emit
        # exactly one whole-doc chunk.
        rng = random.Random(11)
        rows = [
            (f"s{i}", "".join(rng.choice("abcdefgh ") for _ in range(n)))
            for i, n in enumerate(
                list(range(1, 17)) * 4
            )
        ]
        got = _run(spark, rows, k=8, mask_bits=2)
        ref = {
            i: [
                (j, s, ln, dg)
                for (j, s, ln, dg) in _py_chunks(t, k=8, mask_bits=2)
            ]
            for i, t in rows
        }
        assert got == {k: v for k, v in ref.items() if v}
        for i, t in rows:
            if len(t) <= 8:
                assert got[i] == [
                    (0, 0, len(t), hashlib.md5(t.encode()).hexdigest())
                ], (i, t)


import pytest

from pawpaw_spark.operators.substring import cdc_delta_dups, cdc_index_write


def _full_dups_restricted(all_rows, new_ids, k=8, mask_bits=6):
    """From-scratch oracle: chunk the WHOLE corpus, count digests
    corpus-wide, report new-doc chunks with corpus count >= 2."""
    counts = {}
    chunks = {}
    for doc, text in all_rows:
        cs = _py_chunks(text, k, mask_bits)
        chunks[doc] = cs
        for _, _, _, dg in cs:
            counts[dg] = counts.get(dg, 0) + 1
    out = set()
    for doc in new_ids:
        for idx, s, ln, dg in chunks[doc]:
            if counts[dg] >= 2:
                out.add((doc, idx, dg))
    return out


class TestCdcIncremental:
    def test_delta_equals_full_restricted(self, spark, tmp_path):
        rng = random.Random(11)
        mk = lambda n: "".join(rng.choice("abcde fg") for _ in range(n))
        hist = [(f"h{i}", mk(600)) for i in range(8)]
        # one new doc clones a historical tail at a shifted offset;
        # two new docs share a passage with each other only
        shared_new = mk(400)
        new = [
            ("n0", "fresh head " + hist[2][1][150:]),
            ("n1", "A" + shared_new),
            ("n2", "BBBB" + shared_new),
            ("n3", mk(300)),
        ]
        path = str(tmp_path / "cdc_idx")
        hdf = spark.createDataFrame(hist, "doc_id string, text string")
        cdc_index_write(hdf, path)
        ndf = spark.createDataFrame(new, "doc_id string, text string")
        got = {
            (r["id"], r["chunk_idx"], r["digest"])
            for r in cdc_delta_dups(ndf, path).collect()
        }
        want = _full_dups_restricted(
            hist + new, {d for d, _ in new}
        )
        assert got == want
        assert any(d == "n0" for d, _, _ in got)  # cross-era clone
        assert any(d == "n1" for d, _, _ in got)  # in-delta pair

    def test_id_collision_raises(self, spark, tmp_path):
        path = str(tmp_path / "cdc_idx2")
        df = spark.createDataFrame(
            [("a", "some text here")], "doc_id string, text string"
        )
        cdc_index_write(df, path)
        with pytest.raises(ValueError, match="already"):
            cdc_delta_dups(df, path).collect()

    def test_append_param_mismatch_raises(self, spark, tmp_path):
        path = str(tmp_path / "cdc_idx3")
        df = spark.createDataFrame(
            [("a", "some text here")], "doc_id string, text string"
        )
        cdc_index_write(df, path, k=8, mask_bits=6)
        df2 = spark.createDataFrame(
            [("b", "more text")], "doc_id string, text string"
        )
        with pytest.raises(ValueError, match="do not match"):
            cdc_index_write(df2, path, k=12, mask_bits=6, mode="append")
        # matching params append fine, and the delta sees both eras
        cdc_index_write(df2, path, k=8, mask_bits=6, mode="append")
        df3 = spark.createDataFrame(
            [("c", "some text here")], "doc_id string, text string"
        )
        got = {r["id"] for r in cdc_delta_dups(df3, path).collect()}
        assert got == {"c"}


def _py_chunks_norm(text, k=8, mask_bits=6, min_len=16, max_len=128):
    d = 1 << mask_bits
    n = len(text)
    if n == 0:
        return []
    cand = [
        p + 1
        for p in range(k - 1, n - 1)
        if int(hashlib.md5(text[p - k + 1 : p + 1].encode()).hexdigest()[:8], 16)
        % d
        == 0
    ]
    last, cuts = 0, []
    for e in cand:
        while e - last > max_len:
            last += max_len
            cuts.append(last)
        if e - last >= min_len:
            cuts.append(e)
            last = e
    while n - last > max_len:
        last += max_len
        cuts.append(last)
    starts = [0] + cuts
    ends = cuts + [n]
    return [
        (i, s, e - s, hashlib.md5(text[s:e].encode()).hexdigest())
        for i, (s, e) in enumerate(zip(starts, ends))
    ]


class TestCdcNormalized:
    def test_matches_python_reference(self, spark):
        rng = random.Random(21)
        rows = [
            (f"d{i}", "".join(rng.choice("abcdefgh ") for _ in range(n)))
            for i, n in enumerate([0, 5, 40, 300, 2000, 5000])
        ]
        got = _run(spark, rows, min_len=16, max_len=128)
        for key, text in rows:
            want = sorted(_py_chunks_norm(text))
            assert got.get(key, []) == want, key

    def test_length_bounds_hold(self, spark):
        rng = random.Random(22)
        text = "".join(rng.choice("qrstu vw") for _ in range(4000))
        got = _run(spark, [("d", text)], min_len=20, max_len=100)["d"]
        lens = [c[2] for c in got]
        # every chunk except possibly the final tail respects min_len,
        # and NO chunk exceeds max_len
        assert all(ln <= 100 for ln in lens)
        assert all(ln >= 20 for ln in lens[:-1])
        assert sum(lens) == len(text)

    def test_no_boundaries_forces_max_len_tiling(self, spark):
        text = "A" * 1000  # uniform text: md5 boundaries unlikely; if
        # one fires the reference tracks it identically anyway
        got = _run(spark, [("d", text)], min_len=16, max_len=128)["d"]
        assert got == sorted(_py_chunks_norm(text, min_len=16, max_len=128))

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="both"):
            cdc_chunks(df, min_len=5).collect()
        with _pytest.raises(ValueError, match="min_len <= max_len"):
            cdc_chunks(df, min_len=50, max_len=10).collect()
