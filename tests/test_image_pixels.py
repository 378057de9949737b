"""Real BMP/PNG pixel decode: roundtrip exactness, all five PNG
scanline filters, grayscale/RGBA, padding, and codec gating."""

import zlib

import numpy as np
import pytest

from pawpaw_spark.operators.multimodal import (
    _PNG_SIG,
    decode_image_pixels,
    image_features,
    make_image_bytes,
    parse_image_header,
)


def _chunk(t: bytes, p: bytes) -> bytes:
    body = t + p
    return len(p).to_bytes(4, "big") + body + zlib.crc32(body).to_bytes(
        4, "big"
    )


class TestDecodePixels:
    def test_roundtrip_exact_both_formats(self):
        rng = np.random.RandomState(5)
        # widths chosen to exercise BMP 4-byte row padding (w*3 % 4
        # in {1,2,3,0})
        for w, h in [(7, 3), (8, 4), (1, 1), (5, 2), (6, 5)]:
            px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            for fmt in ("bmp", "png"):
                b = make_image_bytes(fmt, w, h, pixels=px)
                assert parse_image_header(b) == (fmt, w, h)
                got = decode_image_pixels(b)
                assert got is not None and np.array_equal(got, px), (fmt, w, h)

    def test_png_all_five_filters_reconstruct(self):
        # encode each scanline with a DIFFERENT filter (None/Sub/Up/
        # Average/Paeth applied forward); the decoder must invert all
        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

        rng = np.random.RandomState(11)
        w, h, ch = 6, 5, 3
        px = rng.randint(0, 256, (h, w, ch)).astype(np.uint8)
        raw = b""
        prev = np.zeros(w * ch, np.int32)
        for y in range(h):
            line = px[y].reshape(-1).astype(np.int32)
            f = y % 5
            enc = np.zeros(w * ch, np.int32)
            for x in range(w * ch):
                a = int(line[x - ch]) if x >= ch else 0
                u = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                pred = {0: 0, 1: a, 2: u, 3: (a + u) // 2,
                        4: paeth(a, u, c)}[f]
                enc[x] = (int(line[x]) - pred) % 256
            raw += bytes([f]) + bytes(enc.astype(np.uint8))
            prev = line
        ihdr = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0])
        )
        png = (
            _PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_image_pixels(png), px)

    def test_png_gray_and_rgba(self):
        rng = np.random.RandomState(3)
        for ctype, shape in ((0, (4, 3)), (6, (4, 3, 4))):
            px = rng.randint(0, 256, shape).astype(np.uint8)
            raw = b"".join(b"\x00" + px[y].tobytes() for y in range(4))
            ihdr = (
                (3).to_bytes(4, "big") + (4).to_bytes(4, "big")
                + bytes([8, ctype, 0, 0, 0])
            )
            png = (
                _PNG_SIG + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(raw))
                + _chunk(b"IEND", b"")
            )
            assert np.array_equal(decode_image_pixels(png), px)

    def test_codec_gated_and_garbage_return_none(self):
        assert decode_image_pixels(make_image_bytes("jpeg", 4, 4)) is None
        assert decode_image_pixels(make_image_bytes("gif", 4, 4)) is None
        # header-only (pixel-less) containers gate too
        assert decode_image_pixels(make_image_bytes("png", 4, 4)) is None
        assert decode_image_pixels(make_image_bytes("bmp", 4, 4)) is None
        assert decode_image_pixels(b"garbage") is None
        assert decode_image_pixels(None) is None

    def test_pixels_shape_validated(self):
        with pytest.raises(ValueError, match="shape"):
            make_image_bytes(
                "bmp", 4, 4, pixels=np.zeros((2, 2, 3), np.uint8)
            )


class TestImageFeatures:
    def test_gradient_closed_forms(self, spark):
        w, h, c0, c1, c2 = 8, 4, 30, 12, 200
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        px = np.stack(
            [
                np.broadcast_to(c0 + x, (h, w)),
                np.broadcast_to(c1 + 2 * y, (h, w)),
                np.full((h, w), c2),
            ],
            axis=-1,
        ).astype(np.uint8)
        b = make_image_bytes("bmp", w, h, pixels=px)
        media = spark.createDataFrame(
            [("m", bytearray(b)), ("bad", bytearray(b"zz"))],
            "media_id string, payload binary",
        )
        rows = {r["channel"]: r for r in image_features(media).collect()}
        assert set(rows) == {0, 1, 2}
        assert rows[0]["mean"] == c0 + (w - 1) / 2.0
        assert (rows[0]["min"], rows[0]["max"]) == (c0, c0 + w - 1)
        assert rows[1]["mean"] == float(c1 + (h - 1))
        assert (rows[1]["min"], rows[1]["max"]) == (c1, c1 + 2 * (h - 1))
        assert rows[2]["mean"] == float(c2)
        assert (rows[2]["min"], rows[2]["max"]) == (c2, c2)
        assert rows[0]["format"] == "bmp"
        assert (rows[0]["width"], rows[0]["height"]) == (w, h)


class TestReviewRegressions:
    def test_zero_dim_png_skipped_not_crashed(self, spark):
        # a structurally-valid height-0 PNG must contribute no rows,
        # never a NoneType subscript inside the kernel
        import numpy as np

        b0 = make_image_bytes(
            "png", 5, 0, pixels=np.zeros((0, 5, 3), np.uint8)
        )
        assert decode_image_pixels(b0) is None
        ok = make_image_bytes(
            "bmp", 2, 2, pixels=np.full((2, 2, 3), 9, np.uint8)
        )
        media = spark.createDataFrame(
            [("z", bytearray(b0)), ("ok", bytearray(ok))],
            "media_id string, payload binary",
        )
        rows = image_features(media).collect()
        assert {r["media_id"] for r in rows} == {"ok"}

    def test_pixels_rejected_for_codec_gated_formats(self):
        import numpy as np

        for fmt in ("jpeg", "gif"):
            with pytest.raises(ValueError, match="png/bmp"):
                make_image_bytes(
                    fmt, 2, 2, pixels=np.zeros((2, 2, 3), np.uint8)
                )
