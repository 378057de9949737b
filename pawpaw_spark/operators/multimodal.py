"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Header-level decode is REAL: :func:`parse_image_header` reads
width/height/format from PNG IHDR, JPEG SOF, GIF logical-screen and BMP
info-header bytes in pure Python (the formats are public specs), and
:func:`decode_image_meta` runs it Arrow-batched over a media table.
AUDIO decode is REAL for 16-bit PCM WAV: :func:`decode_wav_pcm` reads
the interleaved samples from the RIFF data chunk (stdlib + numpy — no
codec library needed) and :func:`audio_features` computes per-channel
rms/peak/mean/duration from them. Only codec-gated decode is stubbed
(``decode_image`` needs Pillow, compressed audio needs a codec — not
in this container); ``_fake_feature`` is the deterministic
model-forward stand-in for THOSE formats only. Everything Spark-side —
schema, Arrow batch shape, partitioning, UDF signatures — is real and
tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque-binary media table from the documents table
    (deterministic; payload = utf8 bytes of text — a stand-in blob)."""
    return docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.col("doc_id"), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(1080)) + 1).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF markers carry dimensions; C4=DHT, C8=JPG-extension, CC=DAC do not
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def parse_image_header(payload: bytes | None) -> tuple[str, int, int] | None:
    """(format, width, height) from the container header bytes — pure
    Python over the public PNG/JPEG/GIF/BMP wire formats, no image
    library. Returns None for anything unrecognized or truncated.

    PNG: IHDR is the first chunk after the 8-byte signature; width and
    height are big-endian uint32 at offsets 16 and 20 (PNG spec 11.2.2).
    JPEG: walk marker segments from SOI; the first SOFn segment holds
    uint16 height then width after the precision byte (ITU T.81 B.2.2).
    GIF: uint16-LE width/height right after the 6-byte version block.
    BMP: int32-LE width/height at offsets 18/22 of the BITMAPINFOHEADER.
    """
    if not payload:
        return None
    b = payload
    if b.startswith(_PNG_SIG):
        if len(b) < 24 or b[12:16] != b"IHDR":
            return None
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return ("png", w, h) if 0 < w and 0 < h else None
    if b.startswith(b"\xff\xd8"):
        i = 2
        n = len(b)
        while i + 4 <= n:
            if b[i] != 0xFF:
                return None
            # ITU T.81 B.1.1.2: any number of 0xFF fill bytes may pad
            # the space before a marker code
            while i + 1 < n and b[i + 1] == 0xFF:
                i += 1
            if i + 4 > n:
                return None
            marker = b[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI/RSTn: bare
                i += 2
                continue
            if marker == 0xD9:  # EOI before any SOF
                return None
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            if marker in _JPEG_SOF:
                if i + 4 + 5 > n:
                    return None
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return ("jpeg", w, h) if 0 < w and 0 < h else None
            i += 2 + seg_len
        return None
    if b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) < 10:
            return None
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return ("gif", w, h) if 0 < w and 0 < h else None
    if b.startswith(b"BM"):
        if len(b) < 26:
            return None
        # offsets 18/22 are int32 only for BITMAPINFOHEADER (DIB header
        # size >= 40); the OS/2 BITMAPCOREHEADER (size 12) packs uint16
        # dims at 18/20 and would misparse as garbage int32s
        dib = int.from_bytes(b[14:18], "little")
        if dib >= 40:
            w = int.from_bytes(b[18:22], "little", signed=True)
            # height may be negative (top-down rows); magnitude is size
            h = abs(int.from_bytes(b[22:26], "little", signed=True))
        elif dib == 12:
            w = int.from_bytes(b[18:20], "little")
            h = int.from_bytes(b[20:22], "little")
        else:
            return None
        return ("bmp", w, h) if 0 < w and 0 < h else None
    return None


def make_image_bytes(fmt: str, width: int, height: int, pixels=None) -> bytes:
    """Structurally-honest image bytes for tests/oracles: real
    signatures, real chunk/segment framing, real CRCs. By default only
    the pixel payload is omitted (PNG) or minimal (JPEG/GIF/BMP), so
    any spec-conforming header parser reads the same dimensions. Pass
    ``pixels`` (a uint8 array of shape (height, width, 3), RGB) to emit
    a COMPLETE image for the two formats whose pixel encoding is
    stdlib-expressible — ``bmp`` (24-bit uncompressed, bottom-up BGR
    rows with 4-byte padding) and ``png`` (8-bit truecolor, filter-0
    scanlines, one zlib IDAT) — :func:`decode_image_pixels` round-trips
    both exactly."""
    import zlib

    if pixels is not None:
        if fmt not in ("png", "bmp"):
            raise ValueError(
                "pixels= is only supported for png/bmp (the stdlib-"
                f"expressible encodings), not {fmt!r}"
            )
        a = np.asarray(pixels, dtype=np.uint8)
        if a.shape != (height, width, 3):
            raise ValueError(
                f"pixels shape {a.shape} != (height={height}, "
                f"width={width}, 3)"
            )

    if fmt == "png":
        def chunk(ctype: bytes, payload: bytes) -> bytes:
            body = ctype + payload
            return (
                len(payload).to_bytes(4, "big") + body
                + zlib.crc32(body).to_bytes(4, "big")
            )

        ihdr = (
            width.to_bytes(4, "big") + height.to_bytes(4, "big")
            + b"\x08\x02\x00\x00\x00"  # 8-bit, truecolor
        )
        out = _PNG_SIG + chunk(b"IHDR", ihdr)
        if pixels is not None:
            raw = b"".join(
                b"\x00" + a[y].tobytes() for y in range(height)
            )
            out += chunk(b"IDAT", zlib.compress(raw))
        return out + chunk(b"IEND", b"")
    if fmt == "jpeg":
        app0 = b"JFIF\x00\x01\x02\x01\x00\x48\x00\x48\x00\x00"
        sof0 = (
            b"\x08" + height.to_bytes(2, "big") + width.to_bytes(2, "big")
            + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        )
        return (
            b"\xff\xd8"
            + b"\xff\xe0" + (len(app0) + 2).to_bytes(2, "big") + app0
            + b"\xff\xc0" + (len(sof0) + 2).to_bytes(2, "big") + sof0
            + b"\xff\xd9"
        )
    if fmt == "gif":
        return (
            b"GIF89a"
            + width.to_bytes(2, "little") + height.to_bytes(2, "little")
            + b"\x00\x00\x00" + b"\x3b"  # no GCT; trailer
        )
    if fmt == "bmp":
        px = b""
        if pixels is not None:
            stride = (width * 3 + 3) // 4 * 4
            bgr = a[..., ::-1]
            px = b"".join(
                bgr[y].tobytes().ljust(stride, b"\x00")
                for y in range(height - 1, -1, -1)  # bottom-up rows
            )
        info = (
            (40).to_bytes(4, "little")
            + width.to_bytes(4, "little", signed=True)
            + height.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little")            # BI_RGB
            + len(px).to_bytes(4, "little")
            + bytes(16)
        )
        header = (
            b"BM" + (54 + len(px)).to_bytes(4, "little") + bytes(4)
            + (54).to_bytes(4, "little")
        )
        return header + info + px
    raise ValueError(f"unknown format: {fmt}")


def decode_image_meta(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """(media_id, format, width, height) parsed from the payload header
    bytes — Arrow-batched pure-Python header reads (no image library);
    unrecognized payloads yield nulls so corrupt blobs never kill a
    100 TB scan."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_image_header(p) for p in pdf[payload_col].values]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "format": [m[0] if m else None for m in metas],
                    "width": pd.array([m[1] if m else None for m in metas], dtype="Int32"),
                    "height": pd.array([m[2] if m else None for m in metas], dtype="Int32"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        kernel, schema="media_id string, format string, width int, height int"
    )


def _bmp_pixels(b: bytes):
    """24-bit uncompressed BI_RGB BMP -> (h, w, 3) uint8 RGB, or None.
    Pure byte math (bottom-up rows unless height is negative, 4-byte
    row padding, BGR order) — BMP carries raw pixels, no codec."""
    if len(b) < 54 or not b.startswith(b"BM"):
        return None
    data_off = int.from_bytes(b[10:14], "little")
    dib = int.from_bytes(b[14:18], "little")
    if dib < 40:
        return None
    w = int.from_bytes(b[18:22], "little", signed=True)
    h_raw = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if bpp != 24 or compression != 0 or w <= 0 or h_raw == 0:
        return None
    h = abs(h_raw)
    stride = (w * 3 + 3) // 4 * 4
    if len(b) < data_off + stride * h:
        return None
    rows = np.frombuffer(
        b[data_off : data_off + stride * h], dtype=np.uint8
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR -> RGB


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/px


def _png_pixels(b: bytes):
    """8-bit non-interlaced PNG -> (h, w[, ch]) uint8, or None. REAL
    decode via stdlib zlib + the five PNG scanline filters (spec 9.2:
    None/Sub/Up/Average/Paeth) — PNG's only codec is DEFLATE, which
    the stdlib provides. Palette (type 3), 16-bit, and interlaced
    images return None (genuinely out of scope for a pure-stdlib
    reader)."""
    import zlib

    if not b.startswith(_PNG_SIG) or len(b) < 33 or b[12:16] != b"IHDR":
        return None
    w = int.from_bytes(b[16:20], "big")
    h = int.from_bytes(b[20:24], "big")
    if w <= 0 or h <= 0:  # mirror parse_image_header's dimension gate
        return None
    depth, ctype, _, _, interlace = b[24:29]
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        return None
    ch = _PNG_CHANNELS[ctype]
    # concatenate IDAT chunk payloads
    idat, i, n = [], 8, len(b)
    while i + 8 <= n:
        clen = int.from_bytes(b[i : i + 4], "big")
        cty = b[i + 4 : i + 8]
        if cty == b"IDAT":
            idat.append(b[i + 8 : i + 8 + clen])
        if cty == b"IEND":
            break
        i += 12 + clen
    if not idat:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = np.frombuffer(
            raw[pos + 1 : pos + 1 + stride], dtype=np.uint8
        ).astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) % 256
        elif f == 1:  # Sub: a per-channel-lane prefix sum — vectorized
            cur = (
                np.cumsum(line.reshape(w, ch).astype(np.int64), axis=0)
                % 256
            ).reshape(stride).astype(np.int32)
        elif f in (3, 4):  # Average / Paeth: left-dependent, so the
            # scan is sequential over PIXELS, but the channel lanes
            # vectorize — O(w) python iterations per row, not O(w*ch)
            lp = line.reshape(w, ch)
            pp = prev.reshape(w, ch)
            cp = np.zeros((w, ch), dtype=np.int32)
            zero = np.zeros(ch, dtype=np.int32)
            for i in range(w):
                a = cp[i - 1] if i else zero
                u = pp[i]
                if f == 3:
                    pred = (a + u) // 2
                else:
                    c = pp[i - 1] if i else zero
                    p = a + u - c
                    pa = np.abs(p - a)
                    pb = np.abs(p - u)
                    pc = np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a,
                        np.where(pb <= pc, u, c),
                    )
                cp[i] = (lp[i] + pred) % 256
            cur = cp.reshape(stride)
        else:
            return None
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, ch) if ch > 1 else out.reshape(h, w)


def decode_image_pixels(payload: bytes | None):
    """REAL pixel decode for the stdlib-expressible formats: 24-bit
    uncompressed BMP and 8-bit non-interlaced PNG -> a uint8 array
    (h, w, 3/4) RGB(A) or (h, w) grayscale; None for codec-gated
    formats (JPEG/GIF) and anything malformed."""
    if not payload:
        return None
    b = bytes(payload)
    if b.startswith(b"BM"):
        return _bmp_pixels(b)
    if b.startswith(_PNG_SIG):
        return _png_pixels(b)
    return None


def image_features(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """REAL per-channel image statistics for decodable payloads ->
    (media_id, format, width, height, channel, mean, min, max) — one
    row per (payload, channel); codec-gated/corrupt payloads contribute
    no rows (the audio_features contract). mean in float64 (exact when
    the true mean is representable — the gradient constructions the
    contract oracle replays in closed form), min/max as int64."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col].values, pdf[payload_col].values):
                px = decode_image_pixels(p)
                # hdr re-checked independently: a payload one decoder
                # accepts and the other rejects must SKIP, not raise —
                # corrupt blobs never kill the scan
                hdr = parse_image_header(bytes(p)) if px is not None else None
                if px is None or px.size == 0 or hdr is None:
                    continue
                fmt = hdr[0]
                if px.ndim == 2:
                    px = px[:, :, None]
                h, w, ch = px.shape
                s = px.astype(np.float64)
                for c in range(ch):
                    rows.append(
                        (
                            mid, fmt, w, h, c,
                            float(np.mean(s[:, :, c])),
                            int(px[:, :, c].min()),
                            int(px[:, :, c].max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "format", "width", "height", "channel",
                    "mean", "min", "max",
                ],
            )

    return media.select(id_col, payload_col).mapInPandas(
        kernel,
        schema=(
            "media_id string, format string, width int, height int, "
            "channel int, mean double, min long, max long"
        ),
    )


def decode_image(payload: bytes):
    """Full decode: the pure-stdlib path (:func:`decode_image_pixels`,
    BMP + PNG) first, then Pillow for codec-gated formats; raises only
    when BOTH are unavailable for the payload."""
    px = decode_image_pixels(payload)
    if px is not None:
        return px
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "JPEG/GIF decoding requires Pillow; this container stubs "
            "the codec-gated decode step (BMP/PNG decode is real — "
            "decode_image_pixels)"
        ) from e


# --- audio / video containers ------------------------------------------------
# Same design as the image path: pure-Python reads of the PUBLIC wire
# formats (RIFF/WAVE chunks, ISO-BMFF boxes), no media library; codec
# decode stays stubbed. Header metadata (duration, rate, dims) is what
# a training pipeline filters/buckets on before any expensive decode.


def parse_av_header(payload: bytes | None):
    """(format, duration_ms, sample_rate, channels, width, height) from
    container header bytes, or None if unrecognized/truncated.

    WAV: RIFF chunk walk (RIFF spec): 'fmt ' carries channels (uint16
    LE @ +2), sample rate (uint32 LE @ +4), byte rate (uint32 LE @ +8);
    'data' carries the payload size — duration_ms = data_size * 1000
    // byte_rate. width/height are None.
    MP4 (ISO-BMFF 14496-12): top-level box walk to 'moov'; 'mvhd'
    holds timescale/duration (v0 @ +12/+16, v1 @ +20/+24 of the box
    payload; duration_ms = duration * 1000 // timescale); each
    'trak'/'tkhd' holds 16.16-fixed width/height — the video track is
    the one with nonzero dims. sample_rate/channels are None (they
    live codec-deep in stsd, beyond a header read).
    """
    if not payload:
        return None
    b = payload
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        i, n = 12, len(b)
        channels = rate = byte_rate = data_size = None
        while i + 8 <= n:
            cid = b[i : i + 4]
            csz = int.from_bytes(b[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 8 + 16 <= n:
                channels = int.from_bytes(b[i + 10 : i + 12], "little")
                rate = int.from_bytes(b[i + 12 : i + 16], "little")
                byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
            elif cid == b"data":
                data_size = csz
            # chunks are word-aligned: odd sizes carry a pad byte
            i += 8 + csz + (csz & 1)
            if channels is not None and data_size is not None:
                break
        if not byte_rate or channels is None or data_size is None:
            return None
        return ("wav", data_size * 1000 // byte_rate, rate, channels, None, None)

    def _boxes(buf, start, end):
        i = start
        while i + 8 <= end:
            size = int.from_bytes(buf[i : i + 4], "big")
            btype = buf[i + 4 : i + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                if i + 16 > end:
                    return
                size = int.from_bytes(buf[i + 8 : i + 16], "big")
                hdr = 16
            elif size == 0:  # box extends to end of file
                size = end - i
            if size < hdr or i + size > end:
                return
            yield btype, i + hdr, i + size
            i += size

    if len(b) >= 12 and b[4:8] in (b"ftyp", b"moov", b"styp"):
        dur_ms = width = height = None
        for btype, s, e in _boxes(b, 0, len(b)):
            if btype != b"moov":
                continue
            for ctype, cs, ce in _boxes(b, s, e):
                if ctype == b"mvhd" and ce - cs >= 20:
                    ver = b[cs]
                    if ver == 0 and ce - cs >= 20:
                        ts = int.from_bytes(b[cs + 12 : cs + 16], "big")
                        dur = int.from_bytes(b[cs + 16 : cs + 20], "big")
                    elif ver == 1 and ce - cs >= 28:
                        ts = int.from_bytes(b[cs + 20 : cs + 24], "big")
                        dur = int.from_bytes(b[cs + 24 : cs + 32], "big")
                    else:
                        continue
                    if ts:
                        dur_ms = dur * 1000 // ts
                elif ctype == b"trak":
                    for ttype, tss, tse in _boxes(b, cs, ce):
                        if ttype != b"tkhd":
                            continue
                        ver = b[tss]
                        # v0: 4 (ver/flags) + 8 (times) + 8 (id/res)
                        # + 4 (duration) + 16 (res/layer/alt/vol/res)
                        # + 36 (matrix) = 76 to the 16.16 width
                        off = 76 if ver == 0 else 88
                        if tse - tss >= off + 8:
                            w = int.from_bytes(b[tss + off : tss + off + 4], "big") >> 16
                            h = int.from_bytes(b[tss + off + 4 : tss + off + 8], "big") >> 16
                            if w and h:
                                width, height = w, h
        if dur_ms is None:
            return None
        return ("mp4", dur_ms, None, None, width, height)
    return None


def make_av_bytes(
    fmt: str,
    *,
    n_samples: int = 0,
    sample_rate: int = 16000,
    channels: int = 1,
    duration_ms: int = 0,
    width: int = 0,
    height: int = 0,
    samples=None,
) -> bytes:
    """Structurally-honest container bytes (the make_image_bytes
    analog): real RIFF chunk framing / real ISO-BMFF box framing with
    spec-correct field layouts. By default the WAV 'data' chunk
    declares its size but carries no samples and the MP4 carries no
    'mdat' — header parsers (this module's and any spec-conforming
    one) read identical metadata either way. Pass ``samples`` (an
    int16 array, frames x channels or flat mono) to emit a COMPLETE
    PCM WAV whose data chunk carries the interleaved samples —
    :func:`decode_wav_pcm` round-trips it exactly."""
    if fmt == "wav":
        byte_rate = sample_rate * channels * 2
        if samples is not None:
            pcm = np.asarray(samples, dtype=np.int16)
            if pcm.ndim == 1:
                pcm = pcm[:, None]
            if pcm.shape[1] != channels:
                raise ValueError(
                    f"samples have {pcm.shape[1]} channels, "
                    f"expected {channels}"
                )
            data = pcm.astype("<i2").tobytes()  # interleaved frames
            data_size = len(data)
        else:
            data = b""
            data_size = n_samples * channels * 2
        fmt_chunk = (
            (1).to_bytes(2, "little")          # PCM
            + channels.to_bytes(2, "little")
            + sample_rate.to_bytes(4, "little")
            + byte_rate.to_bytes(4, "little")
            + (channels * 2).to_bytes(2, "little")
            + (16).to_bytes(2, "little")
        )
        body = (
            b"WAVE"
            + b"fmt " + len(fmt_chunk).to_bytes(4, "little") + fmt_chunk
            + b"data" + data_size.to_bytes(4, "little") + data
        )
        return b"RIFF" + len(body).to_bytes(4, "little") + body
    if fmt == "mp4":
        def box(btype: bytes, payload: bytes) -> bytes:
            return (8 + len(payload)).to_bytes(4, "big") + btype + payload

        mvhd = box(
            b"mvhd",
            bytes(4)                            # version 0 + flags
            + bytes(8)                          # ctime, mtime
            + (1000).to_bytes(4, "big")         # timescale: ms units
            + duration_ms.to_bytes(4, "big")
            + bytes(80),                        # rate..next_track_ID
        )
        tkhd = box(
            b"tkhd",
            bytes(4) + bytes(8)                 # v0+flags, ctime/mtime
            + (1).to_bytes(4, "big") + bytes(4)  # track_ID, reserved
            + duration_ms.to_bytes(4, "big")
            + bytes(8) + bytes(8)               # reserved, layer..volume+res
            + bytes(36)                         # identity matrix slot
            + (width << 16).to_bytes(4, "big")
            + (height << 16).to_bytes(4, "big"),
        )
        moov = box(b"moov", mvhd + box(b"trak", tkhd))
        ftyp = box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isom")
        return ftyp + moov
    raise ValueError(f"unknown format: {fmt}")


def decode_av_meta(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """(media_id, format, duration_ms, sample_rate, channels, width,
    height) parsed from container header bytes — Arrow-batched pure-
    Python reads; unrecognized payloads yield nulls (corrupt blobs
    never kill a 100 TB scan)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_av_header(p) for p in pdf[payload_col].values]
            get = lambda j, dt: pd.array(
                [m[j] if m else None for m in metas], dtype=dt
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "format": [m[0] if m else None for m in metas],
                    "duration_ms": get(1, "Int64"),
                    "sample_rate": get(2, "Int32"),
                    "channels": get(3, "Int32"),
                    "width": get(4, "Int32"),
                    "height": get(5, "Int32"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        kernel,
        schema=(
            "media_id string, format string, duration_ms long, "
            "sample_rate int, channels int, width int, height int"
        ),
    )


def decode_wav_pcm(payload: bytes | None):
    """REAL audio decode for 16-bit PCM WAV (pure stdlib/numpy — no
    codec library needed; RIFF and PCM are public specs): returns
    (samples, sample_rate) with samples an int16 array of shape
    (n_frames, channels), or None when the payload is not a decodable
    PCM WAV (other formats stay codec-gated behind
    :func:`decode_image`-style stubs)."""
    if not payload or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    b, i, n = payload, 12, len(payload)
    channels = rate = bits = audio_fmt = None
    data = None
    while i + 8 <= n:
        cid = b[i : i + 4]
        csz = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 8 + 16 <= n:
            audio_fmt = int.from_bytes(b[i + 8 : i + 10], "little")
            channels = int.from_bytes(b[i + 10 : i + 12], "little")
            rate = int.from_bytes(b[i + 12 : i + 16], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
        elif cid == b"data":
            data = b[i + 8 : i + 8 + csz]
        i += 8 + csz + (csz & 1)
    if (
        audio_fmt != 1 or bits != 16 or not channels or not rate
        or data is None
    ):
        return None
    frame_bytes = channels * 2
    usable = len(data) - (len(data) % frame_bytes)
    if usable <= 0:
        return None
    pcm = np.frombuffer(data[:usable], dtype="<i2").reshape(-1, channels)
    return pcm, rate


def audio_features(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """REAL per-channel audio features for PCM WAV payloads ->
    (media_id, channel, n_samples, duration_ms, rms, peak, mean) — one
    row per (payload, channel), non-decodable payloads contribute no
    rows (corrupt blobs never kill the scan). rms = sqrt(mean(s^2)) in
    float64 (exact for constant-magnitude signals: a square wave of
    amplitude A has rms exactly A, the closed form the contract oracle
    replays), peak = max(|s|), mean = mean(s). Arrow-batched
    mapInPandas; the only shuffle is whatever the caller does next."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col].values, pdf[payload_col].values):
                dec = decode_wav_pcm(p)
                if dec is None:
                    continue
                pcm, rate = dec
                nfr = pcm.shape[0]
                dur = nfr * 1000 // rate
                s = pcm.astype(np.float64)
                for c in range(pcm.shape[1]):
                    rows.append(
                        (
                            mid, c, nfr, dur,
                            float(np.sqrt(np.mean(s[:, c] ** 2))),
                            int(np.max(np.abs(pcm[:, c].astype(np.int64)))),
                            float(np.mean(s[:, c])),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "channel", "n_samples", "duration_ms",
                    "rms", "peak", "mean",
                ],
            )

    return media.select(id_col, payload_col).mapInPandas(
        kernel,
        schema=(
            "media_id string, channel int, n_samples long, "
            "duration_ms long, rms double, peak long, mean double"
        ),
    )


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake embedding: blake2b-seeded uniform vector."""
    h = hashlib.blake2b(payload or b"", digest_size=8).digest()
    rng = np.random.RandomState(int.from_bytes(h, "little") % (2**32))
    return rng.rand(dim).astype(np.float64)


def _real_or_fake_feature(payload, dim: int) -> list | None:
    """A decodable PCM WAV gets a REAL signal-statistics vector
    ([duration_ms, n_frames, channels, rate, then per-channel rms/
    peak/mean], zero-padded/truncated to dim); every codec-gated
    format falls back to the deterministic fake embedding."""
    if payload is None:
        return None
    dec = decode_wav_pcm(bytes(payload))
    if dec is None:
        return _fake_feature(bytes(payload), dim).tolist()
    pcm, rate = dec
    s = pcm.astype(np.float64)
    vec = [
        float(pcm.shape[0] * 1000 // rate),
        float(pcm.shape[0]),
        float(pcm.shape[1]),
        float(rate),
    ]
    for c in range(pcm.shape[1]):
        vec.extend(
            (
                float(np.sqrt(np.mean(s[:, c] ** 2))),
                float(np.max(np.abs(s[:, c]))),
                float(np.mean(s[:, c])),
            )
        )
    vec = vec[:dim]
    return vec + [0.0] * (dim - len(vec))


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(media_id, kind, feature: array<double>) via mapInPandas — PCM
    WAV payloads get REAL signal statistics (:func:`decode_wav_pcm`);
    codec-gated formats keep the deterministic fake until a model/codec
    library is present. The batch shape and schema are the production
    ones either way."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _real_or_fake_feature(p, dim)
                for p in pdf["payload"].values
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema="media_id string, kind string, feature array<double>"
    )


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 32) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits (media_id,
    frame_idx, ts_ms) — pure column ops (sequence + explode); the
    actual frame decode would hang off ts_ms in the real pipeline."""
    n = F.least(
        (F.col("duration_ms") / F.lit(every_ms)).cast("int") + 1, F.lit(max_frames)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(F.sequence(F.lit(0), n - 1)).alias("frame_idx", "__i"),
        )
        .select("media_id", "frame_idx", (F.col("__i") * every_ms).cast("long").alias("ts_ms"))
    )
