"""Real PCM WAV decode + per-channel audio features vs closed forms
and a from-first-principles Python recompute."""

import math

import numpy as np
import pytest

from pawpaw_spark.operators.multimodal import (
    audio_features,
    decode_wav_pcm,
    extract_features,
    make_av_bytes,
    parse_av_header,
)


class TestDecodeWavPcm:
    def test_roundtrip_exact(self):
        rng = np.random.RandomState(7)
        pcm = rng.randint(-32768, 32767, size=(101, 2)).astype(np.int16)
        b = make_av_bytes("wav", sample_rate=8000, channels=2, samples=pcm)
        dec = decode_wav_pcm(b)
        assert dec is not None
        got, rate = dec
        assert rate == 8000
        assert np.array_equal(got, pcm)
        # the header parser reads the same container
        fmt, dur, r2, ch, _, _ = parse_av_header(b)
        assert (fmt, r2, ch) == ("wav", 8000, 2)
        assert dur == 101 * 1000 // 8000

    def test_mono_flat_input(self):
        pcm = np.array([1, -2, 3], dtype=np.int16)
        b = make_av_bytes("wav", sample_rate=16000, channels=1, samples=pcm)
        got, _ = decode_wav_pcm(b)
        assert got.shape == (3, 1)
        assert list(got[:, 0]) == [1, -2, 3]

    def test_headerless_and_garbage_return_none(self):
        assert decode_wav_pcm(None) is None
        assert decode_wav_pcm(b"not a wav") is None
        # sample-less header (declared size, no data chunk bytes)
        hdr = make_av_bytes("wav", n_samples=100, sample_rate=8000)
        assert decode_wav_pcm(hdr) is None
        # mp4 is codec-gated
        assert decode_wav_pcm(make_av_bytes("mp4", duration_ms=5)) is None

    def test_channel_mismatch_raises(self):
        pcm = np.zeros((4, 2), dtype=np.int16)
        with pytest.raises(ValueError, match="channels"):
            make_av_bytes("wav", channels=3, samples=pcm)


class TestAudioFeatures:
    def test_square_wave_closed_forms(self, spark):
        # amplitude-A square wave: rms == A exactly, peak == A,
        # mean == 0 over an even frame count
        n, amps = 64, [700, 750]
        sign = np.where(np.arange(n) % 2 == 0, 1, -1)[:, None]
        pcm = (sign * np.array(amps)[None, :]).astype(np.int16)
        b = make_av_bytes("wav", sample_rate=8000, channels=2, samples=pcm)
        media = spark.createDataFrame(
            [("m1", bytearray(b)), ("bad", bytearray(b"junk"))],
            "media_id string, payload binary",
        )
        rows = {r["channel"]: r for r in audio_features(media).collect()}
        assert set(rows) == {0, 1}
        for c, a in enumerate(amps):
            assert rows[c]["media_id"] == "m1"
            assert rows[c]["rms"] == float(a)
            assert rows[c]["peak"] == a
            assert rows[c]["mean"] == 0.0
            assert rows[c]["n_samples"] == n
            assert rows[c]["duration_ms"] == n * 1000 // 8000

    def test_matches_python_recompute(self, spark):
        rng = np.random.RandomState(3)
        pcm = rng.randint(-5000, 5000, size=(37, 3)).astype(np.int16)
        b = make_av_bytes("wav", sample_rate=16000, channels=3, samples=pcm)
        media = spark.createDataFrame(
            [("x", bytearray(b))], "media_id string, payload binary"
        )
        rows = {r["channel"]: r for r in audio_features(media).collect()}
        for c in range(3):
            s = pcm[:, c].astype(np.float64)
            assert rows[c]["rms"] == pytest.approx(
                math.sqrt(float(np.mean(s**2))), rel=0, abs=0
            )
            assert rows[c]["peak"] == int(np.max(np.abs(s)))
            assert rows[c]["mean"] == pytest.approx(
                float(np.mean(s)), rel=0, abs=0
            )


class TestExtractFeaturesRealWav:
    def test_wav_gets_real_stats_vector(self, spark):
        n, a = 32, 900
        sign = np.where(np.arange(n) % 2 == 0, 1, -1)
        pcm = (sign * a).astype(np.int16)
        b = make_av_bytes("wav", sample_rate=16000, channels=1, samples=pcm)
        media = spark.createDataFrame(
            [("w", "audio", bytearray(b)), ("f", "audio", bytearray(b"zz"))],
            "media_id string, kind string, payload binary",
        )
        feats = {r["media_id"]: r["feature"] for r in
                 extract_features(media).collect()}
        # real vector: [duration_ms, n_frames, channels, rate, rms,
        # peak, mean, 0-pad...]
        assert feats["w"][:7] == [
            float(n * 1000 // 16000), float(n), 1.0, 16000.0,
            float(a), float(a), 0.0,
        ]
        assert all(v == 0.0 for v in feats["w"][7:])
        # codec-gated payloads keep the deterministic fake
        assert len(feats["f"]) == len(feats["w"])
        assert any(v != 0.0 for v in feats["f"][7:])
