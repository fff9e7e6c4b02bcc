"""Audio multimodal family: REAL RIFF/WAVE PCM codec + mapInPandas
operators (features / resample / chunk fan-out) — schema, Arrow batch shape
and 1→many explosion all exercised through Spark execution."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from govuk_crawler_worker_spark.sources.audio import (
    decode_wav,
    encode_wav,
    make_sine,
    resample_linear,
)


class TestWavCodec:
    def test_round_trip_int16_exact(self):
        rng = np.random.default_rng(7)
        raw = rng.integers(-32768, 32767, size=(500, 2), dtype=np.int16)
        out, rate = decode_wav(encode_wav(raw, 44_100))
        assert rate == 44_100 and out.shape == (500, 2)
        assert np.array_equal((out * 32767.0).round().astype(np.int16), raw)

    def test_mono_float_round_trip_close(self):
        sig = make_sine(440.0, 0.5, 8000, 0.25)
        out, rate = decode_wav(encode_wav(sig, 8000))
        assert rate == 8000 and out.shape == (2000, 1)
        assert float(np.abs(out[:, 0] - sig).max()) < 1.0 / 32767

    def test_unknown_chunks_skipped(self):
        wav = bytearray(encode_wav(make_sine(100.0, 0.2, 8000, 0.1), 8000))
        # splice a LIST chunk between fmt and data (word-aligned)
        fmt_end = 12 + 8 + 16
        extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
        spliced = bytes(wav[:fmt_end]) + extra + bytes(wav[fmt_end:])
        out, rate = decode_wav(spliced)
        assert rate == 8000 and out.shape[0] == 800

    def test_garbage_rejected(self):
        with pytest.raises(ValueError):
            decode_wav(b"NOTWAVE" * 4)
        with pytest.raises(ValueError):
            decode_wav(encode_wav(make_sine(100, 0.1, 8000, 0.1), 8000)[:16])

    def test_resample_linear_halves(self):
        sig = make_sine(200.0, 0.5, 8000, 0.5)[:, None]
        out = resample_linear(sig, 8000, 4000)
        assert out.shape == (2000, 1)
        # a 200 Hz tone survives 4 kHz sampling: energy preserved within 2%
        assert abs(np.sqrt((out**2).mean()) / np.sqrt((sig**2).mean()) - 1) < 0.02


class TestWavCodecProperties:
    def test_round_trip_any_shape(self):
        """Property: every (n_samples, channels, rate) combination of int16
        audio survives encode→decode bit-exactly."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=60, deadline=None)
        @given(
            n=st.integers(min_value=1, max_value=400),
            ch=st.integers(min_value=1, max_value=4),
            rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
            seed=st.integers(min_value=0, max_value=2**31 - 1),
        )
        def check(n, ch, rate, seed):
            rng = np.random.default_rng(seed)
            raw = rng.integers(-32768, 32767, size=(n, ch), dtype=np.int16)
            out, r2 = decode_wav(encode_wav(raw, rate))
            assert r2 == rate and out.shape == (n, ch)
            assert np.array_equal((out * 32767.0).round().astype(np.int16), raw)

        check()


def _clips_df(spark, n=4, rate=8000, dur=0.5):
    rows = [
        {
            "clip_id": f"c{i}",
            "bytes": encode_wav(make_sine(100.0 * (i + 1), 0.1 * (i + 1), rate, dur), rate),
        }
        for i in range(n)
    ]
    return spark.createDataFrame(pd.DataFrame(rows), "clip_id string, bytes binary")


class TestAudioOperators:
    def test_features_match_analytics(self, spark):
        from govuk_crawler_worker_spark.operators.audio import audio_features

        rate, dur = 8000, 0.5
        feats = {r["clip_id"]: r for r in audio_features(_clips_df(spark)).collect()}
        assert len(feats) == 4
        for i in range(4):
            r = feats[f"c{i}"]
            amp, freq = 0.1 * (i + 1), 100.0 * (i + 1)
            assert r["sample_rate"] == rate and r["n_channels"] == 1
            assert r["duration_s"] == dur
            assert abs(r["rms"] - amp / math.sqrt(2)) / (amp / math.sqrt(2)) < 0.01
            assert abs(r["zcr"] - 2 * freq / rate) / (2 * freq / rate) < 0.05
            assert abs(r["peak"] - amp) / amp < 0.02

    def test_resample_operator(self, spark):
        from govuk_crawler_worker_spark.operators.audio import resample_audio

        out = {r["clip_id"]: r for r in resample_audio(_clips_df(spark), 4000).collect()}
        for r in out.values():
            assert r["sample_rate"] == 4000 and r["n_samples"] == 2000
            samples, rate = decode_wav(bytes(r["bytes"]))
            assert rate == 4000 and samples.shape[0] == 2000

    def test_chunk_fan_out_covers_clip(self, spark):
        from govuk_crawler_worker_spark.operators.audio import chunk_audio

        rows = chunk_audio(_clips_df(spark, n=2), chunk_s=0.2).collect()
        by_clip = {}
        for r in rows:
            by_clip.setdefault(r["clip_id"], []).append(r)
        for cid, chunks in by_clip.items():
            chunks.sort(key=lambda r: r["chunk_idx"])
            # 0.5 s at 0.2 s chunks → 3 chunks (0.2, 0.2, 0.1)
            assert [c["n_samples"] for c in chunks] == [1600, 1600, 800]
            assert [c["start_s"] for c in chunks] == [0.0, 0.2, 0.4]
            # chunks re-concatenate into the original signal
            parts = [decode_wav(bytes(c["bytes"]))[0] for c in chunks]
            whole = np.concatenate(parts)
            assert whole.shape[0] == 4000
