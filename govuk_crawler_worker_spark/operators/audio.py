"""Audio-column operators: the audio member of the multimodal family.

Same contract as operators/multimodal.py (SURVEY.md §2 training-data ops —
the reference crawler has no audio; this is LLM-pipeline surface the engine
adds): clips travel as an opaque ``binary`` column + typed metadata, and
decode / feature-extract / resample / chunk run as Arrow-batched
``mapInPandas``.  Unlike the image/video codecs (libjpeg/ffmpeg absent →
honest stand-ins), the codec here is REAL: canonical RIFF/WAVE PCM-16
(sources/audio.py) — encode, chunk-walking decode, resample, features, all
numpy, no stubs.

Scale notes: every operator is embarrassingly parallel over clips (no
shuffle at all — mapInPandas over the scan partitioning); ``chunk_audio``
is the 1→many fan-out (the audio analogue of video frame_sample) whose
output feeds windowed training pipelines, and its row explosion happens
executor-side inside the Arrow batch, never through the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from govuk_crawler_worker_spark.sources import audio as au

AUDIO_FEATURE_SCHEMA = (
    "clip_id string, sample_rate int, n_channels int, n_samples long, "
    "duration_s double, rms double, peak double, zcr double"
)


def audio_features(clips: DataFrame, id_col: str = "clip_id") -> DataFrame:
    """Decode + per-clip signal features: RMS, peak, zero-crossing rate
    (fraction of adjacent-sample sign flips, channel-averaged) — the
    standard cheap quality/energy gates of an audio curation pipeline."""

    def extract(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                samples, rate = au.decode_wav(bytes(r.bytes))
                mono = samples.mean(axis=1)
                flips = np.signbit(mono[1:]) != np.signbit(mono[:-1])
                n = samples.shape[0]
                rows.append(
                    {
                        "clip_id": getattr(r, id_col),
                        "sample_rate": rate,
                        "n_channels": samples.shape[1],
                        "n_samples": n,
                        "duration_s": round(n / rate, 6),
                        "rms": round(float(np.sqrt((mono**2).mean())), 6),
                        "peak": round(float(np.abs(samples).max()), 6),
                        "zcr": round(float(flips.mean()) if n > 1 else 0.0, 6),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "clip_id", "sample_rate", "n_channels", "n_samples",
                    "duration_s", "rms", "peak", "zcr",
                ],
            )

    return clips.select(id_col, "bytes").mapInPandas(extract, AUDIO_FEATURE_SCHEMA)


RESAMPLE_SCHEMA = "clip_id string, sample_rate int, n_samples long, bytes binary"


def resample_audio(
    clips: DataFrame, target_rate: int, id_col: str = "clip_id"
) -> DataFrame:
    """Linear-interp resample to ``target_rate``, re-encoded as PCM WAV —
    the mutate-binary-column pipeline shape (image analogue: resize).

    Clips in an Arrow batch that share (rate, length, channels) — the
    common case: a corpus recorded at one or two sample rates with
    fixed-length training windows — are STACKED and resampled in one
    vectorized gather+lerp over a (clips, samples, channels) array instead
    of a per-clip interp loop; odd-shaped clips just form size-1 groups."""

    def resample(batches):
        for pdf in batches:
            groups: dict = {}
            for r in pdf.itertuples(index=False):
                samples, rate = au.decode_wav(bytes(r.bytes))
                key = (rate, samples.shape[0], samples.shape[1])
                groups.setdefault(key, []).append((getattr(r, id_col), samples))
            rows = []
            for (rate, n, _ch), members in groups.items():
                if rate == target_rate:
                    for cid, s in members:
                        rows.append(
                            {
                                "clip_id": cid,
                                "sample_rate": target_rate,
                                "n_samples": s.shape[0],
                                "bytes": au.encode_wav(s, target_rate),
                            }
                        )
                    continue
                m = max(1, int(round(n * target_rate / rate)))
                dst = np.linspace(0.0, n - 1, m)
                i0 = np.floor(dst).astype(np.int64)
                i1 = np.minimum(i0 + 1, n - 1)
                frac = (dst - i0)[None, :, None]
                stack = np.stack([s for _cid, s in members]).astype(np.float64)
                out = stack[:, i0, :] * (1.0 - frac) + stack[:, i1, :] * frac
                for (cid, _s), o in zip(members, out):
                    rows.append(
                        {
                            "clip_id": cid,
                            "sample_rate": target_rate,
                            "n_samples": m,
                            "bytes": au.encode_wav(o, target_rate),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["clip_id", "sample_rate", "n_samples", "bytes"]
            )

    return clips.select(id_col, "bytes").mapInPandas(resample, RESAMPLE_SCHEMA)


CHUNK_SCHEMA = (
    "clip_id string, chunk_idx int, start_s double, n_samples long, bytes binary"
)


def chunk_audio(
    clips: DataFrame, chunk_s: float = 1.0, id_col: str = "clip_id"
) -> DataFrame:
    """1→many fan-out: split each clip into fixed-duration chunks (last
    chunk keeps the remainder), each re-encoded as a standalone WAV — the
    audio analogue of video frame sampling for window-sized training
    examples."""

    def chunk(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                samples, rate = au.decode_wav(bytes(r.bytes))
                step = max(1, int(round(chunk_s * rate)))
                for ci, start in enumerate(range(0, samples.shape[0], step)):
                    part = samples[start : start + step]
                    rows.append(
                        {
                            "clip_id": getattr(r, id_col),
                            "chunk_idx": ci,
                            "start_s": round(start / rate, 6),
                            "n_samples": part.shape[0],
                            "bytes": au.encode_wav(part, rate),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "chunk_idx", "start_s", "n_samples", "bytes"],
            )

    return clips.select(id_col, "bytes").mapInPandas(chunk, CHUNK_SCHEMA)
