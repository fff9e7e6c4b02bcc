"""Multimodal column operators: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with (w, h, fmt, …) metadata —
the BASELINE input_hint shape.  Decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` — the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested; only the codec layer
is a stub where the container lacks the library:

* ``png`` / ``jpeg``(QIM stand-in) decode — REAL (sources/images.py)
* any other fmt — raises NotImplementedError, clearly marked, so a real
  deployment drops in libjpeg/ffmpeg bindings without touching plan shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from govuk_crawler_worker_spark.sources import images as img

FEATURE_SCHEMA = (
    "image_id string, w int, h int, fmt string, mean_r double, mean_g double, "
    "mean_b double, brightness double, phash long"
)


def image_features(payload: DataFrame) -> DataFrame:
    """Decode + per-image feature extraction (mean channel values,
    brightness, phash), batched per Arrow chunk."""

    def extract(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = img.decode_image(bytes(r.bytes), r.fmt).astype(np.float64)
                means = px.mean(axis=(0, 1))
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": int(r.w),
                        "h": int(r.h),
                        "fmt": r.fmt,
                        "mean_r": round(float(means[0]), 4),
                        "mean_g": round(float(means[1]), 4),
                        "mean_b": round(float(means[2]), 4),
                        "brightness": round(float(px.mean()), 4),
                        "phash": img.phash64(px.astype(np.uint8)),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "w", "h", "fmt", "mean_r", "mean_g", "mean_b",
                    "brightness", "phash",
                ],
            )

    return payload.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        extract, FEATURE_SCHEMA
    )


RESIZE_SCHEMA = "image_id string, w int, h int, fmt string, bytes binary"


def resize_images(payload: DataFrame, factor: int = 2) -> DataFrame:
    """Block-mean downsample by an integer factor; re-encodes with the same
    codec.  numpy only — demonstrates a mutate-binary-column pipeline."""

    def resize(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = img.decode_image(bytes(r.bytes), r.fmt)
                h, w, _ = px.shape
                nh, nw = max(h // factor, 1), max(w // factor, 1)
                px = px[: nh * factor, : nw * factor]
                small = (
                    px.reshape(nh, factor, nw, factor, 3).mean(axis=(1, 3)).astype(np.uint8)
                )
                data = img.encode_png(small) if r.fmt == "png" else img.encode_lossy(small)
                rows.append(
                    {"image_id": r.image_id, "w": nw, "h": nh, "fmt": r.fmt, "bytes": data}
                )
            yield pd.DataFrame(rows, columns=["image_id", "w", "h", "fmt", "bytes"])

    return payload.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        resize, RESIZE_SCHEMA
    )


def frame_sample_stub(video: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — STUB: the container has no video codec.  The
    plan shape (binary in → exploded frame rows out via mapInPandas) is the
    real contract; the decode call raises until a codec is provided."""

    def sample(batches):
        for pdf in batches:
            if len(pdf):
                raise NotImplementedError(
                    "video decode requires ffmpeg bindings not present in this "
                    "container; swap this stub for a real decoder"
                )
            yield pd.DataFrame(columns=["video_id", "frame_idx", "frame_bytes"])

    return video.mapInPandas(sample, "video_id string, frame_idx int, frame_bytes binary")
