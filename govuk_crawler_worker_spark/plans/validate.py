"""Per-row payload invariants (BASELINE input_hint).

For every fetched image row, versus the generator's ground-truth pixels:
decoded-pixel equality for lossless formats, PSNR ≥ 40 dB for lossy; exact
caption equality; phash match; dimensions match.

Runs as ``mapInPandas`` (Arrow batches; numpy decode per batch — no per-row
Python UDF), so validation itself distributes across the cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from govuk_crawler_worker_spark.sources import images as img

VALIDATION_SCHEMA = (
    "image_id string, psnr double, pixels_ok boolean, caption_ok boolean, "
    "phash_ok boolean, dims_ok boolean"
)

PSNR_LOSSY_MIN_DB = 40.0


def validate_fetched_images(fetched: DataFrame, origin: DataFrame) -> DataFrame:
    """fetched(image rows) ⋈ origin ground truth → per-row invariant report."""
    joined = (
        fetched.where(F.col("image_id").isNotNull())
        .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
        .join(
            origin.select(
                "image_id",
                F.col("pixels").alias("origin_pixels"),
                F.col("w").alias("ow"),
                F.col("h").alias("oh"),
                F.col("caption").alias("origin_caption"),
            ),
            "image_id",
        )
    )

    def check(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                decoded = img.decode_image(bytes(r.bytes), r.fmt)
                origin_px = np.frombuffer(bytes(r.origin_pixels), dtype=np.uint8).reshape(
                    r.oh, r.ow, 3
                )
                dims_ok = decoded.shape == origin_px.shape
                p = img.psnr(origin_px, decoded) if dims_ok else 0.0
                pixels_ok = (
                    bool(np.array_equal(decoded, origin_px))
                    if r.fmt == "png"
                    else p >= PSNR_LOSSY_MIN_DB
                )
                rows.append(
                    {
                        "image_id": r.image_id,
                        "psnr": float(min(p, 1e9)),
                        "pixels_ok": pixels_ok,
                        "caption_ok": r.caption == r.origin_caption,
                        "phash_ok": int(r.phash) == img.phash64(decoded),
                        "dims_ok": dims_ok,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "psnr", "pixels_ok", "caption_ok", "phash_ok", "dims_ok",
                ],
            )

    return joined.mapInPandas(check, VALIDATION_SCHEMA)
