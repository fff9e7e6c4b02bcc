"""Image codec + payload invariant unit tests (no Spark)."""

from __future__ import annotations

import numpy as np
import pytest

from govuk_crawler_worker_spark.sources import images as img


def test_png_roundtrip_exact():
    rng = np.random.default_rng(0)
    px = img.make_pixels(rng, 20, 14)
    assert np.array_equal(img.decode_png(img.encode_png(px)), px)


def test_png_is_standard():
    px = img.make_pixels(np.random.default_rng(1), 8, 8)
    data = img.encode_png(px)
    assert data.startswith(b"\x89PNG\r\n\x1a\n")
    assert b"IHDR" in data and b"IDAT" in data and b"IEND" in data


def test_lossy_psnr_above_gate():
    rng = np.random.default_rng(2)
    px = img.make_pixels(rng, 32, 32)
    dec = img.decode_lossy(img.encode_lossy(px))
    p = img.psnr(px, dec)
    assert 40.0 <= p < 60.0  # real baseline JPEG at quality 98 ≈ 43-44 dB


def test_psnr_identical_is_inf():
    px = img.make_pixels(np.random.default_rng(3), 8, 8)
    assert img.psnr(px, px) == float("inf")


def test_phash_stable_and_discriminative():
    rng = np.random.default_rng(4)
    a = img.make_pixels(rng, 16, 16)
    b = img.make_pixels(rng, 16, 16)
    assert img.phash64(a) == img.phash64(a)
    assert img.phash64(a) != img.phash64(255 - a)
    # lossy roundtrip keeps the perceptual hash close (bits near the mean
    # threshold may flip under quantization)
    ham = bin(
        (img.phash64(img.decode_lossy(img.encode_lossy(a))) ^ img.phash64(a))
        & ((1 << 64) - 1)
    ).count("1")
    assert ham <= 8
    _ = b


def test_decode_dispatch():
    px = img.make_pixels(np.random.default_rng(5), 8, 8)
    assert np.array_equal(img.decode_image(img.encode_png(px), "png"), px)
    with pytest.raises(NotImplementedError):
        img.decode_image(b"xxxx", "webp")


class TestFrameSample:
    def test_sampled_frames_roundtrip_exactly(self, spark):
        import numpy as np

        from govuk_crawler_worker_spark.operators.multimodal import frame_sample
        from govuk_crawler_worker_spark.sources import images as img

        rng = np.random.default_rng(11)
        vids = {}
        rows = []
        for vid in ("v0", "v1"):
            frames = [img.make_pixels(rng, 8, 6) for _ in range(7)]
            vids[vid] = frames
            rows.append((vid, img.encode_video(frames)))
        df = spark.createDataFrame(rows, "video_id string, bytes binary")
        out = frame_sample(df, every_n=3).collect()
        # 7 frames sampled every 3 → indices 0, 3, 6 per video
        got = {(r["video_id"], r["frame_idx"]) for r in out}
        assert got == {(v, i) for v in vids for i in (0, 3, 6)}
        for r in out:
            px = img.decode_png(bytes(r["frame_bytes"]))
            assert (px == vids[r["video_id"]][r["frame_idx"]]).all()
            assert (r["w"], r["h"]) == (8, 6)

    def test_unknown_container_raises(self, spark):
        import pytest

        from govuk_crawler_worker_spark.operators.multimodal import frame_sample

        df = spark.createDataFrame([("v", b"NOPExxxx")], "video_id string, bytes binary")
        with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
            frame_sample(df).collect()

    def test_frame_sample_over_real_mjpeg_avi(self, spark):
        """r6: frame_sample consumes a REAL Motion-JPEG AVI — standard RIFF
        container, baseline-JPEG frame chunks — with the same plan shape as
        the raw container; sampled frames match the source within the JPEG
        quality's PSNR."""
        import numpy as np

        from govuk_crawler_worker_spark.operators.multimodal import frame_sample
        from govuk_crawler_worker_spark.sources import images as img

        rng = np.random.default_rng(23)
        vids = {}
        rows = []
        for vid in ("a0", "a1"):
            frames = [img.make_pixels(rng, 16, 8) for _ in range(5)]
            vids[vid] = frames
            rows.append((vid, img.encode_avi_mjpeg(frames, fps=10, quality=95)))
        df = spark.createDataFrame(rows, "video_id string, bytes binary")
        out = frame_sample(df, every_n=2).collect()
        got = {(r["video_id"], r["frame_idx"]) for r in out}
        assert got == {(v, i) for v in vids for i in (0, 2, 4)}
        for r in out:
            px = img.decode_png(bytes(r["frame_bytes"]))
            assert img.psnr(vids[r["video_id"]][r["frame_idx"]], px) >= 34.0
            assert (r["w"], r["h"]) == (16, 8)
