"""MJPEG frame decode (r10 verdict item 6): the video tier's real
path, mirroring test_image_dhash's real-decoder stability suite.
Streams are concatenated baseline JPEGs built by the in-repo test
encoder (tests/test_jpeg.py), so no media library is involved."""

from __future__ import annotations

import numpy as np
import pytest

from snowalert_spark.functions import multimodal as M
from tests.test_jpeg import encode_jpeg


def _grad(seed, w=32, h=32):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 200, size=(h, w, 3)).astype(np.uint8)
    # smooth horizontally so the dHash has stable gradients
    return ((base.astype(int) + np.arange(w)[None, :, None] * 2) % 256).astype(
        np.uint8
    )


def _mjpeg(frames, **kw):
    return b"".join(encode_jpeg(f, **kw) for f in frames)


def test_frame_spans_walk_marker_grammar():
    frames = [_grad(s) for s in range(6)]
    data = _mjpeg(frames)
    spans = M._jpeg_frame_spans(data)
    assert len(spans) == 6
    assert spans[0][0] == 0 and spans[-1][1] == len(data)
    for s, e in spans:
        assert data[s : s + 2] == b"\xff\xd8"
        assert data[e - 2 : e] == b"\xff\xd9"
    # restart intervals + 4:2:0 subsampling inside the scan must not
    # derail the entropy walk
    tricky = _mjpeg([_grad(7)], subsample=2, dri=2) + _mjpeg([_grad(8)])
    assert len(M._jpeg_frame_spans(tricky)) == 2
    with pytest.raises(ValueError, match="SOI"):
        M._jpeg_frame_spans(data[10:])


def test_mjpeg_sampling_and_short_clips():
    frames = [_grad(s) for s in range(8)]
    out = M.mjpeg_frame_pixels(_mjpeg(frames), M.VIDEO_FRAMES)
    assert len(out) == M.VIDEO_FRAMES
    assert all(len(px) == 32 * 32 for px in out)
    # fixed-stride: sampled frames are 0, 2, 4, 6 of 8
    direct = [M.jpeg_pixels(encode_jpeg(frames[i])) for i in (0, 2, 4, 6)]
    for a, b in zip(out, direct):
        assert a == b
    # a 2-frame clip still yields VIDEO_FRAMES scanlines (repeats)
    short = M.mjpeg_frame_pixels(_mjpeg(frames[:2]), M.VIDEO_FRAMES)
    assert len(short) == M.VIDEO_FRAMES
    assert short[0] == short[1]  # frame 0 repeated


def test_video_framehash_real_mjpeg_stability(spark):
    """The real video path end to end: a clip with ONE perturbed frame
    stays within the near-dup rule (>= 3 of 4 aligned frames within
    hamming 3, the perturbed frame may drift); an unrelated clip is
    far on every frame — the same invariant the synthetic parity path
    plants."""
    frames = [_grad(s) for s in range(4)]
    variant = [f.copy() for f in frames]
    variant[2] = ((variant[2].astype(int) + 6) % 256).astype(np.uint8)
    unrelated = [_grad(100 + s) for s in range(4)]

    def row(mid, fs):
        return (
            mid,
            "video",
            _mjpeg(fs),
            {"format": "mjpeg", "width": 32, "height": 32, "duration_ms": None},
        )

    media = spark.createDataFrame(
        [row(1, frames), row(2, variant), row(3, unrelated)], M.MEDIA_SCHEMA
    )
    out = M.video_framehash(media, decode="real").collect()
    bands = {
        (r["media_id"], r["frame_no"]): [r[f"band_{i}"] for i in range(8)]
        for r in out
    }
    assert len(bands) == 3 * M.VIDEO_FRAMES

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    close_12 = sum(
        ham(bands[(1, f)], bands[(2, f)]) <= M.AFP_HAM_T
        for f in range(M.VIDEO_FRAMES)
    )
    close_13 = sum(
        ham(bands[(1, f)], bands[(3, f)]) <= M.AFP_HAM_T
        for f in range(M.VIDEO_FRAMES)
    )
    assert close_12 >= M.VIDEO_MIN_FRAMES
    assert close_13 < M.VIDEO_MIN_FRAMES


def test_jpeg_pixels_luminance_region():
    """jpeg_pixels returns the VALID (unpadded) luminance region and
    tracks the source brightness ordering."""
    dark = np.full((20, 24, 3), 30, dtype=np.uint8)
    bright = np.full((20, 24, 3), 200, dtype=np.uint8)
    pd_ = M.jpeg_pixels(encode_jpeg(dark))
    pb = M.jpeg_pixels(encode_jpeg(bright))
    assert len(pd_) == 20 * 24 and len(pb) == 20 * 24
    assert sum(pb) / len(pb) > sum(pd_) / len(pd_) + 100
