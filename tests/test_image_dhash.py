"""Perceptual image hashing (dHash) + image near-dup: unit math,
real-decoder path through the Arrow batch stage, and recall on
perceptually-perturbed images."""

from __future__ import annotations

import pytest

from snowalert_spark.functions import multimodal as M


def _ppm(w, h, pixels):
    """P6 image from a flat RGB byte list (len = w*h*3)."""
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(pixels)


def _media(spark, rows):
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_dhash_band_math():
    # strictly increasing grid -> every gradient bit set
    grid = [float(i) for i in range(72)]
    assert M.dhash_bands(grid) == [255] * 8
    assert M.dhash_hex(grid) == "ff" * 8
    # flat grid -> no bit set (strict >)
    assert M.dhash_bands([1.0] * 72) == [0] * 8
    with pytest.raises(ValueError):
        M.dhash_bands([0.0] * 71)


def test_pixel_grid_pooling():
    # 144 pixels -> 72 cells of 2; cell j = mean(2j, 2j+1)
    g = M.pixel_grid([float(i) for i in range(144)])
    assert g[0] == 0.5 and g[71] == 142.5
    # shorter than 72 -> empty slices contribute 0.0, no crash
    g2 = M.pixel_grid([10.0] * 40)
    assert len(g2) == 72 and 0.0 in g2


def test_image_dhash_real_decoder_stability(spark):
    """A mild perceptual perturbation (one channel value bumped in one
    corner) must stay within a few bits of the original through the
    REAL decode path; an unrelated gradient image must be far away."""
    M.register_pixel_decoder("ppm", M.ppm_pixels)
    base = [(i * 7 + c * 13) % 256 for i in range(64) for c in range(3)]
    perturbed = list(base)
    perturbed[0] = (perturbed[0] + 4) % 256
    unrelated = [(255 - i * 11) % 256 for i in range(64) for c in range(3)]
    rows = [
        (1, "image", _ppm(8, 8, base), {"format": "ppm", "width": 8, "height": 8, "duration_ms": None}),
        (2, "image", _ppm(8, 8, perturbed), {"format": "ppm", "width": 8, "height": 8, "duration_ms": None}),
        (3, "image", _ppm(8, 8, unrelated), {"format": "ppm", "width": 8, "height": 8, "duration_ms": None}),
    ]
    out = {
        r["media_id"]: [r[f"band_{i}"] for i in range(8)]
        for r in M.image_dhash(_media(spark, rows), decode="real").collect()
    }

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    assert ham(out[1], out[2]) <= 3
    assert ham(out[1], out[3]) > 10


def test_image_dhash_real_requires_decoder(spark):
    rows = [(1, "image", b"\x00" * 16, {"format": "mystery", "width": 1, "height": 1, "duration_ms": None})]
    with pytest.raises(Exception, match="no pixel decoder registered"):
        M.image_dhash(_media(spark, rows), decode="real").collect()


def test_dedup_image_dhash_recall(spark):
    """Every planted variant (50 at sf0.01) is recovered as exactly one
    pair with its source, and no chance pair survives the verify."""
    from snowalert_spark import workload

    df = workload.queries(include_local=True)["dedup_image_dhash"](
        spark, "/root/testdata/sf0.01"
    )
    rows = df.collect()
    assert len(rows) == 50
    assert all(r.dup_of == r.media_id + 1000000 and r.hamming <= 3 for r in rows)
