"""Bit-identity of the vectorized synthetic decode path (r13 opt).

The media hash stages' ``decode='fake'`` branch was rewritten from
per-byte Python loops to NumPy (guide §4.2: vectorize inside the
Arrow stage). These tests pin that the vectorized helpers reproduce
the scalar reference functions EXACTLY — every slice sum is an exact
integer in float64, so no tolerance is needed or allowed.
"""

from __future__ import annotations

import random

from snowalert_spark.functions.multimodal import (
    AFP_WINDOWS,
    DHASH_COLS,
    DHASH_ROWS,
    _afp_bands_from_bytes,
    _gradient_bands,
    _pooled_byte_means,
    afp_bands,
    dhash_bands,
    pixel_grid,
)


def _payloads():
    rng = random.Random(1307)
    sizes = [0, 1, 5, 63, 64, 65, 66, 71, 72, 73, 100, 257, 1024, 4096, 9999]
    for n in sizes:
        yield bytes(rng.randrange(256) for _ in range(n))
    # constant and near-constant payloads (gradient ties -> bit 0)
    yield b"\x00" * 500
    yield b"\xff" * 500
    yield bytes([7] * 100 + [8] * 100)


def test_pooled_byte_means_matches_pixel_grid():
    for raw in _payloads():
        for k in (DHASH_ROWS * DHASH_COLS, AFP_WINDOWS, 1, 3):
            ref = pixel_grid([float(x) for x in raw], rows=1, cols=k)
            vec = _pooled_byte_means(raw, k)
            assert list(vec) == ref, (len(raw), k)


def test_gradient_bands_matches_dhash_bands():
    for raw in _payloads():
        grid = pixel_grid([float(x) for x in raw])
        assert (
            _gradient_bands(grid, DHASH_ROWS, DHASH_COLS)
            == dhash_bands(grid)
        ), len(raw)


def test_afp_bands_from_bytes_matches_scalar():
    for raw in _payloads():
        assert _afp_bands_from_bytes(raw) == afp_bands(
            [float(x) for x in raw]
        ), len(raw)


def test_fuzz_random_sizes():
    rng = random.Random(42)
    for _ in range(200):
        n = rng.randrange(0, 2000)
        raw = bytes(rng.randrange(256) for _ in range(n))
        grid = pixel_grid([float(x) for x in raw])
        assert list(_pooled_byte_means(raw, DHASH_ROWS * DHASH_COLS)) == grid
        assert _gradient_bands(grid, DHASH_ROWS, DHASH_COLS) == dhash_bands(grid)
        assert _afp_bands_from_bytes(raw) == afp_bands([float(x) for x in raw])
