"""GIF frame decode: the second real video container (pure-stdlib
LZW + frame compositing), mirroring test_mjpeg's suite. Streams are
built by an in-test GIF89a encoder (real LZW with code-width growth),
so no media library is involved. A grayscale global palette (entry i =
(i,i,i)) makes expected luminance equal the palette index."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from snowalert_spark.functions import multimodal as M


# ---------------------------------------------------------------------------
# test-side GIF89a encoder
# ---------------------------------------------------------------------------

def lzw_encode(min_size: int, seq: bytes) -> bytes:
    """Standard GIF LZW encoder: build the code stream with the usual
    greedy dictionary, then bit-pack by SIMULATING the decoder's table
    growth so per-code widths match multimodal._gif_lzw exactly (the
    decoder runs one dictionary entry behind the encoder, so widths
    change one code later than naive encoder-side accounting)."""
    clear, eoi = 1 << min_size, (1 << min_size) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    codes = [clear]
    w = b""
    for ch in seq:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        codes.append(table[w])
        if next_code < 4096:  # table freezes at 12-bit max (deferred clear)
            table[wc] = next_code
            next_code += 1
        w = bytes([ch])
    if w:
        codes.append(table[w])
    codes.append(eoi)

    acc = bits = 0
    out = bytearray()
    width = min_size + 1
    table_len = clear + 2
    prev = False
    for code in codes:
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
        if code == clear:
            width, table_len, prev = min_size + 1, clear + 2, False
            continue
        if code == eoi:
            break
        if prev and table_len < 4096:
            table_len += 1
            if table_len == (1 << width) and width < 12:
                width += 1
        prev = True
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


GREY_GCT = b"".join(bytes([i, i, i]) for i in range(256))


def build_gif(frames, w, h, *, bg=0, interlace=(), offsets=None,
              transparent=None, disposals=None) -> bytes:
    """frames: list of 2-D uint8 index arrays; offsets: per-frame
    (left, top); transparent/disposals: per-frame or None."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 7, bg, 0])  # 256-entry GCT, grayscale
    out += GREY_GCT
    for i, fr in enumerate(frames):
        fr = np.asarray(fr, dtype=np.uint8)
        ih, iw = fr.shape
        left, top = (offsets or {}).get(i, (0, 0)) if isinstance(
            offsets, dict) else ((offsets[i] if offsets else (0, 0)))
        tr = (transparent or {}).get(i) if isinstance(
            transparent, dict) else None
        disp = (disposals or {}).get(i, 0) if isinstance(
            disposals, dict) else 0
        if tr is not None or disp:
            gp = (disp << 2) | (1 if tr is not None else 0)
            out += bytes([0x21, 0xF9, 4, gp, 0, 0, tr or 0, 0])
        ipacked = 0x40 if i in interlace else 0
        out += bytes([0x2C]) + struct.pack("<4H", left, top, iw, ih)
        out += bytes([ipacked])
        rows = fr
        if i in interlace:  # write rows in interlace order
            order = [r for start, step in M._GIF_INTERLACE
                     for r in range(start, ih, step)]
            rows = fr[order]
        out += bytes([8]) + _subblocks(lzw_encode(8, rows.tobytes()))
    out += bytes([0x3B])
    return bytes(out)


def _rand(seed, w=32, h=32):
    return np.random.RandomState(seed).randint(0, 256, size=(h, w)).astype(
        np.uint8)


# ---------------------------------------------------------------------------
# decoder unit tests
# ---------------------------------------------------------------------------

def test_lzw_roundtrip_growth_and_kwkwk():
    # repeating data forces the KwKwK (code == len(table)) case and,
    # at this length, several code-width growths
    seq = bytes((b"ab" * 600) + bytes(range(256)) * 4)
    assert bytes(M._gif_lzw(8, lzw_encode(8, seq), len(seq))) == seq
    # truncation is loud
    with pytest.raises(ValueError, match="truncated|early"):
        M._gif_lzw(8, lzw_encode(8, seq)[:10], len(seq))


def test_single_frame_luminance_and_validation():
    fr = _rand(0)
    data = build_gif([fr], 32, 32)
    px = M.gif_pixels(data)
    assert px == [float(v) for v in fr.reshape(-1)]
    with pytest.raises(ValueError, match="not a gif"):
        M.gif_pixels(b"NOPE" + data)


def test_compositing_offsets_transparency_disposal():
    base = _rand(1, 16, 16)
    patch = _rand(2, 4, 4)
    patch[1, 1] = 7  # transparent index in frame 1
    f2 = _rand(3, 16, 16)
    data = build_gif(
        [base, patch, f2], 16, 16, bg=5,
        offsets=[(0, 0), (6, 8), (0, 0)],
        transparent={1: 7},
        disposals={1: 2},  # restore patch rect to background after frame 1
    )
    w, h, frames = M._gif_frames(data)
    assert (w, h, len(frames)) == (16, 16, 3)
    # frame 0: the base image
    assert frames[0] == [float(v) for v in base.reshape(-1)]
    # frame 1: base + patch at (left=6, top=8), transparent pixel shows base
    exp = base.astype(float).copy()
    for r in range(4):
        for c in range(4):
            if patch[r, c] != 7:
                exp[8 + r, 6 + c] = patch[r, c]
    assert frames[1] == [float(v) for v in exp.reshape(-1)]
    # frame 2 drew over a background-restored rect — full replace anyway
    assert frames[2] == [float(v) for v in f2.reshape(-1)]


def test_disposal_previous_restores_canvas():
    base = _rand(4, 8, 8)
    pat = np.full((8, 8), 200, dtype=np.uint8)
    tail = np.zeros((2, 2), dtype=np.uint8)  # tiny frame over restored base
    data = build_gif([base, pat, tail], 8, 8,
                     offsets=[(0, 0), (0, 0), (3, 3)], disposals={1: 3})
    _, _, frames = M._gif_frames(data)
    exp = base.astype(float).copy()
    exp[3:5, 3:5] = 0.0
    assert frames[2] == [float(v) for v in exp.reshape(-1)]


def test_interlaced_frame_matches_progressive():
    fr = _rand(5, 16, 16)
    plain = M._gif_frames(build_gif([fr], 16, 16))[2][0]
    laced = M._gif_frames(build_gif([fr], 16, 16, interlace={0}))[2][0]
    assert plain == laced


def test_frame_sampling_and_short_clips():
    frames = [_rand(10 + i) for i in range(8)]
    out = M.gif_frame_pixels(build_gif(frames, 32, 32), M.VIDEO_FRAMES)
    assert len(out) == M.VIDEO_FRAMES
    # fixed-stride: sampled frames are 0, 2, 4, 6 of 8 (full replaces)
    for a, i in zip(out, (0, 2, 4, 6)):
        assert a == [float(v) for v in frames[i].reshape(-1)]
    short = M.gif_frame_pixels(build_gif(frames[:2], 32, 32), M.VIDEO_FRAMES)
    assert len(short) == M.VIDEO_FRAMES
    assert short[0] == short[1]  # frame 0 repeated


def test_video_framehash_real_gif_stability(spark):
    """Same invariant as the mjpeg e2e: a clip with one perturbed frame
    stays within the >= 3-of-4 aligned-frames near-dup rule; an
    unrelated clip is far on every frame."""
    frames = [_rand(20 + i) for i in range(4)]
    variant = [f.copy() for f in frames]
    variant[2] = ((variant[2].astype(int) + 6) % 256).astype(np.uint8)
    unrelated = [_rand(100 + i) for i in range(4)]

    def row(mid, fs):
        return (mid, "video", build_gif(fs, 32, 32),
                {"format": "gif", "width": 32, "height": 32,
                 "duration_ms": None})

    media = spark.createDataFrame(
        [row(1, frames), row(2, variant), row(3, unrelated)], M.MEDIA_SCHEMA)
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
        for f in range(M.VIDEO_FRAMES))
    close_13 = sum(
        ham(bands[(1, f)], bands[(3, f)]) <= M.AFP_HAM_T
        for f in range(M.VIDEO_FRAMES))
    assert close_12 >= M.VIDEO_MIN_FRAMES
    assert close_13 < M.VIDEO_MIN_FRAMES


def test_lzw_12bit_table_freeze():
    """Random frames past ~4096 distinct patterns cross the 12-bit
    code ceiling: both sides must freeze the table (deferred clear)
    or the stream desyncs — regression for the large-frame case the
    32x32 suites never reach."""
    fr = _rand(42, 128, 128)
    data = build_gif([fr], 128, 128)
    assert M.gif_pixels(data) == [float(v) for v in fr.reshape(-1)]
    seq = bytes(_rand(43, 200, 100).reshape(-1))  # 20k symbols
    assert bytes(M._gif_lzw(8, lzw_encode(8, seq), len(seq))) == seq


def test_extract_features_real_gif(spark):
    """E2e: a real animated GIF lands in the binary media column and
    decodes through the DECODERS registry inside the Arrow
    mapInPandas stage (the png/ppm feature path, GIF member)."""
    frames = [np.full((4, 4), 100, dtype=np.uint8),
              np.full((4, 4), 200, dtype=np.uint8)]
    media = spark.createDataFrame(
        [(1, "video", build_gif(frames, 4, 4),
          {"format": "gif", "width": 4, "height": 4, "duration_ms": None})],
        M.MEDIA_SCHEMA)
    M.register_decoder("gif", M.gif_decode)
    try:
        (row,) = M.extract_features(media, decode="real").collect()
    finally:
        M.DECODERS.clear()
    assert row.feature[:3] == [4.0, 4.0, 2.0]
    assert abs(row.feature[3] - 100.0 / 255.0) < 1e-6  # float32 column
