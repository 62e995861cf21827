"""Round-3 closers: real multimodal decode through the pluggable
decoder registry (tiny real PPM/WAV assets, pure-stdlib decoders) and
the webui-shaped policy rule listing."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from snowalert_spark.functions import multimodal as M
from snowalert_spark.rules import RuleRegistry
from snowalert_spark.runners.policies import list_rules


def _ppm(w, h, rgb):
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(rgb) * (w * h)


def _wav(channels=2, rate=44100, bits=16, samples=8):
    data = b"\x01\x02" * samples * channels
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = (b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                 rate * channels * bits // 8,
                                 channels * bits // 8, bits))
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def _media(spark, rows):
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_real_decode_via_registered_decoders(spark):
    media = _media(spark, [
        (1, "image", _ppm(2, 2, [255, 0, 0]),
         {"format": "ppm", "width": 2, "height": 2, "duration_ms": None}),
        (2, "audio", _wav(channels=1, rate=8000, bits=16, samples=4),
         {"format": "wav", "width": None, "height": None, "duration_ms": 500}),
    ])
    M.register_decoder("ppm", M.ppm_decode)
    M.register_decoder("wav", M.wav_decode)
    try:
        rows = {r.media_id: r for r in
                M.extract_features(media, decode="real").collect()}
    finally:
        M.DECODERS.clear()
    img = rows[1].feature
    assert img[:2] == [2.0, 2.0]                       # dims from the header
    assert img[2] == pytest.approx(1.0) and img[3] == pytest.approx(0.0)
    wav = rows[2].feature
    assert wav == [1.0, 8000.0, 16.0, 8.0]             # ch, rate, bits, bytes
    assert rows[1].n_bytes == len(_ppm(2, 2, [255, 0, 0]))


def test_real_decode_without_decoder_still_raises(spark):
    media = _media(spark, [
        (1, "image", b"\x89PNG", {"format": "png", "width": 1, "height": 1,
                                  "duration_ms": None}),
    ])
    with pytest.raises(Exception, match="no decoder registered"):
        M.extract_features(media, decode="real").collect()


def test_ppm_decoder_rejects_other_formats():
    with pytest.raises(ValueError):
        M.ppm_decode(b"GIF89a")
    with pytest.raises(ValueError):
        M.wav_decode(b"OggS")


def test_policy_listing_shape(spark):
    reg = RuleRegistry()
    reg.create(
        "MFA_ENABLED_POLICY_DEFINITION",
        sql="SELECT 'all users have MFA' AS title, 1=1 AS passing",
        comment="MFA policy\n@id p1",
    )
    reg.create(
        "ROOT_USE_ALERT_QUERY",
        sql="SELECT 1 AS one",
        comment="root use\n@id a1",
    )
    listing = list_rules(spark, reg)
    assert [r["title"] for r in listing] == ["MFA_ENABLED", "ROOT_USE"]
    pol = listing[0]
    assert pol["target"] == "POLICY" and pol["type"] == "DEFINITION"
    assert pol["results"] == [{"title": "all users have MFA", "passing": True}]
    assert "SELECT" in pol["body"]
    alert = listing[1]
    assert alert["target"] == "ALERT" and alert["type"] == "QUERY"
    assert alert["results"] is None

    only_policies = list_rules(spark, reg, rule_type="definition")
    assert [r["title"] for r in only_policies] == ["MFA_ENABLED"]


# ---------------------------------------------------------------------------
# PNG decoder: real zlib-compressed PNGs built by hand (chunk CRCs and
# all five spec filter types), decoded by the pure-stdlib png_decode.
# ---------------------------------------------------------------------------
def _png(w, h, pixel_rows, color=2, filter_types=None):
    """Minimal PNG writer: 8-bit, non-interlaced; encodes each
    scanline with the requested filter type (default 0/None) so the
    decoder's unfiltering paths are exercised against ground truth."""
    import zlib

    ch = {0: 1, 2: 3, 6: 4}[color]
    raw = b""
    prev = bytearray(w * ch)
    for y, row in enumerate(pixel_rows):
        ft = filter_types[y] if filter_types else 0
        line = bytearray(
            v for px in row for v in (px if isinstance(px, tuple) else (px,))
        )
        assert len(line) == w * ch
        enc = bytearray(line)
        if ft == 1:
            for i in range(len(line) - 1, ch - 1, -1):
                enc[i] = (line[i] - line[i - ch]) & 0xFF
        elif ft == 2:
            for i in range(len(line)):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif ft == 3:
            for i in range(len(line)):
                left = line[i - ch] if i >= ch else 0
                enc[i] = (line[i] - (left + prev[i]) // 2) & 0xFF
        elif ft == 4:
            for i in range(len(line)):
                a = line[i - ch] if i >= ch else 0
                b, c = prev[i], (prev[i - ch] if i >= ch else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else b if pb <= pc else c
                enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([ft]) + bytes(enc)
        prev = line

    def chunk(ctype, payload):
        body = ctype + payload
        return (struct.pack(">I", len(payload)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_decode_rgb_golden():
    # 2x2 RGB: red, green / blue, white → means (R,G,B) each (1+255)/4/255
    img = _png(2, 2, [[(255, 0, 0), (0, 255, 0)],
                      [(0, 0, 255), (255, 255, 255)]])
    w, h, r, g, b = M.png_decode(img)
    assert (w, h) == (2.0, 2.0)
    assert r == pytest.approx(510 / 4 / 255)
    assert g == pytest.approx(510 / 4 / 255)
    assert b == pytest.approx(510 / 4 / 255)


def test_png_decode_all_filter_types():
    """The same image encoded with filters None/Sub/Up/Average/Paeth
    must decode to identical channel means."""
    rows = [[(10 * x + 40 * y, 7 * x + 3 * y, 255 - 20 * x)
             for x in range(4)] for y in range(5)]
    baseline = M.png_decode(_png(4, 5, rows))
    for ft in (1, 2, 3, 4):
        got = M.png_decode(_png(4, 5, rows, filter_types=[ft] * 5))
        assert got == pytest.approx(baseline), f"filter {ft}"
    mixed = M.png_decode(_png(4, 5, rows, filter_types=[0, 1, 2, 3, 4]))
    assert mixed == pytest.approx(baseline)


def test_png_decode_greyscale_and_rgba():
    grey = _png(3, 1, [[0, 128, 255]], color=0)
    w, h, m = M.png_decode(grey)
    assert (w, h) == (3.0, 1.0) and m == pytest.approx(383 / 3 / 255)
    rgba = _png(1, 1, [[(255, 0, 0, 128)]], color=6)
    w, h, r, g, b, a = M.png_decode(rgba)
    assert r == pytest.approx(1.0) and a == pytest.approx(128 / 255)


def test_png_decode_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError):
        M.png_decode(b"GIF89a")
    # 16-bit depth is out of scope → honest NotImplementedError
    import zlib

    def chunk(ctype, payload):
        body = ctype + payload
        return (struct.pack(">I", len(payload)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    deep = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)))
    with pytest.raises(NotImplementedError):
        M.png_decode(deep)


def test_png_decode_through_spark_registry(spark):
    """E2e: a real PNG lands in the binary media column and decodes
    through the registry inside the Arrow mapInPandas stage."""
    img = _png(2, 1, [[(255, 0, 0), (0, 0, 255)]])
    media = _media(spark, [
        (1, "image", img,
         {"format": "png", "width": 2, "height": 1, "duration_ms": None}),
    ])
    M.register_decoder("png", M.png_decode)
    try:
        (row,) = M.extract_features(media, decode="real").collect()
    finally:
        M.DECODERS.clear()
    assert row.feature[:2] == [2.0, 1.0]
    assert row.feature[2] == pytest.approx(0.5)  # red mean
    assert row.feature[4] == pytest.approx(0.5)  # blue mean
