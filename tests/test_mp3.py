"""MP3 (MPEG audio Layer III) frame-header metadata parser golden
tests — synthesized byte streams with known header fields, per the
public ISO/IEC 11172-3 / 13818-3 frame layout.
"""

from __future__ import annotations

import pytest

from snowalert_spark.functions import multimodal as M


def _frame_v1_l3(kbps_idx: int, sr_idx: int, padding: int = 0, mode: int = 0) -> bytes:
    """One MPEG1 Layer III frame with a zeroed payload."""
    b2 = 0xE0 | (3 << 3) | (1 << 1) | 1  # sync, version=3 (MPEG1), layer=1 (III)
    b3 = (kbps_idx << 4) | (sr_idx << 2) | (padding << 1)
    b4 = mode << 6
    kbps = M._MP3_BITRATES_V1_L3[kbps_idx]
    rate = M._MP3_RATES[3][sr_idx]
    flen = 144 * kbps * 1000 // rate + padding
    return bytes([0xFF, b2, b3, b4]) + b"\x00" * (flen - 4)


def test_mp3_basic_cbr_stream():
    # 3 frames, 128 kbps, 44.1 kHz, stereo
    data = _frame_v1_l3(9, 0) * 3
    n_frames, rate, kbps, ch, dur = M.mp3_parse(data)
    assert (n_frames, rate, kbps, ch) == (3.0, 44100.0, 128.0, 2.0)
    assert dur == pytest.approx(3 * 1152 * 1000 / 44100)


def test_mp3_mono_and_padding():
    data = _frame_v1_l3(9, 0, padding=1, mode=3) + _frame_v1_l3(9, 0, mode=3)
    n_frames, rate, kbps, ch, _ = M.mp3_parse(data)
    assert (n_frames, ch) == (2.0, 1.0)


def test_mp3_id3v2_tag_skipped():
    tag_body = b"\x00" * 130
    # syncsafe size 130 = 0b0000001_0000010
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0x01, 0x02]) + tag_body
    data = tag + _frame_v1_l3(9, 0)
    n_frames, rate, kbps, ch, _ = M.mp3_parse(data)
    assert (n_frames, rate, kbps) == (1.0, 44100.0, 128.0)


def test_mp3_mpeg2_halved_frame():
    # MPEG2 Layer III: version bits 10, 576 samples/frame
    b2 = 0xE0 | (2 << 3) | (1 << 1) | 1
    b3 = (8 << 4) | (0 << 2)  # idx 8 = 64 kbps, 22050 Hz
    flen = 72 * 64 * 1000 // 22050
    frame = bytes([0xFF, b2, b3, 0x00]) + b"\x00" * (flen - 4)
    n_frames, rate, kbps, _, dur = M.mp3_parse(frame)
    assert (n_frames, rate, kbps) == (1.0, 22050.0, 64.0)
    assert dur == pytest.approx(576 * 1000 / 22050)


def test_mp3_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="lost frame sync"):
        M.mp3_parse(b"\x00\x01\x02\x03")
    # Layer I (layer bits 11) is out of scope
    b2 = 0xE0 | (3 << 3) | (3 << 1) | 1
    with pytest.raises(NotImplementedError):
        M.mp3_parse(bytes([0xFF, b2, 0x90, 0x00]) + b"\x00" * 100)
    with pytest.raises(ValueError, match="no MPEG audio frames"):
        M.mp3_parse(b"")


def test_mp3_via_real_decode_path(spark):
    data = _frame_v1_l3(9, 0) * 2
    media = spark.createDataFrame(
        [(1, "audio", bytearray(data), ("mp3", None, None, 60))],
        M.MEDIA_SCHEMA,
    )
    M.register_decoder("mp3", M.mp3_parse)
    try:
        row = M.extract_features(media, decode="real").collect()[0]
    finally:
        M.DECODERS.pop("mp3", None)
    assert row.feature[:4] == [2.0, 44100.0, 128.0, 2.0]
