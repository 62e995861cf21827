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
