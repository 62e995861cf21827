"""Audio fingerprinting (temporal energy hash) + audio near-dup: unit
math, real 16-bit-PCM WAV path through the Arrow batch stage, and
recall on perceptually-perturbed clips."""

from __future__ import annotations

import struct

import pytest

from snowalert_spark.functions import multimodal as M


def _wav(samples, n_ch=1, rate=8000):
    """16-bit PCM RIFF/WAVE from a flat int sample list."""
    raw = struct.pack(f"<{len(samples)}h", *samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(raw))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16)
        + b"data"
        + struct.pack("<I", len(raw))
        + raw
    )


def _media(spark, rows):
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def _meta(fmt):
    return {"format": fmt, "width": None, "height": None, "duration_ms": None}


def test_wav_samples_roundtrip_and_stereo_average():
    mono = [100, -200, 300, -400]
    assert M.wav_samples(_wav(mono)) == [100.0, -200.0, 300.0, -400.0]
    stereo = [100, 200, -300, -100]  # frames: (100,200), (-300,-100)
    assert M.wav_samples(_wav(stereo, n_ch=2)) == [150.0, -200.0]
    with pytest.raises(ValueError, match="not a wav"):
        M.wav_samples(b"nope")


def test_afp_band_math():
    """Strictly increasing energy gradient -> every second-derivative
    comparison is d[i+1] > d[i] -> all 64 bits set; constant signal ->
    no bit set."""
    rising = [float(i * i) for i in range(M.AFP_WINDOWS)]
    assert M.afp_bands(rising) == [255] * 8
    assert M.afp_bands([5.0] * M.AFP_WINDOWS) == [0] * 8


def test_audio_fp_real_decoder_stability(spark):
    """A mild level blip in a few PCM samples stays within the hamming
    threshold through the REAL decode path; an unrelated waveform is
    far away."""
    base = [int(600 * (((i * 37) % 97) - 48)) for i in range(660)]
    blip = list(base)
    for j in range(110, 113):
        blip[j] += 40
    unrelated = [int(300 * (((i * 61) % 89) - 44)) for i in range(660)]
    rows = [
        (1, "audio", _wav(base), _meta("wav")),
        (2, "audio", _wav(blip), _meta("wav")),
        (3, "audio", _wav(unrelated), _meta("wav")),
    ]
    out = {
        r["media_id"]: [r[f"band_{i}"] for i in range(8)]
        for r in M.audio_fingerprint(_media(spark, rows), decode="real").collect()
    }

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    assert ham(out[1], out[2]) <= M.AFP_HAM_T
    assert ham(out[1], out[3]) > 10


def test_audio_fp_real_requires_decoder(spark):
    rows = [(1, "audio", b"\x00" * 16, _meta("mystery"))]
    with pytest.raises(Exception, match="no sample decoder registered"):
        M.audio_fingerprint(_media(spark, rows), decode="real").collect()


def test_dedup_audio_fp_recall(spark):
    """Every planted variant (17 at sf0.01: audio docs with
    doc_id % 30 == 1) is recovered as exactly one pair with its
    source, and no chance band collision survives the verify."""
    from snowalert_spark import workload

    df = workload.queries(include_local=True)["dedup_audio_fp"](
        spark, "/root/testdata/sf0.01"
    )
    rows = df.collect()
    assert len(rows) == 17
    assert all(
        r.dup_of == r.media_id + 1000000 and r.hamming <= M.AFP_HAM_T
        for r in rows
    )


def test_dedup_video_framehash_recall(spark):
    """Every planted video variant (17 at sf0.01) is recovered; the
    3 untouched frames guarantee recall even if the perturbed frame
    drifts past the threshold."""
    from snowalert_spark import workload

    rows = workload.queries(include_local=True)["dedup_video_framehash"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    planted = [r for r in rows if r.dup_of == r.media_id + 1000000]
    assert len(planted) == 17
    assert all(r.n_frames_close >= 3 for r in rows)


def test_video_framehash_real_requires_decoder(spark):
    from snowalert_spark.functions import multimodal as M

    rows = [(1, "video", b"\x00" * 64, _meta("mystery"))]
    with pytest.raises(Exception, match="no frame decoder registered"):
        M.video_framehash(_media(spark, rows), decode="real").collect()
