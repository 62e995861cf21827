"""Round-8 advice closures: module-registered PPM decoder, the
decontaminate_semantic degenerate-input contract, exact integer
unpack in the video tier, and the composed (not sliced) BPE encode
oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowalert_spark.functions import multimodal as M
from snowalert_spark.functions import similarity as S


def test_ppm_pixel_decoder_registered_at_import():
    # PARITY claims the PPM luminance decoder ships — it must be in
    # the registry without any test-side registration
    assert M.PIXEL_DECODERS.get("ppm") is M.ppm_pixels
    assert M.SAMPLE_DECODERS.get("wav") is M.wav_samples


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_decontaminate_semantic_empty_eval_keeps_corpus(spark):
    corpus = _emb(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    ev = _emb(spark, []).filter(F.lit(False))
    out = S.decontaminate_semantic(corpus, ev, 0.5).collect()
    assert sorted(r.vec_id for r in out) == [1, 2]
    assert all(r.contaminated is False for r in out)
    assert all(r.max_sim is None and r.nearest_eval_id is None for r in out)


def test_decontaminate_semantic_zero_norm_vectors(spark):
    corpus = _emb(spark, [(1, [0.0, 0.0]), (2, [1.0, 0.0])])
    ev = _emb(spark, [(10, [0.0, 0.0]), (11, [1.0, 0.0])])
    out = {r.vec_id: r for r in S.decontaminate_semantic(corpus, ev, 0.5).collect()}
    # zero-norm corpus vector: no finite cosine anywhere -> kept
    assert out[1].contaminated is False and out[1].max_sim is None
    # zero-norm EVAL vector must not shadow the real witness
    assert out[2].contaminated is True
    assert out[2].nearest_eval_id == 11 and out[2].max_sim == 1.0


def test_bpe_oracle_parts_compose():
    from snowalert_spark.workload.textops import (
        _bpe_oracle_parts,
        _bpe_oracle_sql,
    )

    chain, union = _bpe_oracle_parts(3)
    assert _bpe_oracle_sql(3) == chain + "\n    " + union
    assert chain.startswith("WITH ") and "w4" in chain
    assert union.count("UNION ALL") == 2


def test_video_unpack_is_integer_exact(spark):
    """(clip, frame) pack/unpack round-trips for ids past 2^53 where
    float division loses exactness."""
    big = (1 << 60) + 12345
    k = M.VIDEO_FRAMES
    df = spark.createDataFrame([(big * k + 3,)], "media_id long").select(
        F.expr(f"media_id DIV {k}").alias("clip"),
        (F.col("media_id") % k).alias("frame"),
    )
    r = df.collect()[0]
    assert r.clip == big and r.frame == 3
