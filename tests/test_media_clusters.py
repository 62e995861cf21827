"""Cluster-form media near-dup (r10 verdict item 1).

The pair form materializes every member pair — output quadratic in
exact-dup class sizes (the one over-bound sf30 probe row). The cluster
form factors the graph as rep pairs + exact-class star edges and emits
one row per id. These tests pin the contract between the two:

1. closure equality — connected components of the PAIR-form output
   equal the cluster-form labels, per media tier, on the gate corpus;
2. structural — one output row per input id, keep = (id == cluster_id),
   exactly one keeper per cluster, cluster_id = min member id;
3. the member-pair quadratic never happens: a corpus with one huge
   exact-dup class clusters correctly with the engine run over reps
   (pair form would emit C(n,2) rows; cluster form emits n).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from snowalert_spark.functions import dedup as DD
from snowalert_spark.functions import multimodal as M
from snowalert_spark.workload import scalar as S

SF = "/root/testdata/sf0.001"


def _union_find(pairs: list[tuple[int, int]], all_ids: list[int]) -> dict:
    parent = {i: i for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in all_ids}


def _assert_closure_equal(pairs_df, clusters_df, id_col="media_id"):
    got = {
        r[id_col]: (r["cluster_id"], r["keep"]) for r in clusters_df.collect()
    }
    pairs = [(r[id_col], r["dup_of"]) for r in pairs_df.collect()]
    labels = _union_find(pairs, sorted(got))
    assert got, "empty cluster output"
    for i, want in labels.items():
        cid, keep = got[i]
        assert cid == want, f"{id_col}={i}: cluster {cid} != closure {want}"
        assert keep == (i == cid)
    # exactly one keeper per cluster
    keepers = {cid for i, (cid, k) in got.items() if k}
    assert keepers == set(labels.values())


@pytest.mark.parametrize(
    "pair_fn, cluster_fn",
    [
        (S.dedup_image_dhash, S.dedup_image_clusters),
        (S.dedup_audio_fp, S.dedup_audio_clusters),
        (S.dedup_video_framehash, S.dedup_video_clusters),
    ],
    ids=["image", "audio", "video"],
)
def test_cluster_form_equals_pair_closure(spark, pair_fn, cluster_fn):
    _assert_closure_equal(pair_fn(spark, SF), cluster_fn(spark, SF))


def test_cluster_output_is_one_row_per_id(spark):
    fh = M.video_framehash(
        S._video_media_with_variants(spark, SF), decode="fake"
    )
    n_clips = fh.select("media_id").distinct().count()
    out = S.dedup_video_clusters(spark, SF)
    assert out.count() == n_clips
    assert out.select("media_id").distinct().count() == n_clips


def test_generic_cluster_mode_on_huge_exact_class(spark):
    """One 500-member exact-dup class + one near-dup partner + one
    singleton: pair form would emit C(500,2)+500 > 125k rows; cluster
    form emits 502 and labels the whole class + partner as one
    component with the min id keeping."""
    n = 500
    rows = [(i, *[7] * 8) for i in range(n)]  # identical hash
    rows.append((1000, 7, 7, 7, 7, 7, 7, 7, 6))  # hamming 2 partner
    rows.append((2000, 0, 0, 0, 0, 0, 0, 0, 0))  # singleton
    cols = "media_id long, " + ", ".join(f"band_{r} int" for r in range(8))
    df = spark.createDataFrame(rows, cols)
    out = DD.hamming_pairs_multiblock(df, 3, output="clusters").collect()
    got = {r["media_id"]: (r["cluster_id"], r["keep"]) for r in out}
    assert len(got) == n + 2
    for i in range(n):
        assert got[i] == (0, i == 0)
    assert got[1000] == (0, False)
    assert got[2000] == (2000, True)


def test_cluster_mode_rejects_unknown_output(spark):
    df = spark.createDataFrame(
        [(1, *[0] * 8)],
        "media_id long, " + ", ".join(f"band_{r} int" for r in range(8)),
    )
    with pytest.raises(ValueError, match="pairs.*clusters"):
        DD.hamming_pairs_multiblock(df, 3, output="nope").collect()
