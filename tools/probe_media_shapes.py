"""Measure the media multi-block engine's scheduled shapes against
each other on a large corpus — r9 verdict item 3: the (8,5) top tier
was property-tested for output equality at toy sizes but had never
been RUN at scale; "holds past 10^10 rows" was arithmetic, not
measurement.

For each media tier (image dHash, packed video frame hashes) the hash
table is materialized ONCE (localCheckpoint), then the candidate/
verify engine runs per shape — (6,3), the auto pick at sf10 sizes,
and the forced (8,5) top tier — timing the full pair evaluation and
counting candidates. Outputs must be bit-identical across shapes
(count + order-independent xxhash64 checksum): the schedule is a perf
choice, never a semantics one.

Usage: python tools/probe_media_shapes.py SF_DIR OUT.json
e.g.   python tools/probe_media_shapes.py /tmp/sf10 BENCH_r10_media_shapes.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from snowalert_spark.functions import dedup as DD
from snowalert_spark.functions import multimodal as M
from snowalert_spark.session import get_session

SHAPES = [(6, 3), (8, 5)]


def _checksum(pairs):
    row = pairs.agg(
        F.count("*").alias("n"),
        # bit_xor: order-independent and overflow-free (SUM of 2^63-
        # scale hashes trips ANSI long overflow at millions of pairs)
        F.expr("bit_xor(xxhash64(media_id, dup_of, hamming))").alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def probe_tier(spark, name: str, hashed8, threshold: int) -> dict:
    import gc

    bd = F.array(*[F.col(f"band_{r}") for r in range(8)])
    hashed = hashed8.select(
        "media_id", bd.alias("bd")
    ).localCheckpoint()  # identical input to every shape
    out = {"tier": name, "n_hash_rows": hashed.count(), "shapes": {}}
    sums = {}
    for blocks, combo in SHAPES:
        eight = hashed.select(
            "media_id", *[F.col("bd")[r].alias(f"band_{r}") for r in range(8)]
        )
        stats: dict = {}
        t0 = time.perf_counter()
        pairs = DD.hamming_pairs_multiblock(
            eight, threshold, blocks=blocks, combo=combo, stats=stats
        )
        n, h = _checksum(pairs)
        wall = round(time.perf_counter() - t0, 2)
        out["shapes"][f"({blocks},{combo})"] = {
            "wall_s": wall,
            "pairs": n,
            "rep_candidates": stats["candidates"],
        }
        out["n_distinct_hashes"] = stats["n_distinct_hashes"]
        sums[(blocks, combo)] = (n, h)
        # release the run's shuffle files before the next shape: the
        # ContextCleaner frees them when the JVM-side RDDs are GC'd —
        # without this, back-to-back sf10 video runs stack >70 GB of
        # dead spill and fill the disk
        del pairs, eight
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(5)
    vals = set(sums.values())
    out["outputs_identical"] = len(vals) == 1
    assert out["outputs_identical"], f"{name}: shape outputs diverged {sums}"
    return out


def main(sf_dir: str, out_path: str, which: str = "image,video") -> None:
    from snowalert_spark.workload.scalar import (
        _media_with_variants,
        _video_media_with_variants,
    )

    spark = get_session(app_name="probe_media_shapes")
    tiers = []

    if "image" in which:
        img = M.image_dhash(_media_with_variants(spark, sf_dir), decode="fake")
        tiers.append(probe_tier(spark, "image_dhash", img, 3))

    if "video" in which:
        fh = M.video_framehash(
            _video_media_with_variants(spark, sf_dir), decode="fake"
        )
        packed = fh.select(
            (F.col("media_id") * M.VIDEO_FRAMES + F.col("frame_no")).alias(
                "media_id"
            ),
            *[F.col(f"band_{r}") for r in range(8)],
        )
        tiers.append(
            probe_tier(spark, "video_framehash_packed", packed, M.AFP_HAM_T)
        )

    doc = {"sf_dir": sf_dir, "tiers": tiers}
    print(json.dumps(doc))
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main(*sys.argv[1:])
