"""Scale the driver's sf0.1 testdata 10x to an sf1-equivalent dir.

Bench-only data (correctness runs against the driver's own sf0.01 +
DuckDB oracle): each fact/dim replica shifts its primary keys by
replica*stride so foreign keys stay consistent (orders.o_custkey ->
customer, lineitem.l_orderkey/l_partkey/l_suppkey -> their parents),
giving ~6M lineitem rows with realistic key cardinality growth.
region/nation stay fixed (real dimension tables don't scale with
volume). Document text is per-replica character-permuted and
embeddings per-replica perturbed so the dedup/similarity benchmarks
don't degenerate into 10x exact duplicates.

Usage: python tools/make_sf1.py [dst_dir] [replicas]
       (defaults: /tmp/sf1 10; e.g. `tools/make_sf1.py /tmp/sf10 100`
       builds the sf10-equivalent: 60M lineitem, 10M events)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from snowalert_spark.session import get_session
from snowalert_spark.tables import TABLES, table

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# per-replica character permutation: two independent 10-letter
# consonant rotations compose to 100 distinct permutations, and a
# third 5-vowel rotation (engaged from replica 100 up) extends the
# scheme to 500 — so document text stays distinct per replica through
# sf50 and the dedup/curation family can ride the sf30 probes without
# degenerating into exact cross-replica triplicates (round-7 README
# note / verdict item 5). Replica 0 is the identity (the original
# corpus is a subset); i < 100 leaves vowels untouched, so sf1/sf10
# outputs are byte-identical to the previous scheme.
_ALPHA = "bcdfghjklm"
_ALPHA2 = "npqrstvwxz"
_ALPHA3 = "aeiou"


def _perm_cols(i: int) -> tuple[str, str, str, str, str, str]:
    a1 = _ALPHA[i % 10:] + _ALPHA[: i % 10]
    a2 = _ALPHA2[(i // 10) % 10:] + _ALPHA2[: (i // 10) % 10]
    a3 = _ALPHA3[(i // 100) % 5:] + _ALPHA3[: (i // 100) % 5]
    return _ALPHA, a1, _ALPHA2, a2, _ALPHA3, a3


def _stride(df, key):
    return df.agg(F.max(key)).collect()[0][0] + 1


def main(dst: str = "/tmp/sf1", replicas: int | str = REPLICAS) -> None:
    replicas = int(replicas)
    # micros output keeps footers identical in type to the driver's
    # own parquet (no INT96 ambiguity in the normalization probe)
    spark = get_session(
        app_name="make_sf1",
        extra_conf={"spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS"},
    )
    os.makedirs(dst, exist_ok=True)

    src = {name: table(spark, SRC, name) for name in TABLES}
    strides = {
        "customer": _stride(src["customer"], "c_custkey"),
        "supplier": _stride(src["supplier"], "s_suppkey"),
        "part": _stride(src["part"], "p_partkey"),
        "orders": _stride(src["orders"], "o_orderkey"),
        "events": _stride(src["events"], "event_id"),
        "documents": _stride(src["documents"], "doc_id"),
        "embeddings": _stride(src["embeddings"], "vec_id"),
    }

    def replicate(name, shift_cols, extra=None):
        parts = []
        for i in range(replicas):
            df = src[name]
            for col, stride in shift_cols:
                df = df.withColumn(col, F.col(col) + F.lit(i * stride))
            if extra is not None:
                df = extra(df, i)
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.coalesce(max(8, replicas // 4)).write.mode("overwrite").parquet(
            f"{dst}/_{name}"
        )
        # single-file layout like the driver's (dir-of-parts also reads
        # fine through tables.table, but keep paths uniform); clear a
        # previous run's output first (os.replace can't rename onto a
        # non-empty dir)
        shutil.rmtree(f"{dst}/{name}.parquet", ignore_errors=True)
        os.replace(f"{dst}/_{name}", f"{dst}/{name}.parquet")

    for name in ("region", "nation"):
        src[name].write.mode("overwrite").parquet(f"{dst}/_{name}")
        shutil.rmtree(f"{dst}/{name}.parquet", ignore_errors=True)
        os.replace(f"{dst}/_{name}", f"{dst}/{name}.parquet")

    replicate("customer", [("c_custkey", strides["customer"])])
    replicate("supplier", [("s_suppkey", strides["supplier"])])
    replicate("part", [("p_partkey", strides["part"])])
    replicate("orders", [("o_orderkey", strides["orders"]),
                         ("o_custkey", strides["customer"])])
    replicate("lineitem", [("l_orderkey", strides["orders"]),
                           ("l_partkey", strides["part"]),
                           ("l_suppkey", strides["supplier"])])
    replicate("events", [("event_id", strides["events"])])
    def permute_text(df, i):
        s1, a1, s2, a2, s3, a3 = _perm_cols(i)
        return df.withColumn(
            "text",
            F.translate(F.translate(F.translate("text", s1, a1), s2, a2), s3, a3),
        )

    replicate(
        "documents",
        [("doc_id", strides["documents"])],
        extra=permute_text,
    )
    def perturb_embedding(df, i):
        # Within a group of 10 replicas: tiny dim-0 shift (near-dup
        # cluster, like sf1). Across groups: cyclic coordinate rotation
        # by i//10 — a rotated random unit vector is ~orthogonal to the
        # original, so near-dup cluster size stays ≤ 10 replicas and
        # the number of genuine near-dup pairs grows LINEARLY with
        # corpus size (real 10x data has 10x the dup clusters, not
        # 100 mutually-similar copies of everything). i < 10 → identity
        # rotation, so sf1 output is unchanged.
        k, g = i % 10, i // 10
        return df.withColumn(
            "embedding",
            F.expr(
                f"transform(embedding, (x, j) -> CASE WHEN j = 0 "
                f"THEN CAST(element_at(embedding, "
                f"(int(j) + {g}) % size(embedding) + 1) + {k} * 0.013 "
                f"AS FLOAT) ELSE CAST(element_at(embedding, "
                f"(int(j) + {g}) % size(embedding) + 1) AS FLOAT) END)"
            ),
        )

    replicate(
        "embeddings",
        [("vec_id", strides["embeddings"])],
        extra=perturb_embedding,
    )

    for name in TABLES:
        n = spark.read.parquet(f"{dst}/{name}.parquet").count()
        print(f"{name}: {n}")


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
