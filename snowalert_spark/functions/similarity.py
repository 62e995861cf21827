"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- brute-force cosine top-k: broadcast the (small) query set, one
  linear scan over the corpus, per-partition top-k via window. At
  100 TB this is the exact baseline — no shuffle of the corpus, only
  the broadcast + final top-k reduction.
- IVF (inverted-file) top-k: assign every vector to its nearest
  coarse centroid (broadcast centroids), then search only the query's
  own cell. The scale path: cell assignment is one broadcast-join
  scan; the search join is equi on cell id, pruning the candidate set
  by ~n_cells×.

All arithmetic is pinned to double-precision left-fold dot products so
results are bit-identical to the DuckDB oracle (verified), and
rankings use engine-stable quantized similarities with vec_id
tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from snowalert_spark.functions.numeric import quantize

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def dot(a: str, b: str) -> Column:
    """Left-fold double dot product (bit-stable across engines)."""
    return F.expr(DOT.format(a=a, b=b))


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (
        F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query over the corpus.

    Returns (query_id, neighbor_id, sim) with sim quantized to 6
    digits; ranking on (quantized sim DESC, neighbor_id) is fully
    deterministic."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(dot(vec_col, vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(dot(vec_col, vec_col)).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            quantize(dot("qv", "cv") / (F.col("qn") * F.col("cn")), 6).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def cosine_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: all (a < b) with quantized
    cosine ≥ threshold. Exact all-pairs baseline (the corpus side is
    broadcast when small); the pruned path at corpus scale is IVF cell
    co-membership (``ivf_assign`` + same-cell pair join) or
    random-hyperplane LSH, both trading recall for candidates.

    Self-norms are precomputed per vector (N folds) instead of per
    pair (2·N² folds) — sqrt(dot(v,v)) yields the identical double
    either way, so oracle equality is unaffected."""
    a = corpus.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("va"),
        F.sqrt(dot(vec_col, vec_col)).alias("na"),
    )
    b = corpus.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("vb"),
        F.sqrt(dot(vec_col, vec_col)).alias("nb"),
    )
    sim = quantize(dot("va", "vb") / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell): nearest-centroid assignment by max cosine
    (tiebreak: smaller centroid id). Centroids are broadcast."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    cent = centroids.select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("cent")
    )
    scored = c.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cell", quantize(cosine("v", "cent"), 6).alias("sim")
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )


def ivf_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k searching only the query's own IVF cell (nprobe=1)."""
    assign = ivf_assign(corpus, centroids, id_col, vec_col)
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .join(assign.withColumnRenamed("vec_id", "query_id"), "query_id")
        .withColumnRenamed("cell", "qcell")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).join(
        assign.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
    )
    scored = (
        c.join(F.broadcast(q), F.col("cell") == F.col("qcell"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", quantize(cosine("qv", "cv"), 6).alias("sim")
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )
