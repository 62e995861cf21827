"""Similarity-search operators over ``embeddings``.

Implementations in snowalert_spark.functions.similarity; oracles
replicate the same double-precision left-fold arithmetic in DuckDB
(verified bit-identical), so rankings agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowalert_spark.functions import similarity as S
from snowalert_spark.functions.numeric import quantize, quantize_sql
from snowalert_spark.tables import table

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def _cos_sql(a: str, b: str) -> str:
    return f"{_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"


N_QUERIES = 10  # query set: vec_id < 10
N_CENTROIDS = 8  # IVF coarse centroids: vec_id < 8 (stand-in for kmeans output)


@_q(
    "cosine_topk_bruteforce",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id,
               {quantize_sql(_cos_sql('qv', 'cv'), 6)} AS sim
        FROM c CROSS JOIN q
        WHERE neighbor_id != query_id
    )
    SELECT query_id, neighbor_id, sim
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) <= 5
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < N_QUERIES), k=5
    )


@_q(
    "ann_ivf_topk",
    f"""
    WITH cent AS (SELECT vec_id AS cell, embedding AS cent
                  FROM embeddings WHERE vec_id < {N_CENTROIDS}),
    ascore AS (
        SELECT e.vec_id, cell,
               {quantize_sql(_cos_sql('e.embedding', 'cent'), 6)} AS sim
        FROM embeddings e CROSS JOIN cent
    ),
    assign AS (
        SELECT vec_id, cell FROM ascore
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY sim DESC, cell) = 1
    ),
    q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, a.cell AS qcell
          FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
          WHERE e.vec_id < {N_QUERIES}),
    c AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, a.cell
          FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
    scored AS (
        SELECT query_id, neighbor_id,
               {quantize_sql(_cos_sql('qv', 'cv'), 6)} AS sim
        FROM c JOIN q ON c.cell = q.qcell
        WHERE neighbor_id != query_id
    )
    SELECT query_id, neighbor_id, sim
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) <= 3
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < N_CENTROIDS),
        emb.filter(F.col("vec_id") < N_QUERIES),
        k=3,
    )


SIM_THRESHOLD = 0.35  # data has no planted embedding dups; max cos ≈ 0.51


@_q(
    "dedup_embedding_cosine",
    f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {quantize_sql(_cos_sql('a.embedding', 'b.embedding'), 6)} AS sim
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {quantize_sql(_cos_sql('a.embedding', 'b.embedding'), 6)} >= {SIM_THRESHOLD}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (the 5th dedup tier)."""
    return S.cosine_pairs(table(spark, sf_dir, "embeddings"), SIM_THRESHOLD)


@_q(
    "embedding_label_stats",
    f"""
    SELECT label,
           COUNT(*) AS n,
           {quantize_sql(
               'CAST(SUM(CAST(sqrt(' + _dot_sql('embedding', 'embedding')
               + ') AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*)'
           )} AS avg_norm
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    norm = F.sqrt(S.dot("embedding", "embedding"))
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        quantize(
            F.sum(norm.cast("decimal(25,12)")).cast("double") / F.count("*")
        ).alias("avg_norm"),
    )
