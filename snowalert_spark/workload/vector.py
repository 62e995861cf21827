"""Similarity-search operators over ``embeddings``.

Implementations in snowalert_spark.functions.similarity; oracles
replicate the same double-precision left-fold arithmetic in DuckDB
(verified bit-identical), so rankings agree exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowalert_spark.functions import similarity as S
from snowalert_spark.functions.numeric import quantize, quantize_sql
from snowalert_spark.tables import spread, table

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table, spread by vec_id (tables.spread): every
    operator here runs heavy per-row array arithmetic (codebook
    argmax, cosine folds, PQ coding) straight off the scan, and the
    driver's single-row-group parquet would serialize all of it onto
    one core. No-op at cluster scale (many-split scans)."""
    return spread(table(spark, sf_dir, "embeddings"), "vec_id")


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def _cos_sql(a: str, b: str) -> str:
    return f"{_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"


N_QUERIES = 10  # query set: vec_id < 10
N_CENTROIDS = 8  # IVF coarse centroids: k for kmeans_fit
TRAIN_N = 64  # kmeans training sample: vec_id < 64 (bounded, deterministic)
KMEANS_ITERS = 2
NPROBE_DEDUP = 2  # multi-probe factor for the near-dup candidate join


def _kmeans_ctes(
    k: int = N_CENTROIDS,
    train_n: int = TRAIN_N,
    iters: int = KMEANS_ITERS,
    vec_expr: str = "embedding",
    p: str = "",
    src: str = "embeddings",
    id_col: str = "vec_id",
) -> str:
    """DuckDB CTE chain replaying kmeans_fit bit-for-bit: ``ktrain``,
    ``c0`` … ``c{iters}`` (final centroids in ``c{iters}(cell, cent)``).
    Unrolled Lloyd rounds — assignment by quantized cosine with
    smaller-cell tiebreak, per-dim DECIMAL(25,12)-exact means, empty
    cells keep their previous centroid — matching
    functions/similarity.py kmeans_fit step for step. ``vec_expr``
    selects the trained vector (a subvector slice for PQ); ``p``
    prefixes every CTE name so several chains coexist in one query;
    ``src``/``id_col`` retarget the trainer at any (id, vector) frame
    (e.g. a hashed-TF feature CTE over ``documents``) — the id is
    normalized to ``vec_id`` inside the chain so the unrolled rounds
    stay identical."""
    ctes = [
        f"{p}ktrain AS (SELECT {id_col} AS vec_id, {vec_expr} AS v"
        f" FROM {src} WHERE {id_col} < {train_n})",
        f"""{p}c0 AS (SELECT CAST(vec_id AS INT) AS cell,
                      list_transform(v, x -> CAST(x AS DOUBLE)) AS cent
               FROM {p}ktrain WHERE vec_id < {k})""",
    ]
    for i in range(1, iters + 1):
        prev, a, m = f"{p}c{i-1}", f"{p}ka{i}", f"{p}km{i}"
        ctes.append(
            f"""{a} AS (
            SELECT vec_id, cell FROM (
                SELECT t.vec_id, c.cell,
                       {quantize_sql(_cos_sql('t.v', 'c.cent'), 6)} AS sim
                FROM {p}ktrain t CROSS JOIN {prev} c)
            QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY sim DESC, cell) = 1)"""
        )
        ctes.append(
            f"""{m} AS (
            SELECT cell, dim,
                   CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(25,12))) AS DOUBLE)
                     / COUNT(*) AS m
            FROM (SELECT a.cell,
                         unnest(generate_series(1, len(t.v))) AS dim,
                         unnest(t.v) AS x
                  FROM {p}ktrain t JOIN {a} a USING (vec_id))
            GROUP BY cell, dim)"""
        )
        ctes.append(
            f"""{p}c{i} AS (
            SELECT c.cell, COALESCE(n.cent, c.cent) AS cent
            FROM {prev} c
            LEFT JOIN (SELECT cell, list(m ORDER BY dim) AS cent
                       FROM {m} GROUP BY cell) n USING (cell))"""
        )
    return ",\n".join(ctes)


KMEANS_FINAL = f"c{KMEANS_ITERS}"


def _centroids(spark: SparkSession, sf_dir: str, emb: DataFrame) -> DataFrame:
    """Train-once IVF centroids for this corpus version (= sf_dir)."""
    return S.trained_centroids(
        spark,
        sf_dir,
        emb.filter(F.col("vec_id") < TRAIN_N),
        k=N_CENTROIDS,
        iters=KMEANS_ITERS,
    )


@_q(
    "kmeans_centroids",
    f"""
    WITH {_kmeans_ctes()}
    SELECT cell,
           array_to_string(
               list_transform(cent,
                   x -> CAST(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR)),
               ',') AS cent_q
    FROM {KMEANS_FINAL}
    """,
)
def kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-means trainer as its own oracle-checked query — keeps the
    trainer covered now that the IVF queries consume cached centroids.
    The centroid is emitted as a canonical comma-joined string of
    integer micro-units (floor(x·1e6 + 0.5), the same IEEE rounding as
    the scalar quantize()): integers stringify identically in Spark and
    DuckDB, and the driver's pandas canonicalizer can sort/hash strings
    where bare array<double> cells raised ``unhashable type: 'list'``
    (CORRECTNESS_r07). Bit-exactness per value is preserved — two
    centroids agree iff every micro-unit integer agrees."""
    emb = _emb(spark, sf_dir)
    cents = S.kmeans_fit(
        emb.filter(F.col("vec_id") < TRAIN_N), k=N_CENTROIDS, iters=KMEANS_ITERS
    )
    return cents.select(
        "cell",
        F.expr(
            "array_join(transform(cent, "
            "x -> cast(cast(floor(x * 1000000.0D + 0.5D) as bigint) as string)), ',')"
        ).alias("cent_q"),
    )


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
    emb = _emb(spark, sf_dir)
    return S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < N_QUERIES), k=5
    )


@_q(
    "ann_ivf_topk",
    f"""
    WITH {_kmeans_ctes()},
    cent AS (SELECT cell, cent FROM {KMEANS_FINAL}),
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
    """IVF ANN search consuming *pre-trained* centroids: training runs
    once per corpus version (S.trained_centroids) and the query itself
    is assign + equi-join on cell — the production split. The oracle
    still replays the full trainer so correctness covers it."""
    emb = _emb(spark, sf_dir)
    cents = _centroids(spark, sf_dir, emb)
    return S.ivf_topk(
        emb,
        cents.select(
            F.col("cell").alias("vec_id"), F.col("cent").alias("embedding")
        ),
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
    """Embedding-cosine near-dup pairs, exact all-pairs form — the
    *verification baseline* for dedup_embedding_ivf (recall is
    measured against this in tests/test_oracle_vectors.py); the scale
    path is the IVF-pruned variant below."""
    return S.cosine_pairs(_emb(spark, sf_dir), SIM_THRESHOLD)


@_q(
    "dedup_embedding_ivf",
    f"""
    WITH {_kmeans_ctes()},
    assign AS (
        SELECT vec_id, cell FROM (
            SELECT e.vec_id, c.cell,
                   {quantize_sql(_cos_sql('e.embedding', 'c.cent'), 6)} AS sim
            FROM embeddings e CROSS JOIN {KMEANS_FINAL} c)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY sim DESC, cell) <= {NPROBE_DEDUP}),
    cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM assign a JOIN assign b
          ON a.cell = b.cell AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b,
           {quantize_sql(_cos_sql('ea.embedding', 'eb.embedding'), 6)} AS sim
    FROM cand
    JOIN embeddings ea ON vec_a = ea.vec_id
    JOIN embeddings eb ON vec_b = eb.vec_id
    WHERE {quantize_sql(_cos_sql('ea.embedding', 'eb.embedding'), 6)} >= {SIM_THRESHOLD}
    """,
)
def dedup_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe embedding near-dup tier: k-means-trained IVF cells →
    multi-probe co-membership equi-join (candidates) → exact cosine
    verification. No all-pairs product anywhere in the plan (pinned by
    tests/test_plans.py); the same candidate/verify split as
    MinHash-LSH."""
    emb = _emb(spark, sf_dir)
    cents = _centroids(spark, sf_dir, emb)
    return S.cosine_pairs_ivf(
        emb,
        cents.select(
            F.col("cell").alias("vec_id"), F.col("cent").alias("embedding")
        ),
        SIM_THRESHOLD,
        nprobe=NPROBE_DEDUP,
    )


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
    emb = _emb(spark, sf_dir)
    norm = F.sqrt(S.dot("embedding", "embedding"))
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        quantize(
            F.sum(norm.cast("decimal(25,12)")).cast("double") / F.count("*")
        ).alias("avg_norm"),
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH near-dup tier (the second scale path next to
# IVF): deterministic hyperplanes from a multiplicative hash, sign-bit
# signatures banded into equi-join buckets, exact verify of candidates.
# The oracle rebuilds the identical plane arithmetic in DuckDB, so
# signature bits — and therefore candidates — agree bit-for-bit.
# ---------------------------------------------------------------------------
RP_DIM = 64        # embeddings.embedding dimensionality (testdata)
# 16-bit bands: random (near-orthogonal) pairs collide per band with
# probability ~2^-16, so background candidate volume stays ~linear up
# to 2^16-vector corpora (12-bit bands produced ~20M random candidates
# — tens of GB of verify shuffle — at the 200k-vector sf10 bench).
# 6 bands keep genuine near-dup recall high (≈0.98 at sim 0.99).
# These constants are the n <= 2^16 point of the corpus-size-aware
# schedule `similarity.rplsh_params_for_corpus` (bits grows with
# log2(n) to hold bucket occupancy O(1), bands grows to hold recall)
# — the static oracle SQL below replays exactly this shape, and the
# driver-gate corpus (sf0.01, 2k vectors) is always inside it; larger
# bench corpora (sf10: 200k -> 18-bit/7-band, sf30: 600k ->
# 20-bit/7-band) get wider bands so candidates stay O(n).
RP_PLANES = 96
RP_BANDS = 6


def _rp_band_sql(b: int, bits_per: int = RP_PLANES // RP_BANDS,
                 dim: int = RP_DIM) -> str:
    """DuckDB replica of the Spark-side signature arithmetic in
    ``similarity.rp_plane`` / ``similarity.cosine_pairs_rplsh`` (the
    sig_batches k-loop) for band ``b``: identical hyperplane values
    and left folds, so signature bits agree bit-for-bit."""
    def dot_sql(i: int) -> str:
        # plane component: top 32 bits of md5(str(plane_index*dim+k-1))
        # — DuckDB's md5 of the decimal string matches Python's
        # hashlib.md5 in similarity.rp_plane exactly
        return (
            f"list_reduce(list_transform(range(1, {dim} + 1), "
            f"k -> CAST(embedding[k] AS DOUBLE) * "
            f"(CAST(('0x' || substr(md5(CAST(({b} * {bits_per} + {i}) * {dim} "
            f"+ (k - 1) AS VARCHAR)), 1, 8)) AS UBIGINT) "
            f"/ 4294967296.0 - 0.5)), (x, y) -> x + y)"
        )

    return " + ".join(
        f"(CASE WHEN {dot_sql(i)} > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits_per)
    )


@_q(
    "dedup_embedding_rplsh",
    f"""
    WITH sig AS (
        SELECT vec_id, embedding,
               {", ".join(f"{_rp_band_sql(b)} AS band{b}" for b in range(RP_BANDS))}
        FROM embeddings
    ),
    long AS (
        {" UNION ALL ".join(
            f"SELECT vec_id, {b} AS b, band{b} AS h FROM sig"
            for b in range(RP_BANDS))}
    ),
    cand AS (
        SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b
        FROM long l JOIN long r ON l.b = r.b AND l.h = r.h
                               AND l.vec_id < r.vec_id
    )
    SELECT vec_a, vec_b, sim FROM (
        SELECT vec_a, vec_b,
               {quantize_sql(_cos_sql('a.embedding', 'b.embedding'), 6)} AS sim
        FROM cand
        JOIN embeddings a ON a.vec_id = vec_a
        JOIN embeddings b ON b.vec_id = vec_b
    ) WHERE sim >= {SIM_THRESHOLD}
    """,
)
def dedup_embedding_rplsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-tier embedding near-dup: banded sign-bit signatures over
    deterministic hyperplanes → bucket equi-join candidates → exact
    cosine verify. No all-pairs product (plan-pinned); candidates ⊆
    the exact cosine_pairs result by construction.

    Band parameters follow ``rplsh_params_for_corpus`` — bits per band
    grow with log2(corpus) so candidate volume stays O(n) (the fixed
    16-bit shape ran 6.4x on 3x data at the sf30 probe). At gate scale
    (n <= 2^16) the schedule returns exactly (RP_PLANES, RP_BANDS),
    the shape the static oracle SQL replays bit-for-bit; the count()
    that sizes the corpus is a parquet-metadata aggregate."""
    # plain table, no spread: this operator's wall is the EAGER
    # connected-components phase (driver union-find over the verified
    # pair graph) — dozens of small jobs where 32-way repartition of a
    # few thousand rows only adds task overhead (measured 2.6 -> 7.4 s
    # at sf0.1 with the spread; the per-row signature arithmetic is
    # not the bottleneck here)
    emb = table(spark, sf_dir, "embeddings")
    n_planes, bands = S.rplsh_params_for_corpus(emb.count())
    return S.cosine_pairs_rplsh(
        emb, SIM_THRESHOLD, n_planes=n_planes, bands=bands, dim=RP_DIM
    )


# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup: Data-
# efficient learning at web-scale through semantic deduplication",
# arXiv:2303.09540): cluster the embedding space with k-means, call two
# documents semantic duplicates when their cosine similarity inside a
# shared cluster exceeds eps, and keep ONE representative per duplicate
# group — the paper's policy keeps the example with the LOWEST cosine
# to its cluster centroid (the most atypical member preserves the most
# information). Composes the engine's existing primitives: trained
# centroid cache -> broadcast cell assignment -> within-cell
# candidate/verify pairs (never all-pairs) -> distributed connected
# components -> windowed keeper pick.
# ---------------------------------------------------------------------------


# Corpora up to this size keep the oracle-pinned (k=8, train_n=64)
# shape. The ceiling was 2^16 through r8 — but the oracle only ever
# compares at the gate SFs (sf0.01 = 2k vectors), and holding k=8 to
# 65k vectors made the within-cell verify the sf1 probe's worst row
# (10.8x on 10x data: n*cell/2 = 25M cosines at 20k vectors). 2^14
# keeps every oracle-compared corpus on the pinned shape while sf0.1+
# rides the cell-size schedule.
SEM_GATE_N = 1 << 14
SEM_TARGET_CELL = 1024  # expected cell size past the gate shape
#: codebooks at or below this k ride the plan as literals (the
#: zero-shuffle argmax projection); larger k broadcasts the codebook
#: and takes the min-struct aggregate. Same answers either way —
#: pinned by test_vectors' branch-equality test, which forces the
#: broadcast branch at gate k.
SEM_LITERAL_K_MAX = 64


def semantic_kmeans_params(n: int) -> tuple[int, int]:
    """Corpus-size-aware k-means shape for SemDeDup (the same policy
    :func:`~snowalert_spark.functions.similarity.rplsh_params_for_corpus`
    applies to LSH bands): the driver-gate corpora (n <= 2^14,
    covering every oracle-compared SF) keep EXACTLY the static
    oracle-pinned (k=8, train_n=64); past that, k grows with n so the
    expected cell size stays ~SEM_TARGET_CELL — a fixed k makes the
    within-cell candidate/verify step quadratic in the corpus
    (n^2/k pairs), which is the scale killer the r6 fixed-band LSH
    had. k ≈ n/1024 also balances assignment cost (n·k cosines)
    against verify cost (n·cell/2), which meet at k ≈ sqrt(n/2).
    train_n = 8k keeps the Lloyd sample ≥ k seed vectors and bounded.
    """
    if n <= SEM_GATE_N:
        return N_CENTROIDS, TRAIN_N
    k = min(4096, max(N_CENTROIDS, int(n) // SEM_TARGET_CELL))
    return k, 8 * k


@_q(
    "semantic_dedup",
    f"""
    WITH RECURSIVE {_kmeans_ctes()},
    asim AS (
        SELECT vec_id, cell, sim FROM (
            SELECT e.vec_id, c.cell,
                   {quantize_sql(_cos_sql('e.embedding', 'c.cent'), 6)} AS sim
            FROM embeddings e CROSS JOIN {KMEANS_FINAL} c)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY sim DESC, cell) = 1),
    cand AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM asim a JOIN asim b
          ON a.cell = b.cell AND a.vec_id < b.vec_id),
    pairs AS (
        SELECT vec_a, vec_b
        FROM cand
        JOIN embeddings ea ON vec_a = ea.vec_id
        JOIN embeddings eb ON vec_b = eb.vec_id
        WHERE {quantize_sql(_cos_sql('ea.embedding', 'eb.embedding'), 6)}
              >= {SIM_THRESHOLD}),
    edges(a, b) AS (
        SELECT vec_a, vec_b FROM pairs
        UNION SELECT vec_b, vec_a FROM pairs),
    reach(node, lab) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node),
    lab AS (SELECT node AS vec_id, CAST(MIN(lab) AS BIGINT) AS group_id
            FROM reach GROUP BY node),
    sz AS (SELECT group_id, COUNT(*) AS group_size FROM lab GROUP BY group_id)
    SELECT l.vec_id, a.cell, l.group_id, sz.group_size, a.sim AS cent_sim,
           ROW_NUMBER() OVER (PARTITION BY l.group_id
                              ORDER BY a.sim, l.vec_id) = 1 AS keep
    FROM lab l JOIN sz USING (group_id) JOIN asim a USING (vec_id)
    """,
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication: k-means cells → within-cell
    cosine pairs at eps (candidate/verify equi-join, no all-pairs
    product) → connected components over the duplicate graph → keep
    the group member with the lowest centroid similarity (ties by
    vec_id). Returns every vector with its cell, duplicate group,
    group size, centroid similarity, and the keep decision.

    100 TB shape: k follows the corpus-size schedule
    (:func:`semantic_kmeans_params` — gate corpora keep the
    oracle-pinned k=8; larger corpora bound cells at ~1024 so the
    within-cell verify stays O(n·cell), never O(n²/8)). At gate shape
    the cell AND the centroid similarity come from ONE zero-shuffle
    literal-codebook argmax projection (the same trick as the PQ
    coder); at scheduled shape the codebook broadcasts and a
    map-side-combining min-struct aggregate exchanges only n rows.
    The remaining corpus-sized exchanges are the cell equi-join on
    candidate ids, the O(diameter) component rounds over the pair
    list (near-clique groups → a handful), and one hash partition by
    group_id for the keeper window."""
    from pyspark.sql import Window

    from snowalert_spark.functions import dedup as DD

    # plain table here; the scheduled assignment branch below applies
    # keyed spread itself (r13 measured whole-query spread harmful at
    # 4.4 -> 7.1 s, but that predated the CC driver path — r14
    # re-measured the assignment-only spread as a ~2x win on that job)
    emb = table(spark, sf_dir, "embeddings")
    k, train_n = semantic_kmeans_params(emb.count())
    cents_rows = S.trained_centroid_rows(
        spark, sf_dir, emb.filter(F.col("vec_id") < train_n),
        k=k, iters=KMEANS_ITERS,
    )
    if k <= SEM_LITERAL_K_MAX:
        # gate shape: literal-codebook argmax — zero-shuffle projection
        arr = S._cell_nsim_arr_sql(cents_rows, "embedding")
        asim = emb.select(
            "vec_id",
            F.expr(f"element_at(array_sort({arr}), 1)").alias("best"),
        ).select(
            "vec_id",
            F.col("best.cell").alias("cell"),
            (-F.col("best.nsim")).alias("cent_sim"),
        )
    else:
        # scheduled shape: k too large for plan literals — broadcast
        # the codebook and take the per-vector min struct with a
        # map-side-combining aggregate (same (sim DESC, cell ASC)
        # order; one n-row exchange, never n×k). Norms are hoisted
        # out of the n×k fold (r14): the centroid norm ships on the
        # broadcast row (Python-side left fold — bit-identical to the
        # engine's sqrt(dot(cent,cent)), same argument as
        # S._codebook_lit_sql) and the vector's self-norm is computed
        # once per row instead of once per (row, cell) — 3 folds/pair
        # → 1, values unchanged (same doubles, same (nrm * nl)
        # denominator order as S.cosine).
        def _nl(vals) -> float:
            acc = 0.0
            for x in vals:
                acc += float(x) * float(x)
            return math.sqrt(acc)

        cent_df = spark.createDataFrame(
            [(c, [float(x) for x in v], _nl(v)) for c, v in cents_rows],
            "cell int, cent array<double>, nl double",
        )
        # spread the n×k assignment scan (r14 re-measure: with the CC
        # driver path + hoisted norms the r13 "spread hurts here"
        # verdict no longer holds — the fold was serialized on the
        # single-file scan task; keyed spread halved the assignment
        # job at sf0.1 AND sf1, and is a no-op on many-split scans)
        scored = spread(emb, "vec_id").select(
            "vec_id",
            "embedding",
            F.sqrt(S.dot("embedding", "embedding")).alias("nrm"),
        ).crossJoin(F.broadcast(cent_df)).select(
            "vec_id",
            F.struct(
                (
                    -quantize(
                        S.dot("embedding", "cent")
                        / (F.col("nrm") * F.col("nl")),
                        6,
                    )
                ).alias("nsim"),
                F.col("cell").alias("cell"),
            ).alias("sc"),
        )
        asim = (
            scored.groupBy("vec_id")
            .agg(F.min("sc").alias("best"))
            .select(
                "vec_id",
                F.col("best.cell").alias("cell"),
                (-F.col("best.nsim")).alias("cent_sim"),
            )
            # n small rows, consumed by THREE branches (both pair
            # sides + the keeper join): materialize once instead of
            # re-running the n×k assignment scan per branch
            .localCheckpoint()
        )
    # candidate verify with O(n) shuffle: ship each VECTOR to its cell
    # once per side and let the within-cell pairs materialize inside
    # the equi-join, filtered to ids immediately — never exchange a
    # pair-level row carrying arrays (the ids-then-join-back form
    # shuffled |pairs| vector rows ≈ n·cell/2, which is what timed out
    # at sf10). The salt splits each cell's pair block SALT ways so a
    # big cell's quadratic work spreads across tasks: the a-side
    # replicates per salt value, the b-side lands on its hash salt, so
    # every (a, b) pair meets exactly once.
    SALT = 8
    emb_n = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(S.dot("embedding", "embedding")).alias("nrm"),
    )
    sided = asim.select("vec_id", "cell").join(emb_n, "vec_id")
    a = sided.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
        "cell",
    ).withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1))))
    b = sided.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
        "cell",
    ).withColumn(
        "r", F.pmod(F.xxhash64(F.col("vec_b")), F.lit(SALT)).cast("int")
    )
    pairs = (
        a.join(b, ["cell", "r"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            quantize(S.dot("va", "vb") / (F.col("na") * F.col("nb")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= SIM_THRESHOLD)
    )
    cc = DD.connected_components(
        pairs.select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
        )
    )
    labeled = (
        asim.join(cc, asim["vec_id"] == cc["node"], "left")
        .select(
            "vec_id",
            "cell",
            "cent_sim",
            F.coalesce("cluster_id", F.col("vec_id")).alias("group_id"),
        )
    )
    sizes = labeled.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    keep_w = Window.partitionBy("group_id").orderBy(
        F.asc("cent_sim"), F.asc("vec_id")
    )
    return (
        labeled.join(sizes, "group_id")
        .withColumn("keep", F.row_number().over(keep_w) == 1)
        .select("vec_id", "cell", "group_id", "group_size", "cent_sim", "keep")
    )


# ---------------------------------------------------------------------------
# Semantic decontamination: the embedding-space companion to
# decontaminate_ngram — n-gram overlap misses paraphrased eval
# leakage; max-cosine-to-eval-set catches it. Same held-out split
# convention as the n-gram op (id % 17 == 0 is the benchmark).
# ---------------------------------------------------------------------------


SEMDECON_THRESHOLD = 0.35  # same calibration note as SIM_THRESHOLD


SEMDECON_EVAL_CAP = 3400  # eval suite is FIXED-SIZE: ids below this


@_q(
    "decontaminate_semantic",
    f"""
    WITH ev AS (SELECT vec_id AS eval_id, embedding AS evv
                FROM embeddings
                WHERE vec_id % 17 = 0 AND vec_id < {SEMDECON_EVAL_CAP}),
    tr AS (SELECT vec_id, embedding FROM embeddings
           WHERE NOT (vec_id % 17 = 0 AND vec_id < {SEMDECON_EVAL_CAP})),
    scored AS (
        SELECT t.vec_id, e.eval_id,
               {quantize_sql(_cos_sql('t.embedding', 'e.evv'), 6)} AS sim
        FROM tr t CROSS JOIN ev e)
    SELECT vec_id, eval_id AS nearest_eval_id, sim AS max_sim,
           sim >= {SEMDECON_THRESHOLD} AS contaminated
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY sim DESC, eval_id) = 1
    """,
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) decontamination: held-out eval
    vectors = ``vec_id % 17 == 0`` BELOW the fixed cap — an eval
    suite is fixed-size, so the benchmark must not let it grow with
    the corpus (the uncapped form read quadratic at sf1: eval x10 AND
    corpus x10 = ratio 21.4 vs the 20 bound; capped, the probe is the
    honest linear corpus scan). Every other vector is scored by its
    max cosine to the eval set and flagged contaminated at threshold.
    The eval side broadcasts (an eval suite is MBs against 100 TB),
    the corpus never shuffles its vectors, and the per-row max is a
    map-side-combining struct aggregate — the only exchange is n
    result rows (plan-pinned in test_plans.py). Gate SFs (0.001-0.1)
    have every vec_id under the cap, so driver rows are unchanged."""
    emb = _emb(spark, sf_dir)
    is_eval = (F.col("vec_id") % 17 == 0) & (
        F.col("vec_id") < SEMDECON_EVAL_CAP
    )
    return S.decontaminate_semantic(
        emb.filter(~is_eval), emb.filter(is_eval), SEMDECON_THRESHOLD
    )


_MSE_SQL = (
    "list_reduce(list_transform(range(1, len(v) + 1), "
    "i -> (v[i] - dq[i]) * (v[i] - dq[i])), (x, y) -> x + y) / len(v)"
)


PQ_M = 4  # PQ subspaces (64-dim embedding -> 4 x 16-dim subvectors)
PQ_DIM = 64


def _pq_cte_block() -> str:
    """Four prefixed kmeans chains (one per subspace) + quantized-
    cosine assignment per subspace + the joined ``pqcodes`` frame."""
    d = PQ_DIM // PQ_M
    chains, assigns = [], []
    for sI in range(PQ_M):
        lo, hi = sI * d + 1, sI * d + d
        chains.append(
            _kmeans_ctes(vec_expr=f"embedding[{lo}:{hi}]", p=f"s{sI}")
        )
        assigns.append(
            f"""a{sI} AS (
            SELECT vec_id, cell AS code_{sI} FROM (
                SELECT e.vec_id, c.cell,
                       {quantize_sql(_cos_sql(f'e.embedding[{lo}:{hi}]', 'c.cent'), 6)} AS sim
                FROM embeddings e CROSS JOIN s{sI}c{KMEANS_ITERS} c)
            QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY sim DESC, cell) = 1)"""
        )
    joins = " ".join(f"JOIN a{sI} USING (vec_id)" for sI in range(1, PQ_M))
    cols = ", ".join(f"CAST(code_{sI} AS INT) AS code_{sI}" for sI in range(PQ_M))
    codes = f"pqcodes AS (SELECT vec_id, {cols} FROM a0 {joins})"
    return ",\n".join(chains + assigns + [codes])


def _pq_oracle_sql() -> str:
    return (
        "WITH " + _pq_cte_block() + "\nSELECT * FROM pqcodes"
    )


# Default picked from the measured cost/recall curve
# (tools/pq_recall_curve.py -> PQ_RECALL_CURVE.json): at the hard
# corpus (sf0.1's 2000 independent random vectors) m=4/k=8 with a
# 400-deep shortlist reaches 93% top-3 recall at the same wall as
# shortlist=100 (63%); the wider m=8 geometries cost 2-3x and plateau
# at 80%. The shortlist is an ABSOLUTE re-rank budget (400 exact
# cosines per query regardless of corpus size), so the scale cost at
# 100 TB is unchanged.
PQ_SHORTLIST = 400


def _pq_topk_oracle_sql() -> str:
    """ADC search replay: per-query LUT of quantized subspace cosines
    vs the trained codebooks, corpus scored by LUT joins on the code
    word, shortlist by ADC, exact-cosine re-rank."""
    d = PQ_DIM // PQ_M
    luts = []
    for sI in range(PQ_M):
        lo, hi = sI * d + 1, sI * d + d
        luts.append(
            f"""lut{sI} AS (
            SELECT q.vec_id AS query_id, c.cell,
                   {quantize_sql(_cos_sql(f'q.embedding[{lo}:{hi}]', 'c.cent'), 6)} AS sim
            FROM embeddings q CROSS JOIN s{sI}c{KMEANS_ITERS} c
            WHERE q.vec_id < {N_QUERIES})"""
        )
    lut_joins = " ".join(
        f"JOIN lut{sI} l{sI} ON l{sI}.cell = e.code_{sI}"
        + (" AND l%d.query_id = l0.query_id" % sI if sI else "")
        for sI in range(PQ_M)
    )
    adc_sum = " + ".join(f"l{sI}.sim" for sI in range(PQ_M))
    return f"""
    WITH {_pq_cte_block()},
    {','.join(luts)},
    adc AS (
        SELECT l0.query_id, e.vec_id AS neighbor_id, {adc_sum} AS adc
        FROM pqcodes e {lut_joins}
        WHERE e.vec_id <> l0.query_id),
    short AS (
        SELECT query_id, neighbor_id FROM adc
        QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc DESC, neighbor_id)
                <= {PQ_SHORTLIST})
    SELECT query_id, neighbor_id,
           {quantize_sql(_cos_sql('qe.embedding', 'ne.embedding'), 6)} AS sim
    FROM short
    JOIN embeddings qe ON qe.vec_id = query_id
    JOIN embeddings ne ON ne.vec_id = neighbor_id
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) <= 3
    """


@_q("embedding_pq_codes", _pq_oracle_sql())
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization code words for the embedding corpus:
    4 subspaces x 8 spherical centroids = one byte-pair-sized code per
    vector (64 floats -> 4 small ints), the compression an ANN index
    applies before sharding its shortlist structures. Training is four
    tiny cached k-means runs on the bounded sample; CODING is a
    zero-shuffle map-only projection — the 4x8 codebook is embedded in
    the plan as literal arrays (no join, no broadcast; pinned in
    tests/test_plans.py). The oracle replays all four trainers and the
    quantized-cosine assignment bit-for-bit."""
    emb = _emb(spark, sf_dir)
    codes = S.pq_codes(
        spark,
        sf_dir,
        emb,
        train=emb.filter(F.col("vec_id") < TRAIN_N),
        dim=PQ_DIM,
        m=PQ_M,
        k=N_CENTROIDS,
        iters=KMEANS_ITERS,
    )
    return codes.select(
        "vec_id",
        *[F.col(f"code_{sI}").cast("int").alias(f"code_{sI}") for sI in range(PQ_M)],
    )


@_q("ann_pq_topk", _pq_topk_oracle_sql())
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN search with asymmetric distance computation: each query
    precomputes a 4x8 LUT of quantized subspace cosines; the corpus is
    scored by FOUR ARRAY LOOKUPS per row (zero per-row cosines), the
    top-PQ_SHORTLIST (400) per query is re-ranked with the exact cosine. At
    100 TB the scoring stage is the PQ coding projection + a broadcast
    of #queries LUT rows — scan-bound, no shuffle before the bounded
    per-query top-k — and the exact math only ever touches
    shortlist x queries vectors. The oracle replays trainer, coding,
    LUT, lookup-sum and both rank stages bit-for-bit."""
    # plain table, no spread: unlike the bare coder (embedding_pq_codes,
    # where the spread wins 0.61 -> 0.39 s), the full ADC query chain
    # re-exchanges on pid for the shortlist window anyway, so the extra
    # leading repartition only adds a stage (A/B sf0.1: 1.46 -> 2.08 s)
    emb = table(spark, sf_dir, "embeddings")
    return S.pq_topk(
        spark,
        sf_dir,
        emb,
        emb.filter(F.col("vec_id") < N_QUERIES),
        train=emb.filter(F.col("vec_id") < TRAIN_N),
        dim=PQ_DIM,
        m=PQ_M,
        k=N_CENTROIDS,
        iters=KMEANS_ITERS,
        shortlist=PQ_SHORTLIST,
        topk=3,
    )


ANN_NPROBE = 2  # coarse cells probed per query in the IVF-PQ search


def _ivfpq_topk_oracle_sql() -> str:
    """IVF-PQ (FAISS ``IVF8,PQ4`` shape) full replay: the coarse
    trainer + corpus/query cell assignment (the ann_ivf_topk chain),
    the four PQ sub-trainers + coding + per-query LUTs (the ann_pq_topk
    chain), ADC scoring restricted to each query's ANN_NPROBE probed
    cells, shortlist by ADC, exact-cosine re-rank."""
    d = PQ_DIM // PQ_M
    luts = []
    for sI in range(PQ_M):
        lo, hi = sI * d + 1, sI * d + d
        luts.append(
            f"""lut{sI} AS (
            SELECT q.vec_id AS query_id, c.cell,
                   {quantize_sql(_cos_sql(f'q.embedding[{lo}:{hi}]', 'c.cent'), 6)} AS sim
            FROM embeddings q CROSS JOIN s{sI}c{KMEANS_ITERS} c
            WHERE q.vec_id < {N_QUERIES})"""
        )
    lut_joins = " ".join(
        f"JOIN lut{sI} l{sI} ON l{sI}.cell = e.code_{sI} "
        f"AND l{sI}.query_id = p.query_id"
        for sI in range(PQ_M)
    )
    adc_sum = " + ".join(f"l{sI}.sim" for sI in range(PQ_M))
    return f"""
    WITH {_kmeans_ctes()},
    {_pq_cte_block()},
    ascore AS (
        SELECT e.vec_id, cell,
               {quantize_sql(_cos_sql('e.embedding', 'c.cent'), 6)} AS sim
        FROM embeddings e CROSS JOIN {KMEANS_FINAL} c),
    assign AS (
        SELECT vec_id, cell FROM ascore
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY sim DESC, cell) = 1),
    qprobe AS (
        SELECT vec_id AS query_id, cell FROM ascore
        WHERE vec_id < {N_QUERIES}
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY sim DESC, cell) <= {ANN_NPROBE}),
    {','.join(luts)},
    adc AS (
        SELECT p.query_id, e.vec_id AS neighbor_id, {adc_sum} AS adc
        FROM pqcodes e
        JOIN assign a USING (vec_id)
        JOIN qprobe p ON p.cell = a.cell
        {lut_joins}
        WHERE e.vec_id <> p.query_id),
    short AS (
        SELECT query_id, neighbor_id FROM adc
        QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc DESC, neighbor_id)
                <= {PQ_SHORTLIST})
    SELECT query_id, neighbor_id,
           {quantize_sql(_cos_sql('qe.embedding', 'ne.embedding'), 6)} AS sim
    FROM short
    JOIN embeddings qe ON qe.vec_id = query_id
    JOIN embeddings ne ON ne.vec_id = neighbor_id
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) <= 3
    """


@_q("ann_ivfpq_topk", _ivfpq_topk_oracle_sql())
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN search (the FAISS ``IVF8,PQ4`` production shape):
    the coarse IVF partition prunes candidates to each query's
    ANN_NPROBE(=2) nearest cells, ADC scores survivors with four array
    lookups per row, the exact cosine re-ranks only the shortlist. The
    corpus side is ONE zero-shuffle projection — coarse cell AND the
    four PQ codes all come from literal-embedded codebooks — followed
    by a broadcast hash equi-join on cell; there is no nested-loop join
    anywhere in the plan (pinned). The oracle replays coarse trainer,
    PQ trainers, both assignments, LUTs, ADC and both rank stages
    bit-for-bit."""
    emb = _emb(spark, sf_dir)
    return S.ivfpq_topk(
        spark,
        sf_dir,
        emb,
        emb.filter(F.col("vec_id") < N_QUERIES),
        train=emb.filter(F.col("vec_id") < TRAIN_N),
        dim=PQ_DIM,
        m=PQ_M,
        k=N_CENTROIDS,
        iters=KMEANS_ITERS,
        coarse_k=N_CENTROIDS,
        nprobe=ANN_NPROBE,
        shortlist=PQ_SHORTLIST,
        topk=3,
    )


@_q(
    "embedding_quantize_int8",
    f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    sc AS (
        SELECT vec_id, v,
               nullif(list_max(list_transform(v, x -> abs(x))), 0.0) / 127.0 AS scale
        FROM base
    ),
    dqt AS (
        SELECT vec_id, v, scale,
               list_transform(v, x -> floor(x / scale + 0.5) * scale) AS dq
        FROM sc
    )
    SELECT vec_id,
           {quantize_sql('scale', 6)} AS scale_q,
           {quantize_sql(_MSE_SQL, 6)} AS mse_q,
           {quantize_sql(_cos_sql('v', 'dq'), 6)} AS cos_q
    FROM dqt
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column with
    per-vector fidelity stats: the code scale (max|x|/127), the
    reconstruction MSE, and cosine(original, dequantized). This is the
    4x-compression step an ANN index takes before sharding vectors at
    scale; everything is JVM-side array arithmetic (transform /
    zip_with / aggregate) in one map-only stage — no UDF, no shuffle.
    Rounding is floor(x + 0.5) — the engine-portable form used by
    quantize() — and the left-fold sums match DuckDB's list_reduce
    order so the oracle is bit-exact.
    """
    emb = _emb(spark, sf_dir)
    dot = (
        lambda a, b: f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "0.0D, (acc, z) -> acc + z)"
    )
    d = (
        emb.withColumn("v", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn(
            "scale",
            F.expr("nullif(array_max(transform(v, x -> abs(x))), 0.0D) / 127.0D"),
        )
        .withColumn("dq", F.expr("transform(v, x -> floor(x / scale + 0.5D) * scale)"))
    )
    mse = F.expr(
        "aggregate(zip_with(v, dq, (a, b) -> (a - b) * (a - b)), 0.0D, "
        "(acc, x) -> acc + x) / size(v)"
    )
    cos = F.expr(
        f"{dot('v', 'dq')} / (sqrt({dot('v', 'v')}) * sqrt({dot('dq', 'dq')}))"
    )
    return d.select(
        "vec_id",
        quantize(F.col("scale"), 6).alias("scale_q"),
        quantize(mse, 6).alias("mse_q"),
        quantize(cos, 6).alias("cos_q"),
    )


# --- document topic clustering (hashed-TF k-means) -------------------

TOPIC_DIM = 16  # hashed-TF feature dimensionality (md5 bucket count)
TOPIC_K = 8  # topics
TOPIC_TRAIN_N = 64  # trainer sample: doc_id < 64 (bounded, deterministic)

# DuckDB replica of the hashed-TF featurizer: tokens = lowercased
# whitespace split (the corpus-wide shingling convention), bucket =
# 32-bit md5 prefix mod TOPIC_DIM, vector = per-bucket counts.
_TOPIC_FEATS_SQL = f"""
    dtok AS (
        SELECT doc_id,
               list_transform(
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               w -> w <> ''),
                   w -> CAST(('0x' || substr(md5(w), 1, 8))::UBIGINT
                             % {TOPIC_DIM} AS BIGINT)) AS bs
        FROM documents),
    dfe AS (
        SELECT doc_id,
               list_transform(generate_series(0, {TOPIC_DIM - 1}),
                   d -> CAST(len(list_filter(bs, b -> b = d)) AS DOUBLE))
                 AS v
        FROM dtok)"""


def doc_tf_vector(text_col) -> "F.Column":
    """The hashed-TF document vector as a pure Column expression over
    any ``text`` column (batch OR streaming frame): token -> 32-bit
    md5 prefix mod TOPIC_DIM, vector = bucket counts. Tokenize-once
    and bucket-once via bind_array — a zero-shuffle map at any scale,
    and stream-compatible because it is stateless."""
    from snowalert_spark.functions import text as T

    tok = F.filter(T.tokens(text_col), lambda w: w != F.lit(""))
    bs = T.bind_array(
        tok, lambda t: F.transform(t, lambda w: T.base_hash32(w) % TOPIC_DIM)
    )
    return T.bind_array(
        bs,
        lambda b: F.transform(
            F.sequence(F.lit(0), F.lit(TOPIC_DIM - 1)),
            lambda d: F.size(F.filter(b, lambda x: x == d)).cast("double"),
        ),
    )


def topic_assign_col(cent_rows, sub: str = "v") -> "F.Column":
    """Literal-codebook argmax topic assignment as a Column over the
    feature-vector expression ``sub`` — the PQ-coder trick, map-only
    and stream-compatible (the trained centroids are plan literals,
    so a streaming micro-batch classifies with zero state)."""
    arr = S._cell_nsim_arr_sql(cent_rows, sub)
    return F.expr(f"element_at(array_sort({arr}), 1).cell")


def topic_centroid_rows(spark: SparkSession, sf_dir: str):
    """Train-once topic centroids for a corpus version (process cache
    + versioned-store persistence, keyed apart from the embedding
    models by the ``#doctf`` suffix)."""
    feats = _doc_tf_features(spark, sf_dir)
    return S.trained_centroid_rows(
        spark,
        f"{sf_dir}#doctf{TOPIC_DIM}",
        feats.filter(F.col("doc_id") < TOPIC_TRAIN_N),
        k=TOPIC_K,
        iters=KMEANS_ITERS,
        id_col="doc_id",
        vec_col="v",
    )


def _doc_tf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, v) for the corpus — :func:`doc_tf_vector` over the
    documents table."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", doc_tf_vector(F.col("text")).alias("v"))


# DuckDB replica of the full topic-assignment pipeline (featurizer +
# Lloyd rounds + argmax assignment) as a reusable CTE suffix: callers
# prepend `WITH` and the feature CTEs.
_TOPIC_ASSIGN_SQL = f"""
    {_kmeans_ctes(k=TOPIC_K, train_n=TOPIC_TRAIN_N, src='dfe',
                  id_col='doc_id', vec_expr='v', p='t')},
    tassign AS (
        SELECT doc_id, cell AS topic FROM (
            SELECT f.doc_id, c.cell,
                   {quantize_sql(_cos_sql('f.v', 'c.cent'), 6)} AS sim
            FROM dfe f CROSS JOIN t{KMEANS_FINAL} c)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY sim DESC, cell) = 1)"""


@_q(
    "doc_topic_clusters",
    f"""
    WITH {_TOPIC_FEATS_SQL},
    {_TOPIC_ASSIGN_SQL}
    SELECT doc_id, topic FROM tassign
    """,
)
def doc_topic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupervised topic clustering over ``documents``: hashed-TF
    feature vectors (no model download, pure md5 arithmetic) ->
    deterministic k-means (k=TOPIC_K, trained on the bounded
    doc_id < TOPIC_TRAIN_N sample) -> every document assigned to its
    argmax-quantized-cosine topic (smaller-cell tiebreak). The standard
    corpus-bucketing step before mixture planning: cluster shares feed
    :func:`snowalert_spark.functions.sampling.mixture_plan` weights.

    100 TB shape: featurization is a zero-shuffle map (see
    :func:`_doc_tf_features`); training touches only the bounded
    sample; assignment embeds the k x TOPIC_DIM centroid table as plan
    literals (the PQ-coder trick) so the corpus-wide pass is a single
    map-only projection - no join, no exchange, no window. The DuckDB
    oracle replays featurizer + both Lloyd rounds + assignment
    bit-for-bit via the retargeted ``_kmeans_ctes(src='dfe',
    id_col='doc_id')`` chain."""
    return _topic_assignments(spark, sf_dir)


def _topic_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, topic) for every document — the hashed-TF k-means
    pipeline shared by :func:`doc_topic_clusters` and
    :func:`topic_balanced_sample`. The topic centroids ride the same
    train-once cache + versioned-store persistence as the embedding
    codebooks (the ``#doctf`` suffix keys them apart from the
    embedding-table models of the same (k, iters))."""
    feats = _doc_tf_features(spark, sf_dir)
    cent_rows = topic_centroid_rows(spark, sf_dir)
    return feats.select(
        "doc_id", topic_assign_col(cent_rows, "v").alias("topic")
    )


@_q(
    "topic_balanced_sample",
    f"""
    WITH {_TOPIC_FEATS_SQL},
    {_TOPIC_ASSIGN_SQL},
    plan AS (
        SELECT topic, COUNT(*) AS n_docs FROM tassign GROUP BY topic),
    tot AS (SELECT SUM(1.0) AS tw, SUM(n_docs) AS tn FROM plan),
    rates AS (
        SELECT topic,
               LEAST(CAST(100 AS BIGINT),
                     CAST(floor(100.0 * 1.0 / tw * tn / n_docs)
                          AS BIGINT)) AS rate_pct
        FROM plan CROSS JOIN tot)
    SELECT doc_id, topic, bucket, rate_pct FROM (
        SELECT a.doc_id, a.topic,
               CAST(('0x' || substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 8))
                    ::UBIGINT % 100 AS BIGINT) AS bucket,
               r.rate_pct
        FROM tassign a JOIN rates r USING (topic))
    WHERE bucket < rate_pct
    """,
)
def topic_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The topic pipeline closed end-to-end: cluster every document
    (hashed-TF k-means), plan an EQUAL topic mixture with
    :func:`~snowalert_spark.functions.sampling.mixture_plan`
    (weight 1.0 per topic, rates capped at 100%, never upsampling),
    and apply the plan as a deterministic md5-bucket downsample —
    the standard rebalance before training-shard writes when one
    topic dominates a crawl.

    100 TB shape: the corpus is featurized + assigned ONCE and the
    tiny (doc_id, topic) pairs are materialized (localCheckpoint —
    the semantic_dedup multi-consumer pattern: the mixture plan's
    count, its totals, and the keep pass would otherwise each re-run
    the argmax scan). The plan itself is one map-side-combined count
    aggregation collapsing the pairs to k driver-side rows; the keep
    pass is a map-only filter over the pairs (the k-row rate table
    rides the plan as a literal map; the bucket predicate is a pure
    column expression, so the same rows survive on any cluster layout
    or rerun). The final per-row plan has no join, exchange, or
    window."""
    from snowalert_spark.functions import sampling as SMP

    topics = _topic_assignments(spark, sf_dir).localCheckpoint()
    plan = SMP.mixture_plan(topics, "topic", F.lit(1.0))
    rates = {
        int(r["topic"]): int(r["rate_pct"])
        for r in plan.select("topic", "rate_pct").collect()
    }
    kept = SMP.stratified_sample(
        topics, "topic", rates, "doc_id", default_pct=100
    )
    return kept.select("doc_id", "topic", "bucket", "rate_pct")
