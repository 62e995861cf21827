"""Scalar-function coverage + table functions + multimodal plumbing
(SURVEY §2.8, §2.9) as oracle-backed queries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowalert_spark.functions import dedup as DD
from snowalert_spark.functions import multimodal as M
from snowalert_spark.functions import time_slices as TS
from snowalert_spark.functions import variant as V
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


# ---------------------------------------------------------------------------
# String functions (§2.8: ||, SPLIT_PART, SUBSTR, UPPER/LOWER,
# REGEXP_REPLACE w/ backrefs, REGEXP_SUBSTR→regexp_extract, LENGTH)
# ---------------------------------------------------------------------------
@_q(
    "string_functions",
    r"""
    SELECT doc_id,
           split_part(text, ' ', 1) AS first_token,
           upper(lang) AS lang_uc,
           source || '-' || lang AS source_lang,
           substr(text, 1, 12) AS prefix12,
           CAST(length(text) AS BIGINT) AS text_len,
           regexp_extract(text, '([a-z]+) join', 1) AS before_join,
           regexp_replace(text, '(scan) (merge)', '\2 \1', 'g') AS swapped
    FROM documents
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("first_token"),
        F.upper("lang").alias("lang_uc"),
        F.concat_ws("-", "source", "lang").alias("source_lang"),
        F.substring("text", 1, 12).alias("prefix12"),
        F.length("text").cast("long").alias("text_len"),
        F.regexp_extract(F.col("text"), r"([a-z]+) join", 1).alias("before_join"),
        F.regexp_replace(F.col("text"), r"(scan) (merge)", r"$2 $1").alias("swapped"),
    )


# ---------------------------------------------------------------------------
# LIKE / ILIKE / NOT LIKE / RLIKE (P5, P6)
# ---------------------------------------------------------------------------
@_q(
    "like_rlike_filters",
    """
    SELECT lang,
           CAST(SUM(CASE WHEN text LIKE '%merge%' THEN 1 ELSE 0 END) AS BIGINT) AS n_merge,
           CAST(SUM(CASE WHEN text ILIKE '%SPARK%' THEN 1 ELSE 0 END) AS BIGINT) AS n_spark,
           CAST(SUM(CASE WHEN text NOT LIKE '%window%' THEN 1 ELSE 0 END) AS BIGINT) AS n_no_window,
           CAST(SUM(CASE WHEN regexp_matches(text, 'join (fast|slow)') THEN 1 ELSE 0 END) AS BIGINT) AS n_join_speed
    FROM documents
    GROUP BY lang
    """,
)
def like_rlike_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.groupBy("lang").agg(
        F.sum(t.like("%merge%").cast("long")).alias("n_merge"),
        F.sum(t.ilike("%SPARK%").cast("long")).alias("n_spark"),
        F.sum((~t.like("%window%")).cast("long")).alias("n_no_window"),
        F.sum(t.rlike("join (fast|slow)").cast("long")).alias("n_join_speed"),
    )


# ---------------------------------------------------------------------------
# Conditionals (§2.8: IFF→when, IFNULL/COALESCE, NULLIF, LEAST/GREATEST)
# ---------------------------------------------------------------------------
@_q(
    "conditional_functions",
    """
    SELECT event_id,
           CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid'
                ELSE 'high' END AS bucket,
           COALESCE(NULLIF(event_type, 'error'), 'ERR') AS type_or_err,
           least(value, 100.0) AS capped,
           greatest(value, 0.0) AS floored
    FROM events
    """,
)
def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    v = F.col("value")
    return e.select(
        "event_id",
        F.when(v < 50, "low").when(v < 150, "mid").otherwise("high").alias("bucket"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("ERR")).alias(
            "type_or_err"
        ),
        F.least(v, F.lit(100.0)).alias("capped"),
        F.greatest(v, F.lit(0.0)).alias("floored"),
    )


# ---------------------------------------------------------------------------
# Date/time functions (§2.8: DATE_TRUNC, DATEADD, DATEDIFF, EXTRACT,
# day-of-week) — note DuckDB dayofweek is 0-based Sunday, Spark 1-based
# ---------------------------------------------------------------------------
@_q(
    "datetime_functions",
    f"""
    SELECT event_id,
           date_trunc('day', ts) AS day,
           CAST(hour(ts) AS INTEGER) AS hr,
           CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
           ts + INTERVAL 90 MINUTE AS ts_plus_90m,
           CAST(floor((epoch_us(ts) / 1000000.0
                       - epoch_us(TIMESTAMP '2024-01-01 00:00:00') / 1000000.0)
                      / 60.0) AS BIGINT) AS minutes_since_epoch0
    FROM events
    """,
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    # NTZ-tolerant: no-op when ts is already TIMESTAMP; converts if a
    # foreign session read the tz-less parquet column as TIMESTAMP_NTZ
    # (cast-to-double is illegal on NTZ).
    ts = F.col("ts").cast("timestamp")
    t0 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    return e.select(
        "event_id",
        F.date_trunc("day", ts).alias("day"),
        F.hour(ts).alias("hr"),
        F.dayofweek(ts).alias("dow"),
        (ts + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus_90m"),
        F.floor((ts.cast("double") - t0.cast("double")) / 60.0).alias(
            "minutes_since_epoch0"
        ),
    )


# ---------------------------------------------------------------------------
# time_slices table function (F1/F2) + irregular-grid range join (J7):
# 90-minute slices can't date_trunc — the scale path is arithmetic
# binning; the oracle is the naive interval join over the same slices.
# ---------------------------------------------------------------------------
SLICE_T0 = dt.datetime(2024, 1, 1)
SLICE_N = 48
SLICE_SECONDS = 5400  # 90 minutes


@_q(
    "time_slices_table_function",
    f"""
    SELECT TIMESTAMP '2024-01-01 00:00:00' - INTERVAL (({SLICE_N} - i) * {SLICE_SECONDS}) SECOND AS slice_start,
           TIMESTAMP '2024-01-01 00:00:00' - INTERVAL (({SLICE_N} - i - 1) * {SLICE_SECONDS}) SECOND AS slice_end
    FROM (SELECT unnest(range({SLICE_N})) AS i)
    """,
)
def time_slices_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TS.time_slices_before_t(spark, SLICE_N, SLICE_SECONDS, SLICE_T0)


@_q(
    "range_join_90min_slices",
    f"""
    WITH slices AS (
        SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i * {SLICE_SECONDS}) SECOND AS slice_start,
               TIMESTAMP '2024-01-01 00:00:00' + INTERVAL ((i + 1) * {SLICE_SECONDS}) SECOND AS slice_end
        FROM (SELECT unnest(range(0, 2000)) AS i)
    )
    SELECT s.slice_start, COUNT(*) AS n,
           {quantize_sql('CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)')} AS total_value
    FROM events e
    JOIN slices s ON e.ts >= s.slice_start AND e.ts < s.slice_end
    GROUP BY s.slice_start
    """,
)
def range_join_90min_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantically a range join onto a regular 90-min grid; executed
    as O(1) arithmetic binning (no non-equi join, single agg shuffle).
    """
    e = table(spark, sf_dir, "events")
    t0_us = int(SLICE_T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    w_us = SLICE_SECONDS * 1_000_000
    # NTZ-tolerant: unix_micros is illegal on TIMESTAMP_NTZ inputs.
    k = F.expr(f"(unix_micros(cast(ts AS TIMESTAMP)) - {t0_us}) div {w_us}")
    return (
        e.withColumn("slice_start", F.timestamp_micros(F.lit(t0_us) + k * w_us))
        .groupBy("slice_start")
        .agg(
            F.count("*").alias("n"),
            quantize(
                F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
            ).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# TRY_CAST / TRY_TO_TIMESTAMP coercion (§2.8; aws_cloudtrail.py:207-233
# late/garbled timestamp handling) — malformed inputs become NULL, not
# errors, even under ANSI mode
# ---------------------------------------------------------------------------
@_q(
    "try_cast_coercion",
    """
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           TRY_CAST(event_type AS INTEGER) AS bad_int,
           TRY_CAST('2024-01-01 00:00:0' || CAST(event_id % 10 AS VARCHAR)
                    AS TIMESTAMP) AS parsed_ts,
           TRY_CAST(event_type AS TIMESTAMP) AS bad_ts
    FROM events WHERE event_id < 500
    """,
)
def try_cast_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
        F.col("event_type").try_cast("int").alias("bad_int"),
        F.try_to_timestamp(
            F.concat(
                F.lit("2024-01-01 00:00:0"), (F.col("event_id") % 10).cast("string")
            )
        ).alias("parsed_ts"),
        F.col("event_type").try_cast("timestamp").alias("bad_ts"),
    )


# ---------------------------------------------------------------------------
# CONVERT_TIMEZONE (§2.8; create-udtfs.sql.fmt:59-60) + arrays/SPLIT
# ---------------------------------------------------------------------------
@_q(
    "timezone_and_array_functions",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_parts,
           list_contains(string_split(lower(text), ' '), 'merge') AS has_merge,
           string_split(text, ' ')[1] AS head,
           CAST(strpos(text, 'join') AS INTEGER) AS join_pos
    FROM documents
    """,
)
def timezone_and_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    parts = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(parts).cast("long").alias("n_parts"),
        F.array_contains(F.split(F.lower("text"), " "), "merge").alias("has_merge"),
        F.element_at(parts, 1).alias("head"),
        # REGEXP_INSTR/POSITION analog: first occurrence, 1-based, 0 if absent
        F.instr(F.col("text"), "join").alias("join_pos"),
    )


@_q(
    "convert_timezone_shift",
    """
    SELECT event_id,
           ts AS utc_ts,
           ts - INTERVAL 8 HOUR AS pt_wallclock
    FROM events WHERE event_id < 200
    """,
)
def convert_timezone_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT_TIMEZONE('UTC','America/... ', ts) analog: with the
    engine pinned to UTC, a timezone conversion is a wall-clock shift;
    from_utc_timestamp handles DST-aware zones (fixed offset used here
    so the oracle is engine-independent)."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return e.select(
        "event_id",
        F.col("ts").alias("utc_ts"),
        (F.col("ts") - F.expr("INTERVAL 8 HOURS")).alias("pt_wallclock"),
    )


# ---------------------------------------------------------------------------
# OBJECT_CONSTRUCT / canonical JSON / MD5 identity (§2.8 variant heart)
# ---------------------------------------------------------------------------
@_q(
    "object_construct_canonical",
    """
    SELECT event_id,
           '{"action":"' || event_type || '","actor":"user:' ||
           CAST(user_id AS VARCHAR) || '","id":' || CAST(event_id AS VARCHAR)
           || '}' AS doc,
           md5('{"action":"' || event_type || '","actor":"user:' ||
               CAST(user_id AS VARCHAR) || '","id":' || CAST(event_id AS VARCHAR)
               || '}') AS doc_md5
    FROM events
    """,
)
def object_construct_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OBJECT_CONSTRUCT → compact key-sorted JSON (the violation
    identity canonicalization) — oracle states the exact byte form."""
    e = table(spark, sf_dir, "events")
    doc = V.object_construct(
        id=F.col("event_id"),
        actor=F.concat(F.lit("user:"), F.col("user_id").cast("string")),
        action=F.col("event_type"),
    )
    return e.select("event_id", doc.alias("doc"), F.md5(doc).alias("doc_md5"))


# ---------------------------------------------------------------------------
# Recursive FLATTEN (F: cis_azure_pack.sql:192-217) — pandas-UDF path;
# oracle-able because the flattened paths of our synthesized doc are
# enumerable in SQL
# ---------------------------------------------------------------------------
@_q(
    "recursive_flatten_paths",
    """
    WITH docs AS (
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k
        FROM events WHERE event_id < 100
    )
    SELECT CAST(event_id AS VARCHAR) AS event_id, path, value FROM (
        SELECT event_id, 'inner.k' AS path, k AS value FROM docs
        UNION ALL
        SELECT event_id, 'tags[0]', 'a' FROM docs
        UNION ALL
        SELECT event_id, 'tags[1]', 'b' FROM docs
    )
    """,
)
def recursive_flatten_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    nested = e.select(
        "event_id",
        F.to_json(
            F.struct(
                F.struct(F.get_json_object("props", "$.k").alias("k")).alias("inner"),
                F.array(F.lit("a"), F.lit("b")).alias("tags"),
            )
        ).alias("doc"),
    )
    return V.recursive_flatten(nested, "doc", ["event_id"])


# ---------------------------------------------------------------------------
# Multimodal: binary columns + Arrow-batched feature extraction; the
# oracle checks the byte-level results (length + md5), the feature
# vector is engine-internal
# ---------------------------------------------------------------------------
@_q(
    "multimodal_features",
    """
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.media_from_documents(table(spark, sf_dir, "documents"))
    return M.extract_features(media, decode="fake").select(
        "media_id", "kind", "n_bytes", "content_md5"
    )


@_q(
    "multimodal_frame_sample",
    """
    SELECT doc_id AS media_id,
           UNNEST(range(0, greatest(CAST(n_chars * 10 AS BIGINT), 1), 1000)) AS frame_ms
    FROM documents WHERE doc_id % 3 = 2
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.media_from_documents(table(spark, sf_dir, "documents"))
    return M.frame_sample(media, every_ms=1000)


# ---------------------------------------------------------------------------
# Perceptual image hashing + image near-dup (dHash): the multimodal
# analog of MinHash-LSH — hash each image to 64 gradient bits, band
# into 8 bytes, candidate pairs from a band equi-join, verify by
# hamming distance. decode='fake' pools the raw payload bytes (the
# deterministic synthetic-media parity path the DuckDB oracle replays
# bit-exact); real images go through the same mapInPandas stage with
# registry decoders (pytest-verified on generated PPM/PNG).
# ---------------------------------------------------------------------------

# dHash banding for the candidate join: 4 bands x 16 bits. Any pair
# within hamming 3 shares >= 1 intact band (pigeonhole), so recall is
# exact at the threshold; wider 16-bit bands keep chance collisions on
# unrelated images ~n^2/2^16 per band instead of the n^2/2^8 an 8-bit
# banding would produce (the synthetic corpus measures min inter-doc
# hamming 12, so chance candidates never reach the verify threshold).
DHASH_HAM_T = 3

_DHASH_CELLS_SQL = """
dh_docs AS (
    SELECT doc_id AS media_id, text FROM documents
    UNION ALL
    -- planted perceptual variants: a mild deterministic perturbation
    -- (uppercase the first 5 bytes ~ a recompression artifact in the
    -- first pooling cell) of every 10th doc, offset ids
    SELECT doc_id + 1000000 AS media_id,
           upper(text[1:5]) || text[6:] AS text
    FROM documents WHERE doc_id % 10 = 0),
dh_b AS (SELECT media_id,
                list_transform(range(1, strlen(text) + 1),
                               i -> ascii(text[i:i])) AS bts,
                strlen(text) AS n
         FROM dh_docs),
dh_cells AS (SELECT media_id,
                    list_transform(range(0, 72), j ->
                      CAST(COALESCE(list_sum(bts[(j * n) // 72 + 1 : ((j + 1) * n) // 72]), 0) AS DOUBLE)
                      / greatest(((j + 1) * n) // 72 - (j * n) // 72, 1)) AS g
             FROM dh_b),
dh_bands AS (SELECT media_id,
                    list_transform(range(0, 8), r ->
                      CAST(COALESCE(list_sum(list_transform(range(0, 8), c ->
                        CASE WHEN g[r * 9 + c + 2] > g[r * 9 + c + 1]
                             THEN 1 << (7 - c) ELSE 0 END)), 0) AS INT)) AS bd
             FROM dh_cells)
"""


@_q(
    "image_dhash",
    f"""
    WITH {_DHASH_CELLS_SQL}
    SELECT media_id,
           string_agg(CASE WHEN strlen(h) = 1 THEN '0' || h ELSE h END, ''
                      ORDER BY r) AS dhash
    FROM (SELECT media_id, unnest(generate_series(1, 8)) AS r,
                 lower(hex(unnest(bd))) AS h
          FROM dh_bands
          WHERE media_id < 1000000)
    GROUP BY media_id
    """,
)
def image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image 64-bit perceptual difference hash via the Arrow-
    batched decode stage (one pass over the media bytes, no shuffle —
    mapInPandas is the honest path because real image decode is
    Python; the byte-pooling parity path is also expressible as pure
    column expressions, which is what the DuckDB oracle replays)."""
    media = M.media_from_documents(table(spark, sf_dir, "documents"))
    return M.image_dhash(media, decode="fake").select("media_id", "dhash")


def _media_with_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents-as-media plus planted perceptual variants: every 10th
    doc re-appears (id + 1e6) with its first 5 payload bytes
    uppercased — a byte-local perturbation like a recompression
    artifact, shifting at most the first pooling cell (hamming <= ~2
    of the original's dHash)."""
    d = table(spark, sf_dir, "documents")
    variants = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.upper(F.substring("text", 1, 5)), F.expr("substring(text, 6)")
        ).alias("text"),
        "n_chars",
        *[c for c in d.columns if c not in ("doc_id", "text", "n_chars")],
    )
    return M.media_from_documents(d.unionByName(variants.select(d.columns)))


def _banded_pairs_sql(bands_cte: str, pfx: str, threshold: int) -> str:
    """The band-join/verify oracle block shared by the image-dHash and
    audio-fingerprint near-dup oracles: 4x16-bit banded candidates +
    popcount verify over the 8 band bytes in ``{bands_cte}(media_id,
    bd)``. Callers prepend WITH + their cells CTEs."""
    return f"""
    {pfx}sides AS (SELECT media_id, unnest(generate_series(1, 4)) AS r,
                        unnest([bd[1] * 256 + bd[2], bd[3] * 256 + bd[4],
                                bd[5] * 256 + bd[6], bd[7] * 256 + bd[8]]) AS v
                 FROM {bands_cte}),
    {pfx}cand AS (SELECT DISTINCT a.media_id AS media_id, b.media_id AS dup_of
                FROM {pfx}sides a JOIN {pfx}sides b
                  ON a.r = b.r AND a.v = b.v AND a.media_id < b.media_id)
    SELECT c.media_id, c.dup_of,
           CAST(list_sum(list_transform(range(1, 9),
                i -> bit_count(xor(ba.bd[i], bb.bd[i])))) AS INT) AS hamming
    FROM {pfx}cand c
    JOIN {bands_cte} ba ON ba.media_id = c.media_id
    JOIN {bands_cte} bb ON bb.media_id = c.dup_of
    WHERE list_sum(list_transform(range(1, 9),
          i -> bit_count(xor(ba.bd[i], bb.bd[i])))) <= {threshold}
    """


def _banded_clusters_sql(bands_cte: str, pfx: str, threshold: int) -> str:
    """Cluster-form sibling of :func:`_banded_pairs_sql`: the same
    band-join/verify pair graph, symmetrized and closed with a
    recursive CTE (min label per node = min media id in the near-dup
    component), one output row per media id with the representative
    flagged. Callers prepend WITH RECURSIVE + their cells CTEs."""
    return f"""
    {pfx}sides AS (SELECT media_id, unnest(generate_series(1, 4)) AS r,
                        unnest([bd[1] * 256 + bd[2], bd[3] * 256 + bd[4],
                                bd[5] * 256 + bd[6], bd[7] * 256 + bd[8]]) AS v
                 FROM {bands_cte}),
    {pfx}cand AS (SELECT DISTINCT a.media_id AS media_id, b.media_id AS dup_of
                FROM {pfx}sides a JOIN {pfx}sides b
                  ON a.r = b.r AND a.v = b.v AND a.media_id < b.media_id),
    {pfx}pairs AS (SELECT c.media_id AS a, c.dup_of AS b
                   FROM {pfx}cand c
                   JOIN {bands_cte} ba ON ba.media_id = c.media_id
                   JOIN {bands_cte} bb ON bb.media_id = c.dup_of
                   WHERE list_sum(list_transform(range(1, 9),
                         i -> bit_count(xor(ba.bd[i], bb.bd[i]))))
                         <= {threshold}),
    {pfx}edges AS (SELECT a, b FROM {pfx}pairs
                   UNION SELECT b, a FROM {pfx}pairs),
    {pfx}reach(node, label) AS (
        SELECT media_id, media_id FROM {bands_cte}
        UNION
        SELECT e.b, r.label
        FROM {pfx}reach r JOIN {pfx}edges e ON e.a = r.node)
    SELECT node AS media_id, MIN(label) AS cluster_id,
           node = MIN(label) AS keep
    FROM {pfx}reach GROUP BY node
    """


@_q(
    "dedup_image_dhash",
    f"""
    WITH {_DHASH_CELLS_SQL},
    {_banded_pairs_sql('dh_bands', 'dh_', DHASH_HAM_T)}
    """,
)
def dedup_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs at hamming <= 3 over the dHash
    (finds the planted recompression-like variants): candidate pairs
    from a multi-block composite-key equi-join (ids + one long per
    row — never a product join, never payloads in the exchange),
    hamming verified on the 8 hash bytes joined back once per
    distinct candidate. Recall is exact at the threshold by
    pigeonhole (blocks - combo >= 3 in every shape). At 100 TB the
    corpus-size schedule (``DD.hamming_block_schedule``) widens the
    composite keys — (6,3): 20 keys of 32 bits, (8,5): 56 keys of 40
    bits — so chance candidates stay O(n) instead of the gate
    banding's 4n^2/2^16; output is shape-independent, so the static
    oracle pins every shape (the count() sizing the corpus is a
    parquet-metadata aggregate)."""
    h = M.image_dhash(_media_with_variants(spark, sf_dir), decode="fake")
    return _banded_hamming_pairs(h, DHASH_HAM_T)


@_q(
    "dedup_image_clusters",
    f"""
    WITH RECURSIVE {_DHASH_CELLS_SQL},
    {_banded_clusters_sql('dh_bands', 'dh_', DHASH_HAM_T)}
    """,
)
def dedup_image_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-form image near-dup — ``(media_id, cluster_id, keep)``,
    one row per image, cluster_id = min id in the hamming<=3 connected
    component. The scale-safe sibling of dedup_image_dhash: rep pairs
    over DISTINCT hashes + exact-class star edges feed
    connected_components, so re-upload-heavy corpora never pay the
    quadratic member-pair expansion (r10 verdict item 1). The oracle
    closes the full pair graph with a recursive CTE."""
    h = M.image_dhash(_media_with_variants(spark, sf_dir), decode="fake")
    return _banded_hamming_pairs(h, DHASH_HAM_T, output="clusters")


def _banded_hamming_pairs(
    hashed8: DataFrame,
    threshold: int,
    blocks: int | None = None,
    combo: int | None = None,
    output: str = "pairs",
) -> DataFrame:
    """Near-dup pairs over any 64-bit hash emitted as 8 byte columns
    ``band_0..band_7`` (+ ``media_id``) — the shared multi-block
    candidate/verify engine (``functions/dedup.hamming_pairs_
    multiblock``, Manku et al. WWW'07). The default corpus-size
    schedule keeps gate corpora on the (4, 1) banding the static
    DuckDB oracles replay as their candidate CTE and widens the
    composite keys past it, with identical output. ``output=
    'clusters'`` switches to the scale-safe one-row-per-id cluster
    form (rep graph + star edges -> connected components)."""
    return DD.hamming_pairs_multiblock(
        hashed8, threshold, blocks=blocks, combo=combo, output=output
    )


# --- audio fingerprint (temporal energy hash) -------------------------

# DuckDB replica of the audio fingerprint parity path: the audio-kind
# media (doc_id % 3 = 1 in media_from_documents' kind assignment) plus
# planted variants (every 10th audio clip, 3 bytes perturbed mid-
# payload — measured hamming <= 3, so the 4x16-bit bands recall them
# losslessly); 66 window means over the payload bytes (the pixel_grid
# slicing), adjacent deltas, band byte r bit c set iff d[8r+c+1] >
# d[8r+c] (second derivative of the energy envelope — the chromaprint
# comparison, vs dHash's first derivative).
_AFP_CELLS_SQL = f"""
af_docs AS (
    SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 1
    UNION ALL
    SELECT doc_id + 1000000 AS media_id,
           text[1:11] || upper(text[12:14]) || text[15:] AS text
    FROM documents WHERE doc_id % 30 = 1),
af_b AS (SELECT media_id,
                list_transform(range(1, strlen(text) + 1),
                               i -> ascii(text[i:i])) AS bts,
                strlen(text) AS n
         FROM af_docs),
af_cells AS (SELECT media_id,
                    list_transform(range(0, 66), j ->
                      CAST(COALESCE(list_sum(bts[(j * n) // 66 + 1 : ((j + 1) * n) // 66]), 0) AS DOUBLE)
                      / greatest(((j + 1) * n) // 66 - (j * n) // 66, 1)) AS g
             FROM af_b),
af_d AS (SELECT media_id,
                list_transform(range(1, 66), i -> g[i + 1] - g[i]) AS d
         FROM af_cells),
af_bands AS (SELECT media_id,
                    list_transform(range(0, 8), r ->
                      CAST(COALESCE(list_sum(list_transform(range(0, 8), c ->
                        CASE WHEN d[8 * r + c + 2] > d[8 * r + c + 1]
                             THEN 1 << (7 - c) ELSE 0 END)), 0) AS INT)) AS bd
             FROM af_d)
"""


@_q(
    "audio_fingerprint",
    f"""
    WITH {_AFP_CELLS_SQL}
    SELECT media_id,
           string_agg(CASE WHEN strlen(h) = 1 THEN '0' || h ELSE h END, ''
                      ORDER BY r) AS afp
    FROM (SELECT media_id, unnest(generate_series(1, 8)) AS r,
                 lower(hex(unnest(bd))) AS h
          FROM af_bands
          WHERE media_id < 1000000)
    GROUP BY media_id
    """,
)
def audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip 64-bit temporal energy fingerprint (chromaprint-style:
    bits are the SECOND derivative sign of the windowed energy
    envelope, which survives gain changes — vs dHash's first
    derivative over space) via the Arrow-batched decode stage. The
    real path decodes 16-bit PCM through SAMPLE_DECODERS (RIFF/WAV
    ships); the synthetic parity path pools payload bytes and is what
    the oracle replays bit-exact."""
    media = M.media_from_documents(table(spark, sf_dir, "documents"))
    return M.audio_fingerprint(
        media.filter(F.col("kind") == "audio"), decode="fake"
    ).select("media_id", "afp")


def _audio_media_with_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-kind media plus planted perceptual variants: every 10th
    audio clip re-appears (id + 1e6) with payload bytes 12-14
    uppercased — a mid-stream level blip confined to ~2 energy
    windows (measured hamming <= 3 across the whole corpus, so the
    banded join recalls every plant)."""
    d = table(spark, sf_dir, "documents")
    audio = d.filter(F.col("doc_id") % 3 == 1)
    variants = audio.filter(F.col("doc_id") % 10 == 1).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 11),
            F.upper(F.substring("text", 12, 3)),
            F.expr("substring(text, 15)"),
        ).alias("text"),
        "n_chars",
        *[c for c in d.columns if c not in ("doc_id", "text", "n_chars")],
    )
    both = audio.unionByName(variants.select(d.columns))
    # media_from_documents derives kind from media_id % 3, which the
    # +1e6 id offset would shift to 'video' for the variants — every
    # row here IS audio, so pin the kind explicitly (a per-kind sweep
    # downstream must see the variants as audio).
    return M.media_from_documents(both).withColumn(
        "kind", F.lit("audio")
    )


@_q(
    "dedup_audio_fp",
    f"""
    WITH {_AFP_CELLS_SQL},
    {_banded_pairs_sql('af_bands', 'af_', M.AFP_HAM_T)}
    """,
)
def dedup_audio_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs at hamming <= 3 over the temporal
    energy fingerprint (finds the planted level-blip variants): the
    image-dHash candidate/verify shape — a multi-block composite-key
    equi-join (ids + one long per row, never a product join, payloads
    never shuffle) with popcount verify on the 8 fingerprint bytes
    joined back once per distinct candidate. Recall is exact at the
    threshold by pigeonhole; chance key collisions (4n^2/2^16 at the
    gate shape, measured 30 on the gate corpus; O(n) past it via
    ``DD.hamming_block_schedule``) are discarded by the verify."""
    h = M.audio_fingerprint(
        _audio_media_with_variants(spark, sf_dir), decode="fake"
    )
    return _banded_hamming_pairs(h, M.AFP_HAM_T)


@_q(
    "dedup_audio_clusters",
    f"""
    WITH RECURSIVE {_AFP_CELLS_SQL},
    {_banded_clusters_sql('af_bands', 'af_', M.AFP_HAM_T)}
    """,
)
def dedup_audio_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-form audio near-dup — ``(media_id, cluster_id, keep)``,
    one row per clip, cluster_id = min id in the hamming<=3 connected
    component of the temporal-energy-fingerprint pair graph. Same
    rep-graph + star-edge factorization as the image/video cluster
    rows; the oracle closes the full pair graph recursively."""
    h = M.audio_fingerprint(
        _audio_media_with_variants(spark, sf_dir), decode="fake"
    )
    return _banded_hamming_pairs(h, M.AFP_HAM_T, output="clusters")


# --- video frame hashing (sequence-aware near-dup) ---------------------

# DuckDB replica of the video frame-hash parity path: the video-kind
# media (doc_id % 3 = 2) plus planted variants (every 10th clip, 3
# bytes perturbed mid-payload inside frame 2 — the other frames' byte
# slices are untouched so their hashes match exactly); per frame f of
# 4: the frame's byte slice pooled to the 8x9 grid and gradient-
# hashed exactly like the image path.
_VFH_CELLS_SQL = """
vf_docs AS (
    SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 2
    UNION ALL
    SELECT doc_id + 1000000 AS media_id,
           text[1 : strlen(text) // 2 + 5]
           || upper(text[strlen(text) // 2 + 6 : strlen(text) // 2 + 8])
           || text[strlen(text) // 2 + 9 :] AS text
    FROM documents WHERE doc_id % 30 = 2),
vf_b AS (SELECT media_id,
                list_transform(range(1, strlen(text) + 1),
                               i -> ascii(text[i:i])) AS bts,
                strlen(text) AS n
         FROM vf_docs),
vf_fr AS (SELECT media_id, f,
                 bts[(f * n) // 4 + 1 : ((f + 1) * n) // 4] AS fb
          FROM (SELECT media_id, bts, n, unnest(range(0, 4)) AS f
                FROM vf_b)),
vf_cells AS (SELECT media_id, f,
                    list_transform(range(0, 72), j ->
                      CAST(COALESCE(list_sum(fb[(j * len(fb)) // 72 + 1 : ((j + 1) * len(fb)) // 72]), 0) AS DOUBLE)
                      / greatest(((j + 1) * len(fb)) // 72 - (j * len(fb)) // 72, 1)) AS g
             FROM vf_fr),
vf_bands AS (SELECT media_id, f,
                    list_transform(range(0, 8), r ->
                      CAST(COALESCE(list_sum(list_transform(range(0, 8), c ->
                        CASE WHEN g[r * 9 + c + 2] > g[r * 9 + c + 1]
                             THEN 1 << (7 - c) ELSE 0 END)), 0) AS INT)) AS bd
             FROM vf_cells)
"""


@_q(
    "video_framehash",
    f"""
    WITH {_VFH_CELLS_SQL}
    SELECT media_id, CAST(f AS INT) AS frame_no,
           string_agg(CASE WHEN strlen(h) = 1 THEN '0' || h ELSE h END, ''
                      ORDER BY r) AS fh
    FROM (SELECT media_id, f, unnest(generate_series(1, 8)) AS r,
                 lower(hex(unnest(bd))) AS h
          FROM vf_bands
          WHERE media_id < 1000000)
    GROUP BY media_id, f
    """,
)
def video_framehash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame perceptual hashes for every video clip: 4 fixed-
    stride frames, each dHashed like a still image, one row per
    frame. The real path samples frames through FRAME_PIXEL_DECODERS
    (none ships — video codecs stay an honest stub); the synthetic
    parity path slices the payload into 4 equal segments, which the
    oracle replays bit-exact."""
    media = M.media_from_documents(table(spark, sf_dir, "documents"))
    return M.video_framehash(
        media.filter(F.col("kind") == "video"), decode="fake"
    ).select("media_id", "frame_no", "fh")


def _video_media_with_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-kind media plus planted variants: every 10th clip
    re-appears (id + 1e6) with 3 payload bytes uppercased mid-stream
    (inside frame 2's slice): one re-encoded segment. The other three
    frames' byte slices are untouched, so their hashes match exactly
    and the >= VIDEO_MIN_FRAMES aligned-frame rule always recalls the
    plant even if the perturbed frame drifts past the threshold."""
    d = table(spark, sf_dir, "documents")
    video = d.filter(F.col("doc_id") % 3 == 2)
    p = "length(text) div 2 + 5"
    variants = video.filter(F.col("doc_id") % 10 == 2).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.expr(
            f"concat(substring(text, 1, {p}), "
            f"upper(substring(text, {p} + 1, 3)), "
            f"substring(text, {p} + 4))"
        ).alias("text"),
        "n_chars",
        *[c for c in d.columns if c not in ("doc_id", "text", "n_chars")],
    )
    both = video.unionByName(variants.select(d.columns))
    # pin the kind: the +1e6 offset would shift the derived kind
    return M.media_from_documents(both).withColumn("kind", F.lit("video"))


@_q(
    "dedup_video_framehash",
    f"""
    WITH {_VFH_CELLS_SQL},
    vf_sides AS (SELECT media_id, f, unnest(generate_series(1, 4)) AS r,
                        unnest([bd[1] * 256 + bd[2], bd[3] * 256 + bd[4],
                                bd[5] * 256 + bd[6], bd[7] * 256 + bd[8]]) AS v
                 FROM vf_bands),
    vf_cand AS (SELECT DISTINCT a.media_id AS media_id,
                                b.media_id AS dup_of, a.f AS f
                FROM vf_sides a JOIN vf_sides b
                  ON a.f = b.f AND a.r = b.r AND a.v = b.v
                 AND a.media_id < b.media_id),
    vf_ham AS (SELECT c.media_id, c.dup_of, c.f,
                      CAST(list_sum(list_transform(range(1, 9),
                           i -> bit_count(xor(ba.bd[i], bb.bd[i])))) AS INT)
                        AS hamming
               FROM vf_cand c
               JOIN vf_bands ba ON ba.media_id = c.media_id AND ba.f = c.f
               JOIN vf_bands bb ON bb.media_id = c.dup_of AND bb.f = c.f)
    SELECT media_id, dup_of,
           CAST(COUNT(*) AS INT) AS n_frames_close,
           CAST(SUM(hamming) AS INT) AS total_hamming
    FROM vf_ham
    WHERE hamming <= {M.AFP_HAM_T}
    GROUP BY media_id, dup_of
    HAVING COUNT(*) >= {M.VIDEO_MIN_FRAMES}
    """,
)
def dedup_video_framehash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-aware video near-dup: two clips are near-duplicates
    when >= VIDEO_MIN_FRAMES of their 4 ALIGNED frames are within
    hamming <= 3 — robust to one re-encoded segment, which a single
    whole-payload hash is not. Candidates come from the per-frame
    multi-block composite-key equi-join keyed on (frame, combo, key)
    — ids only, never a product join — verified by popcount per
    aligned frame and aggregated per clip pair. At 100 TB this is the
    image/audio multi-block shape with a frame multiplier: the
    corpus-size schedule (sized on FRAME rows = 4x clips) holds
    chance candidates O(n) — the gate 4x16 banding measured 61k
    candidates for 1.7k clips at sf0.1, quadratic in clips; the
    (6,3)/(8,5) shapes replace that n^2/2^16 term with n^2/2^32 /
    n^2/2^40 at identical output."""
    fh = M.video_framehash(
        _video_media_with_variants(spark, sf_dir), decode="fake"
    )
    # shared helper (functions/dedup.video_clip_pairs): packs (clip,
    # frame) into one key for the multi-block engine — same frame_no
    # aligns automatically because the pack keeps frame bits low; the
    # auto-schedule sizes on FRAME rows (= 4x clips), the collision-
    # bearing count — then aggregates aligned close frames per pair
    return DD.video_clip_pairs(
        fh, M.AFP_HAM_T, M.VIDEO_FRAMES, M.VIDEO_MIN_FRAMES
    )


# recursive-CTE connected components over the qualifying video pair
# graph: every clip starts labelled with itself; labels propagate along
# symmetrized edges until the (UNION-deduped) closure fixpoint; min
# label per node = min clip id in the component. Small closed-form CC
# is exactly what a gate-scale oracle can afford — the Spark side never
# materializes the pair graph at all (rep pairs + star edges).
_VFH_CLUSTERS_TAIL_SQL = f"""
vq AS (SELECT media_id AS a, dup_of AS b
       FROM vf_ham
       WHERE hamming <= {M.AFP_HAM_T}
       GROUP BY media_id, dup_of
       HAVING COUNT(*) >= {M.VIDEO_MIN_FRAMES}),
vedges AS (SELECT a, b FROM vq UNION SELECT b, a FROM vq),
vreach(node, label) AS (
    SELECT media_id, media_id FROM (SELECT DISTINCT media_id FROM vf_docs)
    UNION
    SELECT e.b, r.label FROM vreach r JOIN vedges e ON e.a = r.node)
SELECT node AS media_id, MIN(label) AS cluster_id,
       node = MIN(label) AS keep
FROM vreach GROUP BY node
"""


@_q(
    "dedup_video_clusters",
    f"""
    WITH RECURSIVE {_VFH_CELLS_SQL},
    vf_sides AS (SELECT media_id, f, unnest(generate_series(1, 4)) AS r,
                        unnest([bd[1] * 256 + bd[2], bd[3] * 256 + bd[4],
                                bd[5] * 256 + bd[6], bd[7] * 256 + bd[8]]) AS v
                 FROM vf_bands),
    vf_cand AS (SELECT DISTINCT a.media_id AS media_id,
                                b.media_id AS dup_of, a.f AS f
                FROM vf_sides a JOIN vf_sides b
                  ON a.f = b.f AND a.r = b.r AND a.v = b.v
                 AND a.media_id < b.media_id),
    vf_ham AS (SELECT c.media_id, c.dup_of, c.f,
                      CAST(list_sum(list_transform(range(1, 9),
                           i -> bit_count(xor(ba.bd[i], bb.bd[i])))) AS INT)
                        AS hamming
               FROM vf_cand c
               JOIN vf_bands ba ON ba.media_id = c.media_id AND ba.f = c.f
               JOIN vf_bands bb ON bb.media_id = c.dup_of AND bb.f = c.f),
    {_VFH_CLUSTERS_TAIL_SQL}
    """,
)
def dedup_video_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-form video near-dup — one row per clip ``(media_id,
    cluster_id, keep)`` with cluster_id = min clip id in the connected
    component of the qualifying-pair graph (>= VIDEO_MIN_FRAMES
    aligned frames within hamming 3) and keep marking the
    representative. This is the 100 TB output form (r10 verdict item
    1): the pair form's OUTPUT is quadratic in re-upload class sizes
    (sf30 probe: 199.7 M pairs made it the one over-bound row), while
    clusters are one row per clip no matter how heavy the re-upload
    skew. Exact collapse runs at CLIP granularity (signature = frame
    hashes in frame order; same signature => same partners), one rep
    per signature runs the pair engine, and rep pairs + signature star
    edges feed connected_components — member pairs are never
    materialized. The oracle computes the full qualifying pair graph
    and closes it with a recursive CTE, so agreement also proves the
    rep-graph factorization."""
    fh = M.video_framehash(
        _video_media_with_variants(spark, sf_dir), decode="fake"
    )
    return DD.video_framehash_clusters(
        fh, M.AFP_HAM_T, M.VIDEO_FRAMES, M.VIDEO_MIN_FRAMES
    )
