"""Incremental / streaming ingest (reference §2.10: stage → pipe →
stream → task wiring).

Two equivalents, matching the reference's observable micro-batch
semantics (SURVEY §2.10: idempotent windowed batch + upsert instead of
watermarks):

- ``watermark_batch``: high-watermark incremental reads over an
  append-only table (the reference's stream-on-table consumed by a
  task); the cursor column is ``insert_id``/``event_time`` and the
  watermark persists in a checkpoint file.
- ``file_stream_ingest``: Structured Streaming file source with
  ``availableNow`` trigger + checkpoint — the pipe/auto-ingest analog:
  each invocation picks up exactly the files that arrived since the
  last one.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def windowed_counts(
    events,
    time_col: str,
    group_cols: list[str],
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
):
    """Streaming tumbling/sliding windowed counts with late-data
    watermark (§2.10): the streaming form of baselines.hourly_counts.
    Append-mode emits a window once the watermark passes its end."""
    w = (
        F.window(time_col, window)
        if slide is None
        else F.window(time_col, window, slide)
    )
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(w.alias("w"), *group_cols)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("slice_start"),
            F.col("w.end").alias("slice_end"),
            *group_cols,
            "n",
        )
    )


def sessionize_stream(
    events,
    key_col: str,
    time_col: str,
    gap_minutes: int = 60,
    idle_timeout: bool = False,
):
    """Custom stateful streaming operator: per-key session assembly
    with a gap threshold via ``applyInPandasWithState`` — the
    streaming analog of the correlation runner's 60-minute chaining
    (alert_processor.py:10-31). Each closed session emits one row
    (key, session_start, session_end, n_events); the open session per
    key lives in state.

    ``idle_timeout=True`` adds a ProcessingTimeTimeout that flushes
    sessions idle past the gap — for long-running production streams
    only. Leave it off for drain-style runs: a pending timeout makes
    the engine schedule batches forever, so
    ``query.processAllAvailable()`` never settles.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = gap_minutes * 60

    def fn(key, pdfs, state: GroupState):
        rows = []
        if idle_timeout and state.hasTimedOut:
            (s0, last, n) = state.get
            rows.append((key[0], s0, last, n))
            state.remove()
        else:
            ts = sorted(
                t.timestamp()
                for pdf in pdfs
                for t in pd.to_datetime(pdf[time_col])
            )
            if ts:
                if state.exists:
                    s0, last, n = state.get
                else:
                    s0, last, n = ts[0], ts[0], 0
                for t in ts:
                    if t - last > gap_s:
                        rows.append((key[0], s0, last, n))
                        s0, n = t, 0
                    last = t
                    n += 1
                state.update((s0, last, n))
                if idle_timeout:
                    state.setTimeoutDuration(gap_s * 1000)
        yield pd.DataFrame(
            rows, columns=[key_col, "session_start", "session_end", "n_events"]
        )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=(
                f"{key_col} long, session_start double, session_end double, "
                "n_events long"
            ),
            stateStructType="session_start double, last_seen double, n long",
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


class WatermarkBatch:
    """Exactly-once-per-row incremental batch consumption keyed on a
    monotonically increasing cursor column."""

    def __init__(self, checkpoint_path: str, cursor_col: str):
        self.path = checkpoint_path
        self.cursor_col = cursor_col

    def _load(self):
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)["watermark"]
        return None

    def _save(self, wm) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(self.path, "w") as f:
            json.dump({"watermark": wm}, f, default=str)

    def read_increment(self, df: DataFrame) -> DataFrame:
        wm = self._load()
        return df if wm is None else df.filter(F.col(self.cursor_col) > F.lit(wm))

    def commit(self, df: DataFrame) -> None:
        row = df.agg(F.max(self.cursor_col).alias("m")).collect()[0]
        if row.m is not None:
            self._save(row.m)


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    time_col: str = "ts",
    watermark: str = "10 minutes",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming deduplication: drop repeat deliveries of the same
    logical event (at-least-once sources — SQS/Kinesis redelivery, the
    reference's re-scanned S3 window) keyed on ``key_cols``.

    ``within_watermark=True`` uses ``dropDuplicatesWithinWatermark``:
    state for a key is evictable once the watermark passes its event
    time + delay, so state size is bounded by the watermark horizon —
    the only form that survives an unbounded 100 TB stream. With
    ``False`` it falls back to plain ``dropDuplicates`` (exact, but
    state grows with distinct keys forever; only for bounded replays).
    """
    ev = events.withWatermark(time_col, watermark)
    if within_watermark:
        return ev.dropDuplicatesWithinWatermark(key_cols)
    return ev.dropDuplicates(key_cols)


def file_stream_ingest(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    checkpoint: str,
    schema: T.StructType,
    fmt: str = "json",
    transform=None,
) -> None:
    """Pipe analog: ingest newly-arrived files exactly once into a
    parquet landing dir. ``availableNow`` processes the backlog and
    stops — the reference's 1-minute task cadence is the scheduler's
    job, not the stream's."""
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    stream = reader.load(src_path)
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.format("parquet")
        .option("path", dst_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def file_stream_ingest_continuous(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    checkpoint: str,
    schema: T.StructType,
    fmt: str = "json",
    transform=None,
    processing_interval: str = "60 seconds",
):
    """Continuous pipe analog (reference: the 1-minute CloudTrail
    ingest task, src/connectors/aws_cloudtrail.py:270-275): a long-
    running ``processingTime`` micro-batch stream that picks up
    newly-arrived files each tick, exactly once per file across
    restarts (file-source + checkpoint guarantee).

    Returns the StreamingQuery — the caller owns its lifecycle
    (``stop()``), matching the reference where the warehouse task
    scheduler owns the cadence. At cluster scale the same code runs
    against an object-store prefix; ``maxFilesPerTrigger`` bounds a
    tick's intake so one giant backlog can't blow a micro-batch."""
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    stream = reader.option("maxFilesPerTrigger", "1000").load(src_path)
    if transform is not None:
        stream = transform(stream)
    return (
        stream.writeStream.format("parquet")
        .option("path", dst_path)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=processing_interval)
        .start()
    )
