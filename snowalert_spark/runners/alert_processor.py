"""Alert correlation (reference: alert_processor.py).

The reference walks new alerts row-at-a-time in the driver: an alert
joins the correlation of the most recent alert within 60 minutes that
shares its ACTOR and its OBJECT *or* ACTION; otherwise it starts a new
correlation id (:10-31, :42-107). Arrays in OBJECT/ACTION are
JSON-stringified before comparison (SP1513 regression, :50-56).

Distributed equivalent (SURVEY §7.3 hard-part 3): a window pass per
ACTOR ordered by event time — an alert chains to the previous alert of
the same actor when the 60-minute gap and OBJECT-or-ACTION conditions
hold; correlation groups are the resulting prefix-sums, and the group
id is ``{actor-hash}-{first ALERT_ID}`` (deterministic; the reference
mints uuid4). Chaining to the *previous* alert of the actor is
equivalent to the reference's most-recent-correlated lookup whenever
the previous alert is within the window — the 2-hour scan bound means
chains older than that are restarted in both designs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from snowalert_spark.store import ResultsStore

CORRELATION_WINDOW_MINUTES = 60  # alert_processor.py:10
SCAN_HOURS = 2  # alert_processor.py:38


def main(
    spark: SparkSession,
    store: ResultsStore,
    now: dt.datetime | None = None,
) -> int:
    now = now or dt.datetime.utcnow()
    scan_from = now - dt.timedelta(hours=SCAN_HOURS)
    alerts = store.read("alerts")
    todo = alerts.filter(
        (~F.coalesce(F.col("suppressed"), F.lit(False)))
        & (F.col("event_time") >= F.lit(scan_from))
    )

    actor = F.col("alert.ACTOR")
    obj = F.col("alert.OBJECT")
    act = F.col("alert.ACTION")
    w = W.partitionBy(actor).orderBy("event_time", F.col("alert.ALERT_ID"))

    gap_s = F.col("event_time").cast("double") - F.lag(
        F.col("event_time").cast("double")
    ).over(w)
    same_entity = (obj == F.lag(obj).over(w)) | (act == F.lag(act).over(w))
    new_chain = (
        F.lag(obj).over(w).isNull()
        | (gap_s > CORRELATION_WINDOW_MINUTES * 60)
        | ~F.coalesce(same_entity, F.lit(False))
    ).cast("int")
    chain = F.sum(new_chain).over(w.rowsBetween(W.unboundedPreceding, 0))

    wchain = W.partitionBy(actor, F.col("__chain"))
    corr = (
        todo.withColumn("__chain", chain)
        .withColumn(
            "__corr",
            F.concat_ws(
                "-",
                F.md5(F.coalesce(actor, F.lit(""))),
                F.min(F.col("alert.ALERT_ID")).over(wchain),
            ),
        )
        .select(
            F.col("alert.ALERT_ID").alias("aid"),
            F.col("__corr").alias("corr"),
        )
    )
    n = store.upsert(
        "alerts",
        corr,
        on=lambda t, s: F.col("alert.ALERT_ID") == F.col("src_aid"),
        when_matched={"correlation_id": F.col("src_corr")},
        when_not_matched_insert=False,
    )
    return n["updated"]
