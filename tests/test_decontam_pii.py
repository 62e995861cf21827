"""Unit tests for benchmark decontamination and PII scrubbing on
planted inputs (the oracle test covers the synthetic tables; these pin
the semantics on adversarial hand-built rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowalert_spark.functions import dedup as D
from snowalert_spark.functions import text as X


def test_pii_scrub_planted(spark):
    rows = [
        (1, "contact alice@example.com or bob.smith+x@sub.domain.org now"),
        (2, "src 10.0.0.1 dst 192.168.254.3 port 443"),
        (3, "order 12345 qty 7"),
        (4, "alice@example.com from 10.0.0.1 paid 99"),
        (5, "no pii here"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "event_id int, props string")
    scrubbed, counts = X.pii_scrub(F.col("props"))
    out = {
        r["event_id"]: r
        for r in df.select(
            "event_id",
            counts["email"].alias("e"),
            counts["ip"].alias("i"),
            counts["number"].alias("n"),
            scrubbed.alias("s"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["i"], out[1]["n"]) == (2, 0, 0)
    assert out[1]["s"] == "contact [EMAIL] or [EMAIL] now"
    assert (out[2]["e"], out[2]["i"], out[2]["n"]) == (0, 2, 1)
    assert out[2]["s"] == "src [IP] dst [IP] port [NUM]"
    assert (out[3]["e"], out[3]["i"], out[3]["n"]) == (0, 0, 2)
    assert out[3]["s"] == "order [NUM] qty [NUM]"
    # ordering: the email is scrubbed before its digits can count as
    # numbers; the IP before its octets can
    assert (out[4]["e"], out[4]["i"], out[4]["n"]) == (1, 1, 1)
    assert out[4]["s"] == "[EMAIL] from [IP] paid [NUM]"
    assert (out[5]["e"], out[5]["i"], out[5]["n"]) == (0, 0, 0)
    assert out[5]["s"] == "no pii here"
    assert out[6]["s"] == ""


def test_decontaminate_ngram_planted(spark):
    # doc 0 is the benchmark (pred: doc_id == 0). doc 1 copies a
    # 5-token span verbatim (2 overlapping 5-shingles); doc 2 shares
    # only 4 consecutive tokens (no 5-shingle); doc 3 is disjoint.
    bench = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, bench),
        (1, "x alpha beta gamma delta epsilon zeta y"),
        (2, "alpha beta gamma delta X Y Z W V"),
        (3, "one two three four five six seven"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in D.decontaminate_ngram(
            df, F.col("doc_id") == 0, k=5
        ).collect()
    }
    assert set(out) == {1, 2, 3}  # benchmark doc excluded from output
    assert out[1]["contaminated"] and out[1]["n_benchmark_hits"] == 2
    assert not out[2]["contaminated"] and out[2]["n_benchmark_hits"] == 0
    assert not out[3]["contaminated"]
    assert out[3]["n_shingles"] == 3  # 7 tokens -> 3 5-shingles
    assert out[1]["overlap_frac"] == 0.5  # 2 of 4 shingles
