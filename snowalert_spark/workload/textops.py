"""Text-analysis + dedup operators over ``documents`` (filled in
incrementally; see snowalert_spark.functions.text / .dedup)."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
