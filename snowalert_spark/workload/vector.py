"""Similarity-search operators over ``embeddings`` (filled in
incrementally; see snowalert_spark.functions.similarity)."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
