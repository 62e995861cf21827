"""Numeric helpers with cross-engine deterministic semantics.

Floating-point SUM is order-dependent; Spark's partial aggregation over
many partitions and a single-threaded oracle will disagree in the last
ulp. For any aggregate that must hash-match an oracle we sum exactly in
decimal (order-independent) and cast once to double at the end. At
100 TB this costs nothing material: decimal(25,6) partial aggregation
is still map-side combinable and whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent SUM: exact decimal accumulation, one final
    cast to double. Oracle form:
    ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG via exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)
