"""Guard against driver-canonicalizer-incompatible output shapes.

Round 7's only red CORRECTNESS row (`kmeans_centroids`) was a
driver-shape bug, not a math bug: the driver canonicalizes results
with a raw pandas sort over cell values, which throws
``TypeError: unhashable type: 'list'`` on any ``array<...>`` column
(the in-repo oracle replica tuple-izes cells first, so it passed
locally and masked the trap). Every DECLARED query must therefore
emit only atomic column types; complex values are encoded as
canonical strings (``array_join`` + fixed-point quantization, e.g.
``kmeans_centroids``' micro-unit string) or exploded to rows.

This test pins that invariant for all driver-declared queries so a
future gate rotation can't promote a bare-array output again. It
only needs the analyzed schema, so it runs at sf0.001.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from snowalert_spark import workload

SF_DIR = "/root/testdata/sf0.001"

_DECLARED = workload.queries(include_local=False)

_ATOMIC = (
    T.StringType,
    T.BooleanType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.BinaryType,
)


@pytest.mark.parametrize("name", sorted(_DECLARED))
def test_declared_output_is_driver_hashable(spark, name):
    df = _DECLARED[name](spark, SF_DIR)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if not isinstance(f.dataType, _ATOMIC)
    ]
    assert not bad, (
        f"{name} emits non-atomic columns the driver's pandas "
        f"canonicalizer cannot sort/hash: {bad}; encode as a canonical "
        "string (array_join over quantized values) or explode to rows"
    )
