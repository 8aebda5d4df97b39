"""Cross-engine result-type canonicalization for the DuckDB differential.

The driver's correctness gate hashes TYPED values: a DuckDB HUGEINT
(``SUM(int)``/``SUM(BIGINT)``, products thereof) collects as
``decimal.Decimal`` while Spark's BIGINT collects as ``int`` — same digits,
different hash. ``fetchall()``-based comparisons can't see the drift (Python
coerces both to comparable numbers), which let six HUGEINT oracles sit
latent through three rounds. This module labels each result column with the
Python class a collect yields, at exactly the granularity the driver's hash
distinguishes: int32-vs-int64 is NOT drift (both collect as ``int`` — the
driver-green ``psi_price_drift`` proves it), HUGEINT-vs-BIGINT IS.

Used by ``tools/driver_check.py`` and ``tests/test_differential.py``; any
new oracle must come back kind-clean from both.
"""

from __future__ import annotations

import pyarrow as pa


def arrow_kind(t: pa.DataType) -> str:
    """Canonical kind label for a DuckDB-result Arrow type (HUGEINT arrives
    as decimal128(38,0) — a Decimal, distinct from bigint's int)."""
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return f"decimal(scale={t.scale})"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"  # tz-naive vs instant handled at value level
    return "complex"


_SPARK_KIND = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "boolean": "bool",
    "string": "str",
    "binary": "bytes",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
}


def spark_kind(dtype: str) -> str:
    d = dtype.strip()
    if d.startswith("decimal("):
        scale = d[:-1].split(",")[1]
        return f"decimal(scale={scale})"
    return _SPARK_KIND.get(d, "complex")


def type_kind_diff(spark_dtypes, arrow_schema) -> list[tuple[str, str, str]]:
    """(col, spark_kind, duck_kind) for every shared column whose collected
    Python class would differ between the engines."""
    skinds = {c: spark_kind(t) for c, t in spark_dtypes}
    dkinds = {f.name: arrow_kind(f.type) for f in arrow_schema}
    return [
        (c, skinds[c], dkinds[c])
        for c in sorted(set(skinds) & set(dkinds))
        if skinds[c] != dkinds[c]
    ]
