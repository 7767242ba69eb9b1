"""Cross-engine deterministic aggregate helpers.

Fixture money columns are ``double`` (FIXTURES.md §B), and
floating-point summation is order-dependent — Spark's partial
(map-side) aggregation and DuckDB's sequential sum visit rows in
different orders, so ``SUM(double)`` can differ in the last few ulps
between engines and even between runs. That breaks the driver's
exact value-hash comparison.

Fix: route every money aggregate through an *exact decimal* sum.
``double → decimal(30,8)`` is a deterministic per-row rounding
(identical in Spark and DuckDB for non-tie values, and decimal ties
are impossible for the dyadic rationals doubles can represent except
on a measure-zero set); decimal addition is exact and associative, so
the sum is order-independent; the final ``decimal → double`` cast is
again deterministic. Result: bit-identical doubles from both engines,
no tolerance needed.

The reference faces the same class of problem from the opposite side —
its catalog maps Postgres ``numeric`` to ``Decimal(38, 4)`` while its
wire decoder reads ``numeric`` as lossy Float64
(/root/reference/src/sqldb/postgres/datatypes.rs:160-162 vs :19);
SURVEY.md §7 flags it as "genuinely hard" #1. This module is the
engine-side answer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 22 integer digits + 8 fractional — enough for sums of ~1e12 rows of
#: ~1e10-magnitude money values; far beyond the 100 TB target.
DEC = "decimal(30,8)"


def dsum(col: Column) -> Column:
    """Order-independent SUM over a double column, returned as double."""
    return F.sum(col.cast(DEC)).cast("double")


def davg(col: Column) -> Column:
    """Order-independent AVG over a double column, returned as double.

    Exact decimal sum divided by the exact count — both operands are
    bit-identical across engines, so the IEEE division result is too.
    """
    return F.sum(col.cast(DEC)).cast("double") / F.count(col)


def ts_micros(col: Column | str) -> Column:
    """Epoch microseconds from a timestamp of EITHER flavor.

    ``unix_micros`` rejects TIMESTAMP_NTZ outright (Spark 4 reads the
    driver's µs parquet columns as NTZ), so cast first: a no-op for
    TimestampType, and for NTZ an interpretation in the session
    timezone — pinned to UTC at catalog registration, which makes the
    naive wall-clock reading identical to DuckDB's ``epoch_us``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def sql_dsum(expr: str) -> str:
    """DuckDB-side mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE) / COUNT({expr}))"
