"""Exact (order-insensitive) aggregate arithmetic.

Summing doubles is non-associative, so a distributed sum's last bits
depend on partitioning — a different answer every run and a guaranteed
hash mismatch against any single-threaded oracle. The fix is to
accumulate in DECIMAL (exact, associative) and surface the result as
double. Source measures here carry ≤6 decimal digits, so the
double→decimal(18,6) cast is lossless; at 100 TB the decimal sum fits
decimal(38,12) with ~1e26 of headroom.

The same idiom appears in the DuckDB oracle SQL
(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE)) so both engines produce
bit-identical doubles with no rounding anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dec(c: Column | str) -> Column:
    """Lossless lift of a ≤6-decimal measure into exact decimal."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def exact_sum(c: Column | str) -> Column:
    """Order-insensitive sum surfaced as double."""
    return F.sum(dec(c)).cast("double")


def exact_avg(c: Column | str) -> Column:
    """Order-insensitive mean: exact decimal sum, one IEEE division."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(dec(col)).cast("double") / F.count(col)
