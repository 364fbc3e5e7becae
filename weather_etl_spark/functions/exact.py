"""Exact-arithmetic helpers for oracle-hash-stable aggregation.

FP sums are order-dependent, and Spark and DuckDB reduce in different
orders — so money aggregates go through exact DECIMAL arithmetic and
only become DOUBLE in the final projection (SURVEY.md §7.4 rule 1).
Derived means divide the exact sum by the count in double space
(deterministic IEEE op on identical inputs) and round to 4 places.

DECIMAL scales: 2 for money columns, 6 for the (1 - discount) /
(1 + tax) factors — scale 6 keeps decimal-cast rounding ties out of
realistic double domains while keeping product precision within
Spark's 38-digit cap (no allowPrecisionLoss truncation, which would
diverge from DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dec2(c: Column | str) -> Column:
    """Money column -> DECIMAL(18,2) (both engines round half-up here)."""
    return _col(c).cast("decimal(18,2)")


def dec6(c: Column | str) -> Column:
    """Rate/factor column -> DECIMAL(18,6)."""
    return _col(c).cast("decimal(18,6)")


def money_sum(c: Column, alias: str) -> Column:
    """Exact decimal sum emitted as DOUBLE."""
    return F.sum(c).cast("double").alias(alias)


def exact_avg(c: Column, alias: str, scale: int = 4) -> Column:
    """Exact decimal sum / count, divided in double space, rounded."""
    return F.round(
        F.sum(c).cast("double") / F.count(F.lit(1)), scale
    ).alias(alias)


def round4(c: Column, alias: str) -> Column:
    return F.round(c, 4).alias(alias)
