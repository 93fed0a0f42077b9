"""Numeric Column expressions (JVM-side, codegen-friendly; no UDFs).

Determinism notes for oracle parity: double summation is
order-dependent, so money-style sums accumulate in ``decimal(18,2)``
(exact, associative) and only the final result is cast to double —
bit-identical regardless of partitioning, shuffle order, or engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(col: Column | str, alias: str | None = None) -> Column:
    """Exact sum of a 2-decimal monetary double, returned as double.

    Partition-order independent (decimal accumulation), hence safe for
    hash comparison against any other engine and stable at any scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast("decimal(18,2)")).cast("double")
    return out.alias(alias) if alias else out


def money_avg(col: Column | str, alias: str | None = None) -> Column:
    """Exact-sum / count average of a 2-decimal monetary double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast("decimal(18,2)")).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def safe_ratio(num: Column, den: Column, scale: int = 6) -> Column:
    """num/den guarded against zero denominators, rounded for stability.

    Mirrors the reference's cancel-rate guard
    (reference spark/kafka_to_metrics.py:431 — ``when(total>0)``).
    """
    return F.round(F.when(den > 0, num / den).otherwise(F.lit(None)), scale)


def minmax_norm(col: Column, lo: Column, hi: Column, eps: float = 1e-9) -> Column:
    """clip((x-lo)/(hi-lo), 0, 1); degenerate span -> 0.5.

    Same semantics as the reference's normalization guard
    (reference spark/kafka_to_metrics.py:478-481).
    """
    span = hi - lo
    scaled = (col - lo) / span
    clipped = F.least(F.lit(1.0), F.greatest(F.lit(0.0), scaled))
    return F.when(span < F.lit(eps), F.lit(0.5)).otherwise(clipped)


def locale_numeric(col: Column) -> Column:
    """Parse an Italian/European-locale numeric string to double.

    Strips NBSP and spaces, drops ``.`` thousands separators, converts
    decimal ``,`` to ``.``; unparseable input becomes NULL (try_cast ≡
    pandas ``errors='coerce'``). Reference semantics:
    scripts/istat_utils.py:39-45, scripts/clean_istat_commuting.py:34-41.
    """
    cleaned = F.regexp_replace(col, "[ \\s]", "")
    cleaned = F.regexp_replace(cleaned, "\\.", "")
    cleaned = F.regexp_replace(cleaned, ",", ".")
    return cleaned.try_cast("double")
