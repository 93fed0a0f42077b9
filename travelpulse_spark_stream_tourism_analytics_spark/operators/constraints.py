"""Declarative data-quality constraints.

Generalizes the reference's scattered runtime asserts (SURVEY.md §5:
region whitelist after merge, "still not an integer!" dtype raise,
ratio∈[0,1] sanity counters) into one operator: declare named row
predicates, get back violation counts (one aggregate pass) and
optionally fail the job. One job, partial-aggregated — no per-check
scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ConstraintViolation(AssertionError):
    pass


def check_constraints(
    df: DataFrame,
    constraints: dict[str, Column],
    raise_on_violation: bool = False,
) -> dict[str, int]:
    """Evaluate named row-level predicates in a single aggregate pass.

    Returns {name: violation_count} (rows where the predicate is false
    or NULL — NULL counts as a violation, matching assert semantics).
    """
    aggs = [
        F.sum(
            F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
        ).alias(name)
        for name, pred in constraints.items()
    ]
    row = df.agg(*aggs).collect()[0]
    result = {name: int(row[name] or 0) for name in constraints}
    if raise_on_violation:
        bad = {k: v for k, v in result.items() if v > 0}
        if bad:
            raise ConstraintViolation(f"constraint violations: {bad}")
    return result


def region_whitelist(col: Column, allowed: list[str]) -> Column:
    """The reference's post-merge region assert
    (scripts/rebuild_and_merge_cities_it.py:141,321)."""
    return col.isin(*allowed)


def ratio_bounds(col: Column, lo: float = 0.0, hi: float = 1.0) -> Column:
    return col.isNull() | ((col >= lo) & (col <= hi))


def unique_key(df: DataFrame, *keys: str) -> int:
    """Duplicate-key count (reference's dupe_city_ids counter)."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > 1)
        .count()
    )
