"""Skew-mitigation operators.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these explicit forms cover the cases AQE cannot: heavily skewed
aggregation keys (one city producing most bookings) and broadcast-able
skewed joins where the hot key must be spread BEFORE the shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_col: str,
    n_salts: int = 16,
    sum_alias: str = "sum_value",
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase skew-safe aggregation: groupBy(keys + salt) spreads a
    hot key over n_salts reducers, then a second (tiny) aggregation
    folds the partials. Decimal accumulation keeps the two-phase sum
    bit-identical to the single-phase one.

    Equivalent results to ``groupBy(keys).agg(count, sum)`` — use when
    one key dominates (reference scenario: Roma bookings vs 500 small
    towns).
    """
    salt = (F.rand(seed=0) * n_salts).cast("int").alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.count("*").alias("__n"),
            F.sum(F.col(sum_col).cast("decimal(28,2)")).alias("__s"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias(count_alias),
        F.sum("__s").cast("double").alias(sum_alias),
    )


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed fact ⋈ small-ish dim when broadcasting is impossible:
    salt the fact side, explode the dim side n_salts ways, join on
    (key, salt). Shuffle partitions for the hot key fan out n_salts-
    fold. Prefer broadcast() when the dim fits; prefer AQE skew-join
    when on 3.2+ with AQE on — this is the explicit fallback."""
    salted_fact = skewed.withColumn(
        "__salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    exploded_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(exploded_dim, on=[key, "__salt"], how=how).drop("__salt")
