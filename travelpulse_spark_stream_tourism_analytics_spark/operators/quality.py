"""Data-quality report operators (reference SURVEY.md §2.5 A13/A14,
§2.6 T4: row-wise missingness scores and top-missing reports,
scripts/rebuild_and_merge_cities_it.py:301-319)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def missingness_score(cols: Sequence[str]) -> Column:
    """Number of NULLs across `cols` (pandas isna().sum(axis=1))."""
    terms = [F.when(F.col(c).isNull(), 1).otherwise(0) for c in cols]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def any_notnull(cols: Sequence[str]) -> Column:
    """Boolean OR of non-nullness per source group (A14)."""
    cond = F.col(cols[0]).isNotNull()
    for c in cols[1:]:
        cond = cond | F.col(c).isNotNull()
    return cond


def top_missing_report(
    df: DataFrame,
    check_cols: Sequence[str],
    rank_col: str,
    n: int = 500,
    id_cols: Sequence[str] = (),
) -> DataFrame:
    """Worst-N rows by (missing count desc, rank_col desc) — the
    reference's unmatched_top500.csv artifact (T4)."""
    scored = df.withColumn("missing_count", missingness_score(check_cols))
    return (
        scored.filter(F.col("missing_count") > 0)
        .orderBy(F.desc("missing_count"), F.desc(rank_col), *[F.asc(c) for c in id_cols])
        .limit(n)
    )
