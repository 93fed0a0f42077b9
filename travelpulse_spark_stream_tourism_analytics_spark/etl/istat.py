"""ISTAT-style long-table cleaning chain.

The reference's batch ETL resolves columns *dynamically* — candidate
name lists and regex fallbacks instead of fixed schemas
(``find_col`` scripts/istat_utils.py:28-37, ``first_present``/
``any_column_like`` scripts/build_hotels_yaml.py:57-71) — then
coerces locale numerics, keeps the latest survey year, collapses
duplicates, and pivots metric codes to columns
(scripts/clean_istat_commuting.py, scripts/clean_istat_abitazioni.py).
This module composes those operators into the same observable chain,
Spark-first: the discovery "pre-pass" the reference does with a
separate chunked scan collapses into column metadata + one
window-filtered scan (SURVEY.md §4.1 last row).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from travelpulse_spark_stream_tourism_analytics_spark.functions.numeric import (
    locale_numeric,
)


def find_col(
    df: DataFrame, candidates: Sequence[str], like: str | None = None
) -> str | None:
    """Resolve a column by exact candidate names (case-insensitive),
    else by regex (reference find_col + any_column_like)."""
    lower = {c.lower(): c for c in df.columns}
    for cand in candidates:
        if cand.lower() in lower:
            return lower[cand.lower()]
    if like:
        pat = re.compile(like, re.IGNORECASE)
        for c in df.columns:
            if pat.search(c):
                return c
    return None


def resolve_columns(
    df: DataFrame, spec: dict[str, tuple[Sequence[str], str | None]]
) -> DataFrame:
    """Rename discovered columns to canonical names.

    spec: {canonical: ([candidates...], like_regex_or_None)}.
    Missing columns raise — the chain's contract is explicit.
    """
    out = df
    for canonical, (candidates, like) in spec.items():
        found = find_col(df, candidates, like)
        if found is None:
            raise ValueError(
                f"cannot resolve column {canonical!r} from {df.columns}"
            )
        if found != canonical:
            out = out.withColumnRenamed(found, canonical)
    return out


ISTAT_SPEC = {
    "code": (["ITTER107", "codice", "territory_code"], r"^itter|cod"),
    "name": (["Territorio", "comune", "territory"], r"terri|comune"),
    "metric": (["TIPO_DATO", "metric", "data_type"], r"tipo|metric"),
    "period": (["TIME", "anno", "period"], r"time|anno|period"),
    "value": (["Value", "valore", "obs_value"], r"^val|obs"),
}


def clean_istat_long(
    raw: DataFrame,
    metrics_keep: Sequence[str],
    spec: dict | None = None,
) -> DataFrame:
    """Long ISTAT table -> wide per-territory metrics.

    Chain: resolve columns (dynamic schema) -> extract survey year
    (regex with lookarounds, reference F4) -> locale-coerce values
    (F5) -> keep latest year per (code, metric) (T3) -> collapse
    duplicates with max (A11) -> pivot metric codes wide (A10).
    """
    df = resolve_columns(raw, spec or ISTAT_SPEC)
    df = df.select(
        F.col("code"),
        F.col("name"),
        F.col("metric"),
        F.regexp_extract(F.col("period"), r"(?<!\d)(19|20)(\d{2})(?!\d)", 0)
        .try_cast("int")
        .alias("year"),
        locale_numeric(F.col("value")).alias("value"),
    ).filter(F.col("metric").isin(*metrics_keep) & F.col("year").isNotNull())

    # max(year) filter, NOT row_number: when several rows share the
    # latest year, all must survive into the max-collapse below (a
    # row_number tie would keep one arbitrary row nondeterministically).
    latest = Window.partitionBy("code", "metric")
    df = df.withColumn("__max_year", F.max("year").over(latest)).filter(
        F.col("year") == F.col("__max_year")
    ).drop("__max_year")

    collapsed = df.groupBy("code", "name", "metric").agg(F.max("value").alias("v"))
    return (
        collapsed.groupBy("code", "name")
        .pivot("metric", list(metrics_keep))
        .agg(F.max("v"))
    )
