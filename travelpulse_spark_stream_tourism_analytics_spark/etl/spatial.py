"""Spatial greedy dedup — the one genuinely UDF-shaped operator in the
reference (SURVEY.md §2.9): within each (city, normalized-name) group,
drop points within `radius_m` of an already-kept point, greedy
keep-first in deterministic order (reference
scripts/build_hotels_yaml.py:261-283, O(n²) pairwise haversine per
group).

Implemented as ``applyInPandas`` (Arrow-batched grouped map): the
pairwise loop only ever sees one small group, so the O(n²) is bounded
by group size while groups distribute across executors. For degenerate
giant groups, pre-bucket by a geohash cell first (the group key then
becomes (city, name, cell)).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

EARTH_RADIUS_M = 6371008.8


def _haversine_m(lat1, lon1, lat2, lon2) -> float:
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = p2 - p1
    dl = math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_M * math.asin(math.sqrt(a))


def radius_dedup(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    radius_m: float = 150.0,
) -> DataFrame:
    """Keep the first point (by id order) of every radius-cluster
    within each group; exact reference greedy semantics."""
    schema = T.StructType([f for f in df.schema.fields])

    def dedup_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        kept_idx: list[int] = []
        for i in range(len(pdf)):
            lat_i, lon_i = pdf.at[i, lat_col], pdf.at[i, lon_col]
            close = any(
                _haversine_m(lat_i, lon_i, pdf.at[j, lat_col], pdf.at[j, lon_col])
                < radius_m
                for j in kept_idx
            )
            if not close:
                kept_idx.append(i)
        return pdf.iloc[kept_idx]

    return df.groupBy(*group_cols).applyInPandas(dedup_group, schema)


def geohash_cell(lat_col, lon_col, precision_deg: float = 0.01):
    """Coarse spatial cell key (~1.1 km grid at precision 0.01°) as a
    codegen'd expression — the bucketing prefilter that keeps
    radius-style operators linear at scale."""
    from pyspark.sql import functions as F

    lat_cell = F.floor(lat_col / precision_deg).cast("long")
    lon_cell = F.floor(lon_col / precision_deg).cast("long")
    return F.concat_ws(":", lat_cell, lon_cell)


def bucketed_radius_dedup(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    radius_m: float = 150.0,
) -> DataFrame:
    """Scale path for radius_dedup: pre-bucket by a geohash cell larger
    than the radius so each applyInPandas group is one cell's points,
    bounding the O(n²) by cell occupancy instead of group size.

    Recall trade (documented): clusters straddling a cell border are
    deduped per cell — the same locality trade the LSH operators make.
    Cell size is 4x the radius so straddling is rare.
    """
    from pyspark.sql import functions as F

    precision_deg = max(4 * radius_m, 500.0) / 111_000.0
    with_cell = df.withColumn(
        "__cell", geohash_cell(F.col(lat_col), F.col(lon_col), precision_deg)
    )
    return radius_dedup(
        with_cell,
        group_cols=group_cols + ["__cell"],
        id_col=id_col,
        lat_col=lat_col,
        lon_col=lon_col,
        radius_m=radius_m,
    ).drop("__cell")
