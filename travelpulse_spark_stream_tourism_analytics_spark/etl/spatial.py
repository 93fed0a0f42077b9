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
