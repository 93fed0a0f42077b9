"""EN↔IT city-name alias mapping (reference F3,
scripts/rebuild_and_merge_cities_it.py:74-78,94-95): exonym lookups
used as an extra fallback key in the merge cascade. Public geographic
name pairs."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
    fold_accents,
)

EN_TO_IT = {
    "rome": "roma",
    "milan": "milano",
    "naples": "napoli",
    "florence": "firenze",
    "venice": "venezia",
    "turin": "torino",
    "genoa": "genova",
    "padua": "padova",
    "syracuse": "siracusa",
    "leghorn": "livorno",
}


def alias_key(name: Column) -> Column:
    """Normalized name with English exonyms rewritten to Italian — the
    loose key for a later stage of staged_fallback_merge."""
    items = []
    for en, it in EN_TO_IT.items():
        items += [F.lit(en), F.lit(it)]
    mapping = F.create_map(*items)
    folded = fold_accents(name)
    return F.coalesce(F.element_at(mapping, folded), folded)
