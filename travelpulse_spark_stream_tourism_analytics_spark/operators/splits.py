"""Leakage-safe train/validation splitting.

Splitting a corpus doc-by-doc leaks: two near-duplicate documents can
land on opposite sides, and the model is then evaluated on (almost)
training data. The safe unit is the NEAR-DUP CLUSTER — every member
of a connected component (operators/components.py over the verified
near-dup pairs) goes to the same side.

The assignment is the engine's standard deterministic-hash split
(md5-hex threshold, like docs_stratified_sample): reproducible across
runs/engines, no RNG state, and a document ADDED to an existing
cluster later lands on that cluster's side automatically. One
broadcast-or-shuffle join of docs against the (tiny) component map;
singleton docs hash on their own id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_safe_split(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    component_col: str = "component",
    val_hex_prefixes: str = "012",
) -> DataFrame:
    """Append ``split`` ('train' | 'val') such that every doc in the
    same near-dup component gets the same side.

    ``components`` is (id, component) as produced by
    connected_components / connected_components_star — it covers only
    docs that HAVE a near-dup edge; uncovered docs form singleton
    groups keyed by their own id. ``val_hex_prefixes`` selects the val
    share in 16ths of the md5 key space ('012' -> 3/16 ~= 19%); the
    hex-threshold trick keeps the split engine-portable and exactly
    reproducible (no Bernoulli RNG)."""
    comp = components.select(
        F.col(id_col), F.col(component_col).alias("__grp")
    )
    grouped = docs.join(comp, id_col, "left").withColumn(
        "__grp", F.coalesce(F.col("__grp"), F.col(id_col))
    )
    first_hex = F.substring(F.md5(F.col("__grp").cast("string")), 1, 1)
    chars = [F.lit(c) for c in val_hex_prefixes]
    return grouped.withColumn(
        "split",
        F.when(first_hex.isin(*chars), F.lit("val")).otherwise(
            F.lit("train")
        ),
    ).drop("__grp")
