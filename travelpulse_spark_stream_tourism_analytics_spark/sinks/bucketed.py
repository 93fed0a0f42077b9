"""Bucketed-table writer: pre-shuffle once, join forever shuffle-free.

At 100 TB the dominant cost of repeated fact-fact joins is the shuffle
on the join key. Writing both sides bucketed by that key (same bucket
count) lets Spark plan a sort-merge join with NO Exchange on either
side — the shuffle is paid once at write time. The reference never
needs this (its facts fit a toy cluster), but it is the standard scale
pattern this engine is designed around (SURVEY.md scale goals).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table.

    Idempotent: drops the table and any orphaned warehouse location
    first (a crashed prior run leaves the directory without the
    metastore entry, which saveAsTable refuses to overwrite).
    """
    import os
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    warehouse = warehouse.removeprefix("file:")
    if warehouse:
        shutil.rmtree(
            os.path.join(warehouse, table.split(".")[-1]), ignore_errors=True
        )
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.format("parquet").saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> tuple[DataFrame, bool]:
    """Join two bucketed tables as a sort-merge join and report whether
    the plan needs a shuffle (diagnostic used by tests/bench).

    The merge hint stands in for the fact-fact case: small test tables
    would otherwise auto-broadcast, which bypasses bucketing entirely
    (also the right outcome — bucketing only matters when both sides
    are too big to broadcast)."""
    joined = spark.table(left_table).hint("merge").join(
        spark.table(right_table).hint("merge"), on
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return joined, "Exchange hashpartitioning" not in plan
