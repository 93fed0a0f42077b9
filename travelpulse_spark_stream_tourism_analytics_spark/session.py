"""SparkSession factory tuned for the engine.

The reference hardcodes ``spark.sql.shuffle.partitions=4`` for its toy
cluster (reference spark/kafka_to_metrics.py:148). We instead enable
AQE so Spark coalesces/splits shuffle partitions at runtime — the same
code then scales from local[32] test runs to a 1000-executor cluster
without retuning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "travelpulse-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-ready defaults.

    - AQE on: runtime partition coalescing, skew-join splitting and
      dynamic join-strategy switching replace hand-tuned partition
      counts.
    - UTC session timezone: deterministic window/date semantics
      regardless of host locale (events carry naive UTC timestamps).
    - Arrow on: vectorized pandas interchange for the few Pandas-UDF
      operators.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE rewrite a sort-merge join to shuffled-hash at
        # runtime when the build side's ACTUAL post-shuffle partitions
        # fit a local hash map (default 0 = never). Guide §3.1: SMJ
        # pays a full sort of BOTH sides; for joins whose probe side
        # is a row-heavy fan-out over a compact build relation (the
        # near-dup jaccard verify shuffles a 166M-row fan-out at the
        # sf1 soak against a 5M-row shingle table) the sort dominates
        # — measured 21.8 -> ~11 s at 32 cores. Runtime sizes, not
        # estimates, gate the rewrite, and broadcast selection is
        # unaffected; 64 MB/partition bounds per-task build memory.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP_MAX", str(64 * 1024 * 1024)),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Snappy parquet decompresses ~4-8x, so the 128 MB default can
        # hand one task a multi-GB in-memory partition — and on small
        # clusters/fixtures it starves scan parallelism outright (the
        # sf1 soak read a 50k-doc table as TWO partitions, running
        # expression-heavy projections on 2 of 32 cores: text profile
        # 23 s -> ~4 s with this setting). 32 MB is the common
        # compressed-parquet tuning; at real scale file counts dwarf
        # partition sizing and AQE coalescing absorbs the extra splits.
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        # Driver testdata stores events.ts as parquet TIMESTAMP(NANOS),
        # which Spark cannot read natively; read as long and convert in
        # the loader (plans/catalog.py load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # Bound driver-side status/listener retention. The defaults
        # retain 1000 SQL executions (each holding the full physical
        # plan graph + per-operator metrics — multi-MB apiece for this
        # engine's merged union plans) and 1000 jobs / 100k tasks. A
        # long-lived driver that has executed a few hundred queries
        # accumulates GBs of live listener state; profiled on this
        # box, that state made HOF-heavy queries intermittently run
        # 2-6x their fresh-session steady state (headline bench total
        # 71 s -> 43 s with retention bounded, every entry back at its
        # isolated steady state — OPTIMIZATION_r10.md "Bench-context
        # JVM degradation"). Production-relevant for any long-running
        # driver (streaming topologies, query servers), not a
        # local-mode tune; env-overridable for operators who want
        # deeper history for debugging.
        .config(
            "spark.sql.ui.retainedExecutions",
            os.environ.get("SPARK_GRAFT_RETAINED_EXECUTIONS", "16"),
        )
        .config(
            "spark.ui.retainedJobs",
            os.environ.get("SPARK_GRAFT_RETAINED_JOBS", "200"),
        )
        .config(
            "spark.ui.retainedStages",
            os.environ.get("SPARK_GRAFT_RETAINED_STAGES", "200"),
        )
        .config(
            "spark.ui.retainedTasks",
            os.environ.get("SPARK_GRAFT_RETAINED_TASKS", "2000"),
        )
        # NOTE: deliberately NOT disabling
        # spark.sql.streaming.statefulOperator.checkCorrectness — the
        # engine's streaming shapes are all supported forms, and the
        # global session must keep Spark's fail-fast guard for user
        # queries.
        # Keep catalog/metastore artifacts out of the repo cwd.
        .config("spark.sql.warehouse.dir", "/tmp/tp_warehouse")
        .config("spark.driver.extraJavaOptions", "-Dderby.system.home=/tmp/tp_derby")
    )
    return builder.getOrCreate()
