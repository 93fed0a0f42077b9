"""File/YAML sink tests (reference S9/S10 artifact contracts)."""

from __future__ import annotations

import os

import glob

from travelpulse_spark_stream_tourism_analytics_spark.sinks.files import (
    _mini_yaml,
    write_curated_csv,
    write_parquet,
    write_yaml,
)


def test_write_curated_csv_single_file(spark, tmp_path):
    df = spark.createDataFrame([(1, "Roma"), (2, "Milano")], "city_id long, name string")
    out = str(tmp_path / "cities_csv")
    write_curated_csv(df, out)
    parts = glob.glob(f"{out}/part-*.csv")
    assert len(parts) == 1  # curated single-artifact contract
    text = open(parts[0]).read()
    assert text.splitlines()[0] == "city_id,name"
    assert "1,Roma" in text


def test_write_parquet_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, grp string, v double"
    )
    out = str(tmp_path / "part_parquet")
    write_parquet(df, out, partition_by=["grp"])
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert glob.glob(f"{out}/grp=a/*.parquet")  # partition pruning layout


def test_write_yaml_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("h1", "Hotel: Roma", 4.5, None)], "id string, name string, stars double, note string"
    )
    out = str(tmp_path / "hotels.yaml")
    write_yaml(df, out, root_key="hotels")
    text = open(out).read()
    assert "hotels:" in text
    assert "4.5" in text
    # colon-containing value must be quoted regardless of emitter
    assert '"Hotel: Roma"' in text or "'Hotel: Roma'" in text


def test_mini_yaml_scalars():
    text = _mini_yaml({"items": [{"a": None, "b": True, "c": 1, "d": "x:y"}]})
    assert "a: null" in text
    assert "b: true" in text
    assert '"x:y"' in text


def test_schema_evolution_mergeschema_read(spark, tmp_path):
    """A 100 TB lake accretes columns over time: older partitions lack
    the new column, and a merged-schema read must surface it as NULL
    for old files rather than failing or silently dropping it."""
    from pyspark.sql import functions as F

    old = spark.range(5).select(
        F.col("id").alias("k"), F.lit("v1").alias("a")
    )
    old.write.mode("overwrite").parquet(str(tmp_path / "t" / "batch=1"))
    new = spark.range(5, 10).select(
        F.col("id").alias("k"),
        F.lit("v2").alias("a"),
        F.lit(3.14).alias("score"),
    )
    new.write.mode("overwrite").parquet(str(tmp_path / "t" / "batch=2"))

    merged = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path / "t")
    )
    assert set(merged.columns) == {"k", "a", "score", "batch"}
    rows = {r["k"]: r for r in merged.collect()}
    assert rows[0]["score"] is None and rows[7]["score"] == 3.14
    # Without mergeSchema the footer-sampled schema may miss the new
    # column — the option is the contract, pinned here.
    assert merged.count() == 10


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC is a first-class lake format: round-trips values, prunes
    partitions, and pushes filters/projections into the scan just like
    parquet (write_orc docstring contract)."""
    from travelpulse_spark_stream_tourism_analytics_spark.sinks.files import write_orc

    df = spark.range(0, 1000).selectExpr(
        "id", "id % 7 AS grp", "CAST(id * 1.5 AS DOUBLE) AS v",
        "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS par",
    )
    out = str(tmp_path / "orc_lake")
    write_orc(df, out, partition_by=["par"])

    back = spark.read.orc(out)
    assert back.count() == 1000
    assert {r["grp"] for r in back.select("grp").distinct().collect()} == set(range(7))

    q = back.filter("par = 'even' AND id > 900").select("id", "v")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the par predicate lands in PartitionFilters
    assert "PartitionFilters:" in plan
    assert "par" in plan.split("PartitionFilters:")[1][:120]
    # predicate pushdown + column pruning reach the ORC scan
    scan = [ln for ln in plan.splitlines() if "Scan orc" in ln or "FileScan orc" in ln]
    assert scan, plan
    assert "PushedFilters: [" in plan and "id" in plan.split("PushedFilters:")[1][:120]
    rows = q.collect()
    assert sorted(r["id"] for r in rows) == [902, 904, 906, 908, 910, 912,
                                            914, 916, 918, 920, 922, 924,
                                            926, 928, 930, 932, 934, 936,
                                            938, 940, 942, 944, 946, 948,
                                            950, 952, 954, 956, 958, 960,
                                            962, 964, 966, 968, 970, 972,
                                            974, 976, 978, 980, 982, 984,
                                            986, 988, 990, 992, 994, 996, 998]


def test_compact_parquet_folds_small_files_losslessly(spark, tmp_path):
    """100 tiny files -> a handful of target-sized files, same rows."""
    from travelpulse_spark_stream_tourism_analytics_spark.sinks.compaction import (
        compact_parquet,
        layout_stats,
    )

    src = str(tmp_path / "small_files")
    dst = str(tmp_path / "compacted")
    spark.range(0, 20_000).selectExpr(
        "id", "md5(CAST(id AS STRING)) AS payload"
    ).repartition(100).write.parquet(src)

    before = layout_stats(spark, src)
    assert before["n_files"] == 100
    assert before["n_small"] == 100  # all far below the 128 MB target

    report = compact_parquet(spark, src, dst, target_file_bytes=before["total_bytes"] // 3)
    assert 3 <= report["n_output_files"] <= 5  # ceil(total/target) +- writer rounding
    a = spark.read.parquet(dst)
    b = spark.read.parquet(src)
    assert a.count() == 20_000
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compact_parquet_sorted_layout_gives_disjoint_file_ranges(spark, tmp_path):
    """sort_by clusters: every output file covers a disjoint id range
    (read straight from the parquet footers), so min/max stats prune."""
    import glob

    import pyarrow.parquet as papq

    from travelpulse_spark_stream_tourism_analytics_spark.sinks.compaction import (
        compact_parquet,
    )

    src = str(tmp_path / "unsorted")
    dst = str(tmp_path / "clustered")
    # shuffled ids: every input file spans nearly the whole id domain
    spark.range(0, 50_000).selectExpr(
        "id", "md5(CAST(id AS STRING)) AS payload"
    ).orderBy("payload").repartition(20).write.parquet(src)

    from travelpulse_spark_stream_tourism_analytics_spark.sinks.compaction import (
        layout_stats,
    )

    target = layout_stats(spark, src)["total_bytes"] // 6
    report = compact_parquet(spark, src, dst, target_file_bytes=target,
                             sort_by=["id"])
    assert report["n_output_files"] > 1

    ranges = []
    for f in glob.glob(f"{dst}/part-*.parquet"):
        md = papq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # id is column 0
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"file ranges overlap: {ranges}"
    # and the union still covers the whole domain
    assert ranges[0][0] == 0 and ranges[-1][1] == 49_999


def test_compact_cli_mode(spark, tmp_path, capsys, monkeypatch):
    """run_pipeline --mode compact end to end through argv."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import run_pipeline

    src = str(tmp_path / "lake")
    dst = str(tmp_path / "lake_c")
    spark.range(0, 5000).selectExpr(
        "id", "md5(CAST(id AS STRING)) AS payload"
    ).repartition(40).write.parquet(src)

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "compact", "--path", src,
         "--out", dst, "--target-mb", "1", "--sort-by", "id"],
    )
    run_pipeline.main()
    out = capsys.readouterr().out
    assert ">>> compacted; 40 files" in out
    back = spark.read.parquet(dst)
    assert back.count() == 5000


def test_snapshot_version_retention(tmp_path):
    """TwoPhaseSeasonScore prunes old v{batch} snapshot dirs, keeping
    the current one plus one predecessor for in-flight readers."""
    import os

    from travelpulse_spark_stream_tourism_analytics_spark.streaming.pipeline import (
        TwoPhaseSeasonScore,
    )

    staging = str(tmp_path / "staging")
    scorer = TwoPhaseSeasonScore(None, staging, sink=None)
    base = os.path.join(staging, "bookings_cs")
    for b in range(5):
        os.makedirs(os.path.join(base, f"v{b}"))
    scorer._prune_versions("bookings_cs")
    assert sorted(os.listdir(base)) == ["v3", "v4"]
    # nothing to prune / missing dir are both no-ops
    scorer._prune_versions("bookings_cs")
    scorer._prune_versions("weather_cs")


def test_compact_parquet_zorder_prunes_on_both_columns(spark, tmp_path):
    """--zorder-by: the rewrite clusters along the Morton curve, so a
    box predicate on EITHER column prunes most output files by min/max
    stats — the property a single-column sort gives only its leading
    key. Lossless, and mutually exclusive with sort_by."""
    import random

    import pyarrow.parquet as pq
    import pytest as _pytest
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.sinks.compaction import (
        compact_parquet,
    )

    rng = random.Random(5)
    rows = [(rng.randrange(100000), rng.uniform(0, 1000), i)
            for i in range(30000)]
    src, dst = str(tmp_path / "src"), str(tmp_path / "zdst")
    df = spark.createDataFrame(rows, "a long, b double, payload long")
    df.repartition(12).write.parquet(src)

    report = compact_parquet(
        spark, src, dst,
        target_file_bytes=40_000,  # ~12 output files at this size
        zorder_by=["a", "b"],
    )
    assert report["n_output_files"] >= 6

    back = spark.read.parquet(dst)
    assert back.count() == 30000
    assert back.agg(F.sum("payload")).collect()[0][0] == sum(
        r[2] for r in rows
    )

    def overlap(col, lo, hi):
        import glob

        files = sorted(glob.glob(f"{dst}/part-*.parquet"))
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            for g in range(md.num_row_groups):
                stats = {
                    md.row_group(g).column(c).path_in_schema:
                        md.row_group(g).column(c).statistics
                    for c in range(md.row_group(g).num_columns)
                }
                s = stats[col]
                if s.min <= hi and s.max >= lo:
                    hit += 1
                    break
        return hit / len(files)

    # ~10%-of-axis boxes: each single-column band must skip a majority
    # of files under the Z layout (a random layout overlaps ~100%)
    assert overlap("a", 40000, 50000) <= 0.7
    assert overlap("b", 400.0, 500.0) <= 0.7

    with _pytest.raises(ValueError, match="conflict"):
        compact_parquet(
            spark, src, str(tmp_path / "x"),
            sort_by=["a"], zorder_by=["a", "b"],
        )


def test_compact_zorder_rejects_unusable_columns(spark, tmp_path):
    import pytest as _pytest

    from travelpulse_spark_stream_tourism_analytics_spark.sinks.compaction import (
        compact_parquet,
    )

    src = str(tmp_path / "src2")
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "a long, name string"
    ).write.parquet(src)
    with _pytest.raises(ValueError, match="no numeric values"):
        compact_parquet(spark, src, str(tmp_path / "o1"),
                        zorder_by=["a", "name"])
    with _pytest.raises(ValueError, match="not in"):
        compact_parquet(spark, src, str(tmp_path / "o2"),
                        zorder_by=["a", "typo"])
