"""File/YAML sink tests (reference S9/S10 artifact contracts)."""

from __future__ import annotations

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
