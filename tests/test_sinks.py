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
