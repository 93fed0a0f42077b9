"""Custom stateful operator: state must carry across micro-batches."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.schemas import WIRE_SCHEMA
from travelpulse_spark_stream_tourism_analytics_spark.streaming.stateful import (
    running_user_totals,
)


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    data_dir = tmp_path / "wire"
    data_dir.mkdir()
    # Two files -> two micro-batches (maxFilesPerTrigger=1).
    for i, batch in enumerate(
        [
            [("u1", 10.0), ("u1", 5.0), ("u2", 1.0)],
            [("u1", 2.5), ("u2", 1.5)],
        ]
    ):
        with open(data_dir / f"f{i}.json", "w") as f:
            for key, v in batch:
                f.write(
                    json.dumps(
                        {
                            "key": key,
                            "value": json.dumps({"v": v}),
                            "kafka_ts": f"2024-06-01T12:0{i}:00.000Z",
                        }
                    )
                    + "\n"
                )

    stream = (
        spark.readStream.schema(WIRE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(data_dir))
        .select(
            F.col("key"),
            F.get_json_object("value", "$.v").cast("double").alias("v"),
        )
    )
    emitted = []
    q = (
        running_user_totals(stream, "key", "v")
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: emitted.append((bid, df.collect())))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    finals = {}
    for _, rows in emitted:
        for r in rows:
            finals[r["key"]] = (r["total_events"], r["total_value"])
    # Cumulative across both batches, not per-batch.
    assert finals["u1"] == (3, 17.5)
    assert finals["u2"] == (2, 2.5)
    assert len(emitted) >= 2  # state actually crossed a batch boundary
