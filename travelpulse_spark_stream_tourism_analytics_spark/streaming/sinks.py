"""Pluggable streaming sinks.

The reference hard-wires a Prometheus Pushgateway POST into every
foreachBatch closure (reference spark/kafka_to_metrics.py:44-70,
:524-548). Here the text-exposition formatting is a pure function, the
HTTP transport is injectable, and any (metrics-dict producing) mapper
can be attached to any query — so tests capture pushes in memory and
production swaps in requests.post without code changes.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

MetricDict = dict[str, tuple[dict[str, str] | None, float]]


def format_prometheus(metrics: MetricDict) -> str:
    """Prometheus text exposition lines: ``name{k="v"} value``
    (exact format parity with reference spark/kafka_to_metrics.py:51-63,
    including float coercion and label ordering).

    Dict keys may carry a ``|discriminator`` suffix so one top-N push
    can hold N rows of the same metric family (the reference keys by
    family alone, so only the last row of a top-N survives one push —
    a bug-shaped quirk we fix); only the part before ``|`` is emitted.
    """
    def esc(v) -> str:
        # Prometheus exposition requires \\ " and newline escaping in
        # label values — data-driven labels (city/hotel names) flow
        # straight from input, and one bad name must not make the
        # gateway reject the whole POST body.
        return (
            str(v)
            .replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
        )

    lines: list[str] = []
    for mkey, (labels, value) in metrics.items():
        mname = mkey.split("|", 1)[0]
        try:
            val = float(value)
        except (TypeError, ValueError):
            continue
        if labels:
            label_str = ",".join(f'{k}="{esc(v)}"' for k, v in labels.items())
            lines.append(f"{mname}{{{label_str}}} {val}")
        else:
            lines.append(f"{mname} {val}")
    return "\n".join(lines) + "\n" if lines else ""


class PrometheusPushSink:
    """Pushgateway sink with an injectable poster.

    poster(url, body_bytes) -> None; defaults to requests.post with the
    reference's 3 s timeout when requests is importable, else a no-op
    (mirrors the reference's graceful degradation, :36-41).
    """

    def __init__(
        self,
        gateway_url: str = "http://localhost:9091",
        job_name: str = "tourism_stream",
        grouping_key: str = "instance",
        grouping_val: str = "local",
        poster: Callable[[str, bytes], Any] | None = None,
    ) -> None:
        self.url = (
            f"{gateway_url}/metrics/job/{job_name}/{grouping_key}/{grouping_val}"
        )
        if poster is None:
            try:
                import requests

                def poster(url: str, body: bytes) -> None:
                    requests.post(url, data=body, timeout=3).raise_for_status()

            except ImportError:  # pragma: no cover - container has requests
                def poster(url: str, body: bytes) -> None:
                    return None

        self.poster = poster

    def push(self, metrics: MetricDict) -> None:
        body = format_prometheus(metrics)
        if body:
            self.poster(self.url, body.encode("utf-8"))


class MemoryMetricSink:
    """Test sink: records every pushed metrics dict."""

    def __init__(self) -> None:
        self.pushes: list[MetricDict] = []

    def push(self, metrics: MetricDict) -> None:
        if metrics:
            self.pushes.append(metrics)

    def latest(self) -> MetricDict:
        merged: MetricDict = {}
        for p in self.pushes:
            merged.update(p)
        return merged


def foreach_metrics(
    mapper: Callable[[DataFrame], MetricDict], sink
) -> Callable[[DataFrame, int], None]:
    """Adapt a rows->metrics mapper into a foreachBatch function."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        metrics = mapper(batch_df)
        sink.push(metrics)

    return fn


def start_query(
    df: DataFrame,
    name: str,
    checkpoint_dir: str,
    foreach_fn: Callable[[DataFrame, int], None],
    mode: str = "update",
    trigger: dict | None = None,
):
    """Attach sink/mode/trigger/checkpoint and start (reference
    start_query, spark/kafka_to_metrics.py:552-562). trigger defaults
    to availableNow in tests or processingTime in production — pass
    e.g. {"processingTime": "10 seconds"} or {"availableNow": True}."""
    w = (
        df.writeStream.queryName(name)
        .outputMode(mode)
        .foreachBatch(foreach_fn)
        .option("checkpointLocation", checkpoint_dir)
    )
    w = w.trigger(**(trigger or {"processingTime": "10 seconds"}))
    return w.start()


def start_parquet_sink(
    df: DataFrame,
    name: str,
    path: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    partition_by: list[str] | None = None,
):
    """Exactly-once file sink: append-mode parquet with checkpointed
    offsets + file-commit log (an upgrade over the reference's
    at-least-once Pushgateway pushes — SURVEY.md §2.8 notes no
    exactly-once sink exists there)."""
    w = (
        df.writeStream.queryName(name)
        .format("parquet")
        .outputMode("append")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w.trigger(**(trigger or {"processingTime": "10 seconds"})).start()
