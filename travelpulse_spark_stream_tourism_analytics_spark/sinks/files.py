"""Batch output sinks (reference S9/S10, SURVEY.md §2.1).

Curated dimension artifacts (the reference's ``data/curated/*.csv``
and ``configs/hotels.yaml``) are driver-visible small outputs, so the
CSV writer offers a single-file mode; fact-scale outputs go through
the partitioned parquet writer instead (never coalesce(1) a fact
table).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_curated_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """Header CSV for curated dims (reference
    scripts/clean_cities_geonames.py:105,114). single_file=True matches
    the reference's one-artifact contract — only for dimension-sized
    outputs."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: Sequence[str] = ()
) -> None:
    """Partitioned parquet for anything fact-sized: partition columns
    enable partition pruning for every downstream reader."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(
    df: DataFrame, path: str, partition_by: Sequence[str] = ()
) -> None:
    """ORC twin of :func:`write_parquet` for lakes standardized on ORC
    (Hive-heritage warehouses). Same contract: partition columns enable
    partition pruning; ORC carries its own column statistics, so
    predicate pushdown and column pruning work exactly as on parquet
    (pinned in tests/test_sinks.py::test_orc_roundtrip_and_pushdown).
    ZLIB is Spark's default ORC codec; we pin snappy for read-speed
    parity with the parquet path."""
    w = df.write.mode("overwrite").option("compression", "snappy")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_yaml(df: DataFrame, path: str, root_key: str = "items") -> None:
    """YAML config artifact (reference
    scripts/build_hotels_yaml.py:294-330): driver-side collect of a
    dimension-sized DataFrame. Uses PyYAML when importable, else a
    minimal built-in emitter (flat scalar mappings only)."""
    rows = [r.asDict(recursive=True) for r in df.collect()]
    payload = {root_key: rows}
    try:
        import yaml

        text = yaml.safe_dump(payload, allow_unicode=True, sort_keys=False)
    except ImportError:
        text = _mini_yaml(payload)
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)


def _mini_yaml(payload: dict) -> str:
    """Tiny YAML emitter for {key: [flat dicts]} payloads."""

    def scalar(v) -> str:
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return repr(v)
        s = str(v)
        if s == "" or any(c in s for c in ":#{}[]&*!|>'\"%@`\n") or s != s.strip():
            return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
        return s

    lines: list[str] = []
    for key, rows in payload.items():
        lines.append(f"{key}:")
        for row in rows:
            prefix = "- "
            for k, v in row.items():
                lines.append(f"  {prefix}{k}: {scalar(v)}")
                prefix = "  "
    return "\n".join(lines) + "\n"
