"""Small-file compaction and sort-clustered layout for parquet lakes.

At 100 TB the dominant lake pathology is not query shape but LAYOUT:
streaming sinks and over-parallel writers leave millions of KB-scale
files, so every scan pays per-file open/footer costs and the driver
pays O(files) listing; and unsorted files have useless row-group
min/max statistics, so predicate pushdown cannot skip anything.

``compact_parquet`` fixes both in one pass:

* sizes the output file count from the MEASURED input bytes against a
  target file size (128 MB default — matches
  ``spark.sql.files.maxPartitionBytes`` so one file ≈ one scan task);
* without a sort key it uses ``coalesce`` (narrow, shuffle-free — the
  scale-friendly default for pure bin-packing);
* with ``sort_by`` it range-repartitions and sorts within partitions,
  so every output file covers a DISJOINT key range and its row-group
  min/max statistics actually prune (the 1-D special case of Z-order
  clustering; tests assert disjointness from the parquet footers).

File sizes come from a filesystem listing: the local/posix path uses
``os`` directly; any other scheme goes through the Hadoop FileSystem
API, which requires a classic (non-Connect) session — same guarded
pattern as operators/sketches.py.
"""

from __future__ import annotations

import math
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _list_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file under ``path`` (recursive,
    hidden/_SUCCESS excluded)."""
    local = path
    if local.startswith("file:"):
        local = local[len("file:") :]
    if os.path.isdir(local):
        out: list[tuple[str, int]] = []
        for root, _dirs, names in os.walk(local):
            for n in names:
                if n.startswith(("_", ".")):
                    continue
                p = os.path.join(root, n)
                out.append((p, os.path.getsize(p)))
        return sorted(out)
    try:  # non-local scheme: Hadoop FS (classic session only)
        jvm = spark.sparkContext._jvm  # noqa: SLF001
        hconf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(hconf)
        it = fs.listFiles(jpath, True)
        out = []
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            out.append((st.getPath().toString(), st.getLen()))
        return sorted(out)
    except Exception as exc:  # pragma: no cover - non-local schemes only
        raise NotImplementedError(
            "file listing for non-posix paths needs a classic Spark "
            "session (Hadoop FileSystem API); under Spark Connect pass "
            "a local staging path instead"
        ) from exc


def layout_stats(spark: SparkSession, path: str) -> dict:
    """Layout health of a parquet directory: file count, total/min/max/
    mean bytes, and the count of files under 10% of the target size
    (the 'small file' population a compaction would fold)."""
    files = _list_files(spark, path)
    sizes = [s for _, s in files]
    total = sum(sizes)
    return {
        "n_files": len(sizes),
        "total_bytes": total,
        "min_bytes": min(sizes) if sizes else 0,
        "max_bytes": max(sizes) if sizes else 0,
        "mean_bytes": (total // len(sizes)) if sizes else 0,
        "n_small": sum(1 for s in sizes if s < DEFAULT_TARGET_BYTES // 10),
    }


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    sort_by: Sequence[str] = (),
    zorder_by: Sequence[str] = (),
    max_files: int = 100_000,
) -> dict:
    """Rewrite ``src`` into ``dst`` with ~``target_file_bytes`` files.

    Returns ``{"before": stats, "after": stats, "n_output_files": k}``.
    Row-for-row lossless (asserted in tests). With ``sort_by`` the
    output is range-clustered on those columns: file key ranges are
    disjoint, so parquet min/max stats prune at read time. With
    ``zorder_by`` (2-4 NUMERIC columns, mutually exclusive with
    ``sort_by``) the rewrite is the lakehouse ``OPTIMIZE ZORDER BY``:
    each column is affinely mapped onto a 16-bit Morton lane using its
    observed min/max (one tiny agg), and files cluster along the
    space-filling curve — min/max stats then prune on ANY of the
    columns, not just the leading sort key.

    ``max_files`` guards against a degenerate tiny target creating a
    pathological partition count (the pathology this tool exists to
    fix); 100k files × 128 MB ≈ 12 TB per compaction run — shard a
    bigger lake by partition directory instead.
    """
    if sort_by and zorder_by:
        raise ValueError("compact_parquet: sort_by and zorder_by conflict")
    before = layout_stats(spark, src)
    n_out = max(1, math.ceil(before["total_bytes"] / max(1, target_file_bytes)))
    n_out = min(n_out, max_files)
    df: DataFrame = spark.read.parquet(src)
    if zorder_by:
        from pyspark.sql import functions as F

        from travelpulse_spark_stream_tourism_analytics_spark.operators.layout import (
            normalize_u16,
            zorder_layout,
        )

        missing = [c for c in zorder_by if c not in df.columns]
        if missing:
            raise ValueError(f"compact_parquet: zorder_by columns {missing} "
                             f"not in {df.columns}")
        # try_cast: under ANSI a plain cast THROWS mid-agg on the first
        # non-numeric string; the null-bounds check below is the
        # intended clear error instead
        bounds = df.agg(
            *[
                f
                for c in zorder_by
                for f in (
                    F.min(F.col(c).try_cast("double")).alias(f"__lo_{c}"),
                    F.max(F.col(c).try_cast("double")).alias(f"__hi_{c}"),
                )
            ]
        ).collect()[0]
        bad = [
            c
            for c in zorder_by
            if bounds[f"__lo_{c}"] is None
            or bounds[f"__hi_{c}"] is None
            or bounds[f"__hi_{c}"] != bounds[f"__hi_{c}"]  # NaN
        ]
        if bad:
            raise ValueError(
                f"compact_parquet: zorder_by columns {bad} have no "
                "numeric values (all-null, non-numeric, or empty input) "
                "— zorder lanes need observable min/max"
            )
        dims = [
            normalize_u16(
                F.col(c),
                bounds[f"__lo_{c}"],
                # +1 ulp-ish headroom so the max value lands in lane
                # 65535 instead of clamping a degenerate hi == lo span
                bounds[f"__hi_{c}"] + max(1e-9, abs(bounds[f"__hi_{c}"]) * 1e-12),
            )
            for c in zorder_by
        ]
        df = zorder_layout(df, dims, n_files=n_out)
    elif sort_by:
        # range shuffle gives disjoint per-file key ranges; the sort
        # inside each partition orders row groups for fine-grained
        # min/max skipping within the file too.
        df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        # narrow path: fold existing partitions without a shuffle.
        df = df.coalesce(n_out)
    df.write.mode("overwrite").parquet(dst)
    after = layout_stats(spark, dst)
    return {"before": before, "after": after, "n_output_files": after["n_files"]}
