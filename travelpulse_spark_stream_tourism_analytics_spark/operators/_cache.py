"""Bounded operator-scoped caching.

Some multi-consumer operator pipelines (the Jaccard verify stage reads
the exploded shingle relation four times) are pathological both
without materialization (4x recomputation of an expensive lineage —
measured 15x slower at sf0.1) and with a forced shuffle (the exploded
relation is the widest data in the pipeline — 8x slower). ``persist``
is the right local-mode analogue of the stage materialization a
cluster pipeline would do to parquet — but a bare ``persist`` with no
``unpersist`` accumulates executor storage across calls (ADVICE r1).

``scoped_persist`` bounds that: each call SITE keeps at most one live
cached lineage — re-invoking the operator unpersists the previous
one — and ``clear_operator_caches()`` releases everything (bench.py
additionally calls ``spark.catalog.clearCache()`` between queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: dict[str, DataFrame] = {}


def scoped_persist(df: DataFrame, site: str) -> DataFrame:
    """Persist ``df``, releasing whatever the same site cached before."""
    prev = _LIVE.get(site)
    if prev is not None:
        try:
            # blocking: the default async unpersist leaves the old
            # blocks visible in storage for a while, which (a) makes
            # cache accounting racy and (b) lets Spark's cache manager
            # substitute the DYING cache into brand-new plans that
            # happen to match its lineage (observed as a flaky
            # InMemoryTableScan in plan-purity tests under suite load)
            prev.unpersist(blocking=True)
        except Exception:
            pass  # session of the previous cache may already be gone
    cached = df.persist()
    _LIVE[site] = cached
    return cached


def clear_operator_caches() -> None:
    """Unpersist every live operator cache (long-lived sessions)."""
    for df in _LIVE.values():
        try:
            df.unpersist(blocking=True)
        except Exception:
            pass
    _LIVE.clear()
