"""Distribution-drift monitoring between corpus snapshots.

Population Stability Index over a numeric column: the standard
ingest-batch drift alarm a training-data pipeline runs between
yesterday's corpus and today's (quality-score drift, token-count
drift, embedding-norm drift). PSI = sum_b (p_b - q_b) * ln(p_b / q_b)
over buckets fixed from the BASELINE's quantiles; the conventional
alert thresholds are 0.1 (investigate) / 0.25 (act).

Scale shape: bucket edges come from one exact-percentile aggregation
over the baseline (`n_buckets` is a bounded contract, like quantizer
sizes); both snapshots then bucket with a plan-constant CASE chain and
aggregate with one partial-agg shuffle each — no join, no sort, no
driver data beyond the edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def quantile_edges(
    base: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    approx: bool = False,
    accuracy: int = 10_000,
) -> list:
    """Interior bucket edges: the baseline's k/n quantiles.

    ``approx=False`` (default): exact ``percentile`` — deterministic,
    so two runs and the DuckDB twin agree bit-for-bit; this is what
    makes the PSI oracle branch value-identical. Exact percentile
    sorts per group, so at 100 TB pass ``approx=True``: the
    Greenwald-Khanna/KLL sketch behind ``percentile_approx`` is a
    single mergeable-summary pass with rank error <= 1/accuracy —
    edge placement tolerates approximation because PSI compares
    SHARES against whatever edges were fixed (pinned by
    tests/test_text_quality.py: approx edges land within the sketch's
    rank-error bound of the exact ones)."""
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    pct = (
        F.percentile_approx(
            F.col(value_col),
            F.array(*[F.lit(f) for f in fracs]),
            F.lit(accuracy),
        )
        if approx
        else F.percentile(
            F.col(value_col), F.array(*[F.lit(f) for f in fracs])
        )
    )
    row = base.agg(pct.alias("e")).first()
    return [float(x) for x in row["e"]]


def _bucket_expr(col, edges: list, base: int = 0):
    """Balanced binary-search expression over the sorted edge list:
    count of edges <= col in O(log n) comparisons per row (a
    width_bucket for ARBITRARY quantile edges, which Spark's built-in
    only does for uniform ranges). NULL takes every ``otherwise``
    branch down to bucket 0 and NaN every ``when`` branch up to the
    top bucket — the same landing spots as the linear CASE chain the
    DuckDB twin replays."""
    if not edges:
        return F.lit(base)
    mid = len(edges) // 2
    return F.when(
        col >= F.lit(edges[mid]),
        _bucket_expr(col, edges[mid + 1 :], base + mid + 1),
    ).otherwise(_bucket_expr(col, edges[:mid], base))


def bucket_shares(
    df: DataFrame, value_col: str, edges: list, scale: int = 6
) -> DataFrame:
    """(bucket, share, n) with bucket = count of edges <= value
    (0-based; right-open buckets), share rounded for engine
    portability; ``n`` rides along so monitoring consumers get the
    batch size from the same single aggregation."""
    counts = (
        df.select(
            _bucket_expr(F.col(value_col), edges).cast("long").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy())
    return counts.select(
        "bucket", F.round(F.col("n") / total, scale).alias("share"), "n"
    )


def psi_from_shares(
    p: dict, q: dict, n_buckets: int = 10, floor: float = 1e-4
) -> float:
    """PSI from two {bucket: share} dicts on the SAME edges. ``floor``
    guards empty buckets (standard practice — PSI is undefined at zero
    shares). This is the per-micro-batch hot path of the streaming
    drift monitor: the baseline shares are computed once, each batch
    contributes one 10-row aggregate."""
    import math

    out = 0.0
    for b in range(n_buckets):
        pb = max(p.get(b, 0.0), floor)
        qb = max(q.get(b, 0.0), floor)
        out += (pb - qb) * math.log(pb / qb)
    return out


def shares_dict(df: DataFrame, value_col: str, edges: list) -> dict:
    """{bucket: share} of ``bucket_shares`` — the driver-side form the
    PSI arithmetic consumes (n_buckets rows by contract)."""
    return {
        r["bucket"]: r["share"]
        for r in bucket_shares(df, value_col, edges).collect()
    }


def embedding_drift(
    base: DataFrame,
    cand: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    floor: float = 1e-4,
    scale: int = 6,
) -> DataFrame:
    """Embedding-SPACE drift between two snapshot corpora — the vector
    complement of the scalar :func:`psi` (which sees an embedding only
    through a projection like its norm; a distribution can rotate in
    embedding space without moving any scalar marginal).

    Both snapshots assign to the SAME fixed quantizer cells
    (``centroids``: the usual tiny ``(cell_id, sv)`` relation — an ANN
    index's IVF centroids are the natural choice, making this the
    rebuild trigger :func:`~.ann_index.add_to_ann_index` documents),
    via the shared zero-shuffle
    :func:`~.similarity.assign_cells` kernel. Per cell:

    * ``base_share`` / ``cand_share`` — occupancy shares (the cells
      play the role of PSI's quantile buckets; categorical PSI);
    * ``psi_term`` — ``(p - q) * ln(p / q)`` on floor-clamped ROUNDED
      shares (clamp after rounding so both engines see identical
      inputs); the corpus-level PSI is their sum
      (:func:`embedding_psi`);
    * ``centroid_shift_cosine`` — cosine between the two snapshots'
      per-cell MEAN vectors (computed on cosine-equivalent per-cell
      SUM vectors — scale-invariant — whose components are
      floor-quantized ``floor(v * 1e15)`` DECIMAL(38,0) sums, the
      pagerank recipe for order-independent, engine-portable float
      accumulation), NULL when either side has no members. Occupancy
      can be stable while every member drifts — this column catches
      that mode.

    Scale shape: two zero-shuffle assignment scans, one
    (cell, dim)-wide partial-agg shuffle per snapshot (explode
    amplifies by dim, map-side combine collapses to |cells| x dim
    rows), then joins over the cell-sized relations. Totals ride as
    broadcast 1-row aggregates (lazy — no eager driver action).

    Every centroid cell emits a row (empty cells get share 0 →
    floored PSI contribution), so the output is |cells|-sized by
    construction."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.similarity import (
        assign_cells,
        dot,
    )

    spark = base.sparkSession
    caller = "embedding_drift"

    def cell_stats(df, tag):
        assigned = assign_cells(
            df, centroids, id_col=id_col, vec_col=vec_col,
            caller=caller, keep_vec=True,
        )
        counts = assigned.groupBy("cell_id").agg(
            F.count("*").alias(f"{tag}_n")
        )
        sums = (
            assigned.select(
                "cell_id", F.posexplode(vec_col).alias("pos", "val")
            )
            .groupBy("cell_id", "pos")
            .agg(
                F.sum(
                    F.floor(F.col("val") * F.lit(1e15)).cast(
                        "decimal(38,0)"
                    )
                ).alias("qsum")
            )
            .groupBy("cell_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "qsum"))),
                    lambda s: s["qsum"].cast("double"),
                ).alias(f"{tag}_sumvec")
            )
        )
        total = assigned.agg(
            F.count("*").cast("double").alias(f"{tag}_total")
        )
        return counts.join(sums, "cell_id"), total

    b_stats, b_total = cell_stats(base, "base")
    c_stats, c_total = cell_stats(cand, "cand")

    # every centroid cell gets a row — the cell universe is the
    # quantizer, not whichever cells happen to be occupied
    cells = centroids.select(F.col("cell_id").cast("long").alias("cell_id"))
    joined = (
        cells.join(b_stats, "cell_id", "left")
        .join(c_stats, "cell_id", "left")
        .crossJoin(F.broadcast(b_total))
        .crossJoin(F.broadcast(c_total))
    )
    p_raw = F.round(
        F.coalesce(F.col("base_n"), F.lit(0)) / F.col("base_total"), scale
    )
    q_raw = F.round(
        F.coalesce(F.col("cand_n"), F.lit(0)) / F.col("cand_total"), scale
    )
    p = F.greatest(p_raw, F.lit(floor))
    q = F.greatest(q_raw, F.lit(floor))
    shift = F.when(
        F.col("base_sumvec").isNotNull() & F.col("cand_sumvec").isNotNull(),
        F.round(
            dot(F.col("base_sumvec"), F.col("cand_sumvec"))
            / (
                F.sqrt(dot(F.col("base_sumvec"), F.col("base_sumvec")))
                * F.sqrt(dot(F.col("cand_sumvec"), F.col("cand_sumvec")))
            ),
            scale,
        ),
    )
    return joined.select(
        "cell_id",
        F.coalesce(F.col("base_n"), F.lit(0)).cast("long").alias("base_n"),
        F.coalesce(F.col("cand_n"), F.lit(0)).cast("long").alias("cand_n"),
        p_raw.alias("base_share"),
        q_raw.alias("cand_share"),
        F.round((p - q) * F.log(p / q), scale).alias("psi_term"),
        shift.alias("centroid_shift_cosine"),
    )


def embedding_psi(
    base: DataFrame,
    cand: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    floor: float = 1e-4,
) -> float:
    """Corpus-level embedding-space PSI: the sum of
    :func:`embedding_drift`'s per-cell terms (same 0.1 / 0.25 alert
    conventions as the scalar PSI — shares are shares, whatever the
    bucketing)."""
    rows = embedding_drift(
        base, cand, centroids, id_col=id_col, vec_col=vec_col, floor=floor
    ).collect()
    return float(sum(r["psi_term"] for r in rows))


def psi(
    base: DataFrame,
    cand: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    floor: float = 1e-4,
    approx: bool = False,
) -> float:
    """Population Stability Index of ``cand`` vs ``base`` on
    ``value_col``. Returns a plain float: PSI is a monitoring scalar,
    not a relation. ``approx=True`` fixes the bucket edges from the
    sketch-based percentile (the 100 TB path — see quantile_edges)."""
    edges = quantile_edges(base, value_col, n_buckets, approx=approx)
    return psi_from_shares(
        shares_dict(base, value_col, edges),
        shares_dict(cand, value_col, edges),
        n_buckets,
        floor,
    )
