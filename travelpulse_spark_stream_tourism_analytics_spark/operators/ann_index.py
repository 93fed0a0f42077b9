"""Persistent ANN index: build once, search many (IVF + PQ on disk).

The catalog's kNN entries fit their coarse cells and codebooks inside
each query — right for an oracle-checked benchmark, wrong for
production, where an embedding corpus is indexed ONCE and then served
many searches. This module persists the full index as plain parquet +
JSON artifacts:

* ``centroids.parquet``  (cell, center)            — IVF coarse quantizer
* ``codebooks.parquet``  (subspace, code, center)  — PQ codebooks
* ``codes.parquet/cell=N/`` (id, codes)            — PQ codes,
  PARTITIONED BY CELL, so a search that probes ``n_probe`` of
  ``n_cells`` cells reads only those partition directories — the
  IVF pruning is enforced by the LAYOUT (partition pruning at the
  scan), not by a post-scan filter;
* ``meta.json``          (dims, m, k, n_cells, seed, counts).

Search composes the existing machinery (operators/similarity.py): probe
cells are ranked driver-side against the tiny centroid table (queries
are few — the same bounded contract as ivf_knn), per-query ADC tables
ship as literal columns, and the distance is m table lookups summed in
pure JVM exprs over the 32-64x-smaller codes. This is IVF-PQ in the
plain (non-residual) variant: PQ codes quantize the raw vectors, cells
only prune — one fewer moving part, same plan shape as the residual
variant if recall targets ever require it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import ivf_index, pq_codebooks, pq_encode


def build_ann_index(
    emb: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = 16,
    m: int | None = None,
    k_codes: int = 256,
    seed: int = 42,
    store_vectors: bool = True,
) -> dict:
    """Fit IVF cells + PQ codebooks over ``emb`` and persist the index.

    ``n_cells=None`` auto-sizes the coarse quantizer to
    ``max(16, round(sqrt(N)))`` — the FAISS guideline. The cell count
    must SCALE with the corpus: a fixed 16 cells at 20k vectors puts
    1250 vectors in a cell and the quantizer is too coarse to localize
    neighbors (measured: the half-width PROBING CEILING itself — true
    neighbors inside the probed cells, before any PQ effect — fell to
    0.795 at 16 cells and recovered to 0.94 at 64; SOAK_r6 caught
    this as an anomaly). Pass an explicit count to pin layouts for
    incremental adds.

    ``k_codes=256`` (8 bits/subspace) is the standard production PQ
    resolution (FAISS PQx8): measured at the 2000-vector soak corpus
    it lifts half-width-probe recall@10 from 0.60 to 0.82 vs the 4-bit
    variant at the same rerank, because the ADC shortlist stops
    starving. Drop to 16 (4 bits) only for memory-bound codes-only
    indexes; training needs >= k_codes vectors either way.

    ``m=None`` (default) auto-sizes the subspace count to ~4 dims per
    subspace (the largest of sub-dim 4/8/2/1 that divides the vector
    dim) — the round-8 fix for the sf1 full-probe recall plateau:
    8-dim subspaces (m=8 at dim 64) leave PQ quantization noise
    comparable to the neighbor/non-neighbor distance gaps on
    dense embeddings, so true neighbors sink below any affordable ADC
    shortlist — measured at the 20k-vector sf1 corpus, full-probe
    recall@10 was 0.89 at rerank 40x k and needed rerank ~200x k to
    reach 1.0, while k-means init/iteration tuning moved NOTHING
    (per-subspace mse is intrinsic: 0.307 across random/k-means++
    inits). Halving the subspace dim (m=16) cuts the mse to 0.093 and
    the SAME corpus reaches recall@10 = 1.0 by rerank 20x k. Cost:
    code bytes double (16 B/vector at dim 64 — still 16x under the
    raw float32 row), and the ADC table build per query doubles;
    both are the right trade wherever rerank bandwidth is the
    bottleneck, which is every store_vectors deployment.

    ``store_vectors`` keeps the raw vectors alongside the codes (same
    cell-partitioned layout), enabling the exact RERANK refine step at
    search time (FAISS IndexRefineFlat shape): ADC shortlists cheaply
    over the small codes, then the shortlist alone pays the full-vector
    distance. Costs the original vector storage back — set False for a
    codes-only index when recall@ADC suffices.

    Returns the meta dict (also written to meta.json)."""
    emb = emb.select(id_col, F.col(vec_col).cast("array<double>").alias("__v"))
    # The projection feeds three full passes (clamp-count, IVF fit, PQ
    # fit) plus the encode join — persist once so the clamp count is not
    # an extra uncached scan (ADVICE r7), and reuse it for meta. The
    # whole build runs under try/finally so an empty-corpus raise or a
    # mid-fit failure cannot leak a session-wide cached DataFrame
    # (ADVICE r8).
    emb = emb.persist()
    try:
        return _build_ann_index_persisted(
            emb, id_col, out_dir, n_cells, m, k_codes, seed, store_vectors
        )
    finally:
        emb.unpersist()


def _build_ann_index_persisted(
    emb, id_col, out_dir, n_cells, m, k_codes, seed, store_vectors
):
    import math
    import warnings

    n_vectors = emb.count()
    if n_vectors == 0:
        raise ValueError("build_ann_index: empty training set")
    if n_cells is None:
        n_cells = max(16, round(math.sqrt(n_vectors)))
    if m is None:
        dim = len(emb.select("__v").first()["__v"])
        m = next(dim // sub for sub in (4, 8, 2, 1) if dim % sub == 0)
    # k-means cannot fit more centers than training points: a corpus
    # smaller than k_codes (or n_cells) under the 256-code production
    # default would train a degenerate codebook (ADVICE r6) — clamp
    # with a warning instead of failing deep inside the fit.
    if k_codes > n_vectors:
        warnings.warn(
            f"build_ann_index: k_codes={k_codes} exceeds the "
            f"{n_vectors}-vector training set; clamping to {n_vectors} "
            "(tiny-corpus index — recall contracts assume k_codes<=N)",
            stacklevel=2,
        )
        k_codes = n_vectors
    if n_cells > n_vectors:
        warnings.warn(
            f"build_ann_index: n_cells={n_cells} exceeds the "
            f"{n_vectors}-vector training set; clamping to {n_vectors}",
            stacklevel=2,
        )
        n_cells = n_vectors
    assigned, model = ivf_index(emb, id_col, "__v", n_cells=n_cells, seed=seed)
    books = pq_codebooks(emb, vec_col="__v", m=m, k=k_codes, seed=seed)
    codes = pq_encode(emb, id_col, "__v", books).join(
        assigned.select(
            id_col, "cell", *(["__v"] if store_vectors else [])
        ),
        id_col,
    )
    if store_vectors:
        codes = codes.withColumnRenamed("__v", "vec")

    spark = emb.sparkSession
    os.makedirs(out_dir, exist_ok=True)
    centers = model.clusterCenters()
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cell int, center array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/centroids.parquet")
    spark.createDataFrame(
        [
            (j, c, [float(x) for x in books[j][c]])
            for j in range(len(books))
            for c in range(len(books[j]))
        ],
        "subspace int, code int, center array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/codebooks.parquet")
    codes.write.mode("overwrite").partitionBy("cell").parquet(
        f"{out_dir}/codes.parquet"
    )

    meta = {
        "id_col": id_col,
        "dim": len(centers[0]),
        "n_cells": len(centers),
        "m": len(books),
        "k_codes": int(books[0].shape[0]),
        "sub_dim": int(books[0].shape[1]),
        "seed": seed,
        "store_vectors": store_vectors,
        "n_vectors": n_vectors,
    }
    with open(f"{out_dir}/meta.json", "w") as fh:
        json.dump(meta, fh)
    return meta


def load_ann_meta(index_dir: str) -> dict:
    with open(f"{index_dir}/meta.json") as fh:
        return json.load(fh)


def _load_model(spark: SparkSession, index_dir: str):
    """(centers ndarray, codebooks list[ndarray], meta) from disk."""
    import numpy as np

    meta = load_ann_meta(index_dir)
    crows = spark.read.parquet(f"{index_dir}/centroids.parquet").collect()
    centers = np.zeros((meta["n_cells"], meta["dim"]))
    for r in crows:
        centers[r["cell"]] = r["center"]
    brows = spark.read.parquet(f"{index_dir}/codebooks.parquet").collect()
    books = [
        np.zeros((meta["k_codes"], meta["sub_dim"])) for _ in range(meta["m"])
    ]
    for r in brows:
        books[r["subspace"]][r["code"]] = r["center"]
    return centers, books, meta


def ann_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    query_id_col: str = "qid",
    qvec_col: str = "qv",
    k: int = 5,
    n_probe: int = 4,
    rerank: int | None = None,
) -> DataFrame:
    """Top-k ADC neighbors for each query against the persisted index.

    Probed-cell restriction is a PARTITION FILTER on codes.parquet
    (``cell IN (...)``) — only the probed directories are listed and
    scanned; the per-(query, cell) pairing then joins on cell so each
    query scores only ITS probe set. Output: (qid, neighbor_id,
    adc_dist) with adc_dist rounded at 1e-6 before ranking, ties on
    neighbor id — identical conventions to pq_search_adc.

    ``rerank=R`` (needs a store_vectors index) refines: ADC shortlists
    the top R per query, then only those R rows pay the EXACT
    full-vector L2. Recall is bounded by cell probing alone once R is
    wide enough that ADC distortion cannot push a true neighbor below
    the shortlist cut. At the production default (8-bit PQ, k_codes=256)
    R ~ 10-20x k suffices and the soak curve runs at 40x k; a
    memory-bound 4-bit index (k_codes=16) distorts far more — measured
    there, recall@10 at half-width probing goes 0.72 -> 0.90 -> 0.92
    as R steps 5x -> 10x -> 20x k — so size R up before trading
    codebook bits down. adc_dist then carries the exact rounded
    distance."""
    import numpy as np
    from pyspark.sql.window import Window

    centers, books, meta = _load_model(spark, index_dir)
    m, sub = meta["m"], meta["sub_dim"]

    if rerank is not None and not meta.get("store_vectors"):
        raise ValueError(
            "ann_search(rerank=...) needs an index built with "
            "store_vectors=True"
        )

    rows = []
    all_cells: set[int] = set()
    for r in queries.collect():
        qv = np.array(r[qvec_col], dtype=float)
        d = ((centers - qv[None, :]) ** 2).sum(axis=1)
        probe = [int(c) for c in np.argsort(d, kind="stable")[:n_probe]]
        all_cells.update(probe)
        tables = [
            [
                float(((qv[j * sub : (j + 1) * sub] - c) ** 2).sum())
                for c in books[j]
            ]
            for j in range(m)
        ]
        for cell in probe:
            rows.append((r[query_id_col], cell, tables, list(map(float, qv))))
    if not rows:
        raise ValueError("ann_search: empty query set")
    q_df = spark.createDataFrame(
        rows,
        f"{query_id_col} long, cell int, tables array<array<double>>,"
        " qv array<double>",
    )

    codes = spark.read.parquet(f"{index_dir}/codes.parquet").filter(
        F.col("cell").isin(sorted(all_cells))  # partition pruning
    )
    id_col = meta["id_col"]
    adc = F.round(
        F.aggregate(
            F.zip_with(
                F.col("codes"),
                F.col("tables"),
                lambda c, t: F.element_at(t, c + F.lit(1)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    keep = ["vec"] if rerank is not None else []
    scored = (
        codes.join(F.broadcast(q_df), "cell")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            adc.alias("adc_dist"),
            *(["qv"] if rerank is not None else []),
            *keep,
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    shortlist_n = k if rerank is None else max(rerank, k)
    shortlist = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= shortlist_n)
        .drop("rn")
    )
    if rerank is None:
        return shortlist
    # refine: exact L2 on the stored vectors, shortlist rows only
    exact = F.round(
        F.aggregate(
            F.zip_with(
                F.col("qv"),
                F.col("vec"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    refined = shortlist.select(
        query_id_col,
        "neighbor_id",
        exact.alias("adc_dist"),
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        refined.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def add_to_ann_index(
    spark: SparkSession,
    index_dir: str,
    new_emb: DataFrame,
    vec_col: str = "embedding",
) -> dict:
    """Incremental ingest: encode new vectors under the FROZEN model
    (the build-time centroids and codebooks — the standard IVF contract;
    re-fitting would silently re-bucket the whole corpus) and append
    them to the cell-partitioned codes layout. Append-mode parquet into
    partition directories touches only the cells the new batch lands
    in; searches see the union immediately. Returns the updated meta.

    The batch twin of the streaming ingest index (--mode dedup-batch):
    chained adds == one bulk build WITH THE SAME MODEL; drift of the
    corpus away from the frozen codebooks is the operational signal to
    rebuild (monitor with operators/drift.py over adc residuals or cell
    occupancy)."""
    import numpy as np

    centers, books, meta = _load_model(spark, index_dir)
    id_col = meta["id_col"]
    emb = new_emb.select(
        id_col, F.col(vec_col).cast("array<double>").alias("__v")
    )

    # cell assignment under the frozen coarse quantizer: the centroid
    # table packs into ONE broadcast row of (cell, center) structs and
    # every new vector computes its argmin-L2 cell with pure array
    # expressions fused into the scan — zero shuffle, and none of the
    # |emb| x |cells| row amplification the previous crossJoin+window
    # shape pushed through a per-id exchange (at the sqrt(N) cell
    # sizing the build uses, that amplified relation — not the encode
    # — became the stage's cost). Selection is array_min over
    # (d2, cell) structs: field-by-field struct ordering reproduces
    # the window's (d2 ASC, cell ASC) tiebreak, and d2 is the same
    # zip_with fold per (vector, center) pair, so the assignment is
    # bit-identical to the window formulation (test-pinned).
    c_rows = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(centers)
    ]
    c_df = spark.createDataFrame(c_rows, "cell int, center array<double>")
    packed = c_df.agg(
        F.collect_list(F.struct("cell", "center")).alias("__cells")
    )
    best = F.array_min(
        F.transform(
            F.col("__cells"),
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("__v"),
                        c["center"],
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d2"),
                c["cell"].alias("cell"),
            ),
        )
    )
    assigned = emb.crossJoin(F.broadcast(packed)).select(
        id_col, "__v", best["cell"].alias("cell")
    )
    codes = pq_encode(emb, id_col, "__v", [np.array(b) for b in books]).join(
        assigned.select(
            id_col, "cell", *(["__v"] if meta.get("store_vectors") else [])
        ),
        id_col,
    )
    if meta.get("store_vectors"):
        codes = codes.withColumnRenamed("__v", "vec")
    n_new = codes.count()
    codes.write.mode("append").partitionBy("cell").parquet(
        f"{index_dir}/codes.parquet"
    )
    meta["n_vectors"] = int(meta["n_vectors"]) + n_new
    with open(f"{index_dir}/meta.json", "w") as fh:
        json.dump(meta, fh)
    return meta


def delete_from_ann_index(
    spark: SparkSession,
    index_dir: str,
    vec_ids: DataFrame,
) -> dict:
    """Deletion repair for the persistent IVF+PQ index — the missing
    third verb of its lifecycle (build / add / delete), matching
    ``delete_from_text_index`` and ``delete_from_knn_graph``.

    ``vec_ids`` is an id relation (one column named like the index's
    ``id_col``). Victim rows drop from the cell-partitioned codes
    table; ONLY cells that actually contain a victim rewrite (victim
    cells come from one bounded distinct over the codes' partition
    column — at most n_cells values), and untouched cell directories
    keep their files byte-for-byte. Centroids and codebooks stay
    FROZEN (the same contract as ``add_to_ann_index``: re-fitting
    would re-bucket the survivors). Because PQ codes are per-vector
    independent, the pruned table IS the survivors' index under the
    frozen model — deleting a batch and re-adding the same vectors
    reproduces the original codes exactly (re-encoding under frozen
    codebooks is deterministic; test-pinned), and no re-ranking is
    needed (unlike the kNN graph, the index stores no cross-vector
    edges).

    Ids with no codes row are IGNORED (the ``delete_from_knn_graph``
    convention — a replayed deletion batch is idempotent, and unlike
    the text index there is no per-doc constant whose decrement an
    unknown id would corrupt). Deleting every remaining vector is
    refused BEFORE any rewrite — remove the index directory instead.
    The id relation broadcasts: deletion batches are operationally
    bounded; a corpus-scale purge should rebuild over the survivors.
    """
    import shutil

    meta = load_ann_meta(index_dir)
    id_col = meta["id_col"]
    codes_path = f"{index_dir}/codes.parquet"
    codes = spark.read.parquet(codes_path)

    ids = vec_ids.select(id_col).distinct()
    if ids.limit(1).count() == 0:
        return meta
    victims = codes.join(F.broadcast(ids), id_col, "left_semi")
    n_found = victims.count()
    if n_found == 0:
        return meta  # pure ghost replay — nothing to rewrite
    n_after = int(meta["n_vectors"]) - n_found
    if n_after <= 0:
        raise ValueError(
            "delete_from_ann_index: deletion empties the index — "
            "remove the index directory instead of pruning every row"
        )

    touched = sorted(
        r["cell"] for r in victims.select("cell").distinct().collect()
    )
    survivors = codes.filter(F.col("cell").isin(touched)).join(
        F.broadcast(ids), id_col, "left_anti"
    )
    tmp = f"{codes_path}.__tmp"
    (
        survivors.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(tmp)
    )
    # tmp fully on disk — now swap the victim cells only (a cell
    # whose every vector was deleted has no tmp dir and simply
    # disappears; searches probing it read an empty relation)
    for c in touched:
        live = f"{codes_path}/cell={c}"
        fresh = f"{tmp}/cell={c}"
        shutil.rmtree(live, ignore_errors=True)
        if os.path.isdir(fresh):
            os.rename(fresh, live)
    shutil.rmtree(tmp, ignore_errors=True)

    meta["n_vectors"] = n_after
    with open(f"{index_dir}/meta.json", "w") as fh:
        json.dump(meta, fh)
    return meta
