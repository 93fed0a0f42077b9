"""Similarity search over embedding columns (array<float>).

Two tiers, per the north star:
- brute-force cosine top-k: broadcast the bounded query set, stream
  the corpus — exact, O(corpus × queries), the correctness baseline;
- random-hyperplane LSH buckets: O(corpus) bucketing then per-bucket
  pairwise — the 100 TB path (bucket join replaces the cross join).

Hyperplane weights are generated driver-side from a seeded hash so the
same literals can be embedded into oracle SQL; they are plan constants
(broadcast with the closure), not data.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd  # MODULE level: pandas_udf type hints resolve
# against the function's __globals__, so a function-local import
# breaks typing.get_type_hints inside pyspark's eval-type inference
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seeded_unit(seed: str) -> float:
    """Deterministic value in [-1, 1) from md5(seed)."""
    h = hashlib.md5(seed.encode()).digest()
    (v,) = struct.unpack("<Q", h[:8])
    return (v / 2**63) - 1.0


def hyperplanes(n_planes: int, dim: int, seed: str = "tp") -> list[list[float]]:
    """n_planes deterministic pseudo-random hyperplanes of `dim`."""
    return [
        [_seeded_unit(f"{seed}:{p}:{d}") for d in range(dim)]
        for p in range(n_planes)
    ]


def auto_n_planes(
    corpus_size: int, min_planes: int = 8, max_planes: int = 24
) -> int:
    """Plane count scaled to the corpus: ~4·sqrt(n) buckets.

    A fixed plane count is a scale bug (VERDICT r1): 8 planes = 256
    buckets puts n²/256 pairs in the in-bucket stage — quadratic at
    100x corpus. Targeting 2^p ≈ 4·sqrt(n) keeps the expected bucket
    size ~sqrt(n)/4, so the per-bucket pairwise work grows linearly
    with n. Examples: n=5k -> 9 planes; n=10^8 -> 16; n=10^10 (100 TB
    of docs) -> 19 — matching the 16-24 planes the corpus-scale
    literature uses. The floor keeps fixture corpora at the 8-plane
    oracle geometry; multi-probe (flipping low-margin bits) is the
    recall lever when buckets get this fine.
    """
    import math

    if corpus_size <= 1:
        return min_planes
    p = math.ceil(math.log2(corpus_size) / 2) + 2
    return max(min_planes, min(max_planes, p))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(
    a: Column,
    b: Column,
    scale: int = 6,
    norm_a: Column | None = None,
    norm_b: Column | None = None,
) -> Column:
    """Cosine similarity rounded so summation-order ulps can't flip
    downstream rankings.

    ``norm_a``/``norm_b`` accept a PRE-COMPUTED ``sqrt(dot(x, x))``
    column: in pairwise stages each row's self-norm is otherwise
    re-evaluated once per PAIR (cluster_size times per vector in the
    semantic-dedup prune join). The precomputed column is the
    identical in-engine expression, so the quotient — and therefore
    the rounded value — is bit-identical."""
    na = norm_a if norm_a is not None else F.sqrt(dot(a, a))
    nb = norm_b if norm_b is not None else F.sqrt(dot(b, b))
    return F.round(dot(a, b) / (na * nb), scale)


def as_double_vec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket key: one char per hyperplane ('1' if v·p >= 0)."""
    bits = [
        F.when(dot(vec, F.lit(list(p))) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for p in planes
    ]
    return F.concat(*bits)


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    query_id_col: str,
    vec_col: str = "v",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine; queries broadcast, corpus streamed.
    Each corpus row's self-norm is computed once, not once per query."""
    from pyspark.sql.window import Window

    scored = (
        corpus.withColumn(
            "__nc", F.sqrt(dot(F.col(vec_col), F.col(vec_col)))
        )
        .crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            cosine(
                F.col("qv"), F.col(vec_col), norm_b=F.col("__nc")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def filtered_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    query_id_col: str,
    predicate: Column,
    vec_col: str = "v",
    k: int = 5,
    strategy: str = "prefilter",
    oversample: int = 4,
) -> DataFrame:
    """Metadata-filtered vector search: top-k by cosine among corpus
    rows satisfying ``predicate`` — the vector-DB operation every
    curation stack needs ("nearest neighbors, but only rows with
    label=X / source=Y / date>=Z").

    Two strategies, the industry-standard trade:

    - ``prefilter`` (exact w.r.t. the filtered corpus): the predicate
      is applied BEFORE ranking, so Catalyst pushes it into the
      parquet scan (partition pruning when the predicate hits a
      partition column) and the ranking never touches excluded rows.
      Right when the predicate is selective or when exactness over
      the filtered set is required.
    - ``postfilter`` (index-reusing): rank the UNFILTERED corpus to a
      ``k * oversample`` shortlist per query, then filter the
      shortlist and re-rank to top-k. Right when an unfiltered
      index/shortlist already exists (reusing it beats re-probing per
      predicate) and the predicate keeps most rows. May return FEWER
      than k rows per query when the filter eats the shortlist — the
      standard post-filter recall caveat, surfaced here by contract
      rather than silently re-probing. ``oversample >= corpus/kept``
      ratio makes the two strategies agree (test-pinned).

    Ranking and tie-breaks are :func:`brute_force_knn`'s (exact
    cosine, rounded 1e-6, neighbor id ASC; self-matches excluded).
    For IVF-accelerated variants compose the same way: filter before
    :func:`ivf_knn` (pre) or shortlist-then-filter (post) — the
    strategies are orthogonal to the index.
    """
    if strategy == "prefilter":
        return brute_force_knn(
            corpus.filter(predicate), queries, id_col, query_id_col,
            vec_col, k,
        )
    if strategy != "postfilter":
        raise ValueError(
            f"filtered_knn: unknown strategy {strategy!r} "
            "(prefilter|postfilter)"
        )
    from pyspark.sql.window import Window

    keep_ids = corpus.filter(predicate).select(
        F.col(id_col).alias("neighbor_id")
    )
    shortlist = brute_force_knn(
        corpus, queries, id_col, query_id_col, vec_col, k * oversample
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        shortlist.join(keep_ids, "neighbor_id", "left_semi")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .select(query_id_col, "neighbor_id", "cosine")
    )


def lsh_neardup_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    min_cosine: float = 0.99,
) -> DataFrame:
    """Near-duplicate pairs via hyperplane-LSH bucketing + in-bucket
    exact cosine. The equi-join on bucket replaces the all-pairs cross
    join; collisions fall out of recall, not correctness.

    Pair generation goes through dedup.blocked_self_join_pairs: the
    plane dot products run once off a single reused exchange (no
    persist — ADVICE r1), and a cluster of near-identical vectors (one
    oversized bucket) fans out over block-pair cells instead of
    pinning a single task (the skew lesson of the sf1 soak)."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.dedup import (
        blocked_self_join_pairs,
    )

    with_bucket = emb.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), planes).alias("bucket")
    )
    pairs = blocked_self_join_pairs(
        with_bucket, ["bucket"], id_col, (vec_col,)
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            cosine(F.col(f"{vec_col}_a"), F.col(f"{vec_col}_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )


def quantize_int8(vec: Column) -> Column:
    """Symmetric per-vector int8 scalar quantization: struct(scale,
    q array<int>) with q = round(v / scale), scale = max|v| / 127.

    The embedding STORAGE path at 100 TB: 4x smaller than float32
    (32x smaller than the double arrays the fixtures carry), one
    map-side pass, no codebook to train or broadcast. Search
    dequantizes on the fly (`dequantize`); rounding is
    half-away-from-zero in both Spark and DuckDB, so the whole path is
    oracle-checkable."""
    scale = (
        F.greatest(F.array_max(F.transform(vec, lambda x: F.abs(x))), F.lit(1e-12))
        / F.lit(127.0)
    )
    return F.struct(
        scale.alias("scale"),
        F.transform(vec, lambda x: F.round(x / scale).cast("int")).alias("q"),
    )


def dequantize(quant: Column) -> Column:
    """struct(scale, q) -> approximate double vector (q * scale)."""
    return F.transform(quant["q"], lambda x: x * quant["scale"])


def semantic_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    vec_col: str,
    eval_id_col: str | None = None,
    eval_vec_col: str | None = None,
    min_cosine: float = 0.99,
) -> DataFrame:
    """Embedding-space benchmark decontamination: flag every TRAIN
    vector whose max cosine against ANY eval-set vector reaches
    ``min_cosine``, with the best-matching eval id as the witness.

    The semantic complement of the n-gram 'contam' branch
    (plans/text_queries.docs_top_terms): n-gram hashing catches
    verbatim leakage, this catches paraphrased/reformatted eval items
    that share an embedding neighborhood with a training doc (the
    leakage mode n-grams miss).

    100 TB plan shape — ZERO shuffles on the train side: the eval set
    is a benchmark suite (small by construction), so it is packed into
    ONE broadcast row as an array of (id, vec, norm) structs; each
    train row computes its argmax-cosine eval match with pure array
    expressions fused into the scan (no window, no groupBy, no join
    key). The only exchanges in the plan are the eval-side global
    aggregation (SinglePartition over the tiny suite) and its
    broadcast — `hashpartitioning` never appears. Eval suites past
    ``_MAX_EVAL_PACK`` (10^5) usable rows are REFUSED — the packed
    row would be multi-GB and die opaquely in the executor — with an
    error naming the fallback: :func:`brute_force_knn`'s window path
    or LSH-bucketing both sides.

    NOT fully lazy: ONE eager, LIMIT-bounded action runs at call time
    (``limit(_MAX_EVAL_PACK + 1).count()`` on the filtered eval side)
    serving as both the emptiness check and the packing-size refusal,
    so bad inputs fail fast instead of deep inside a materialization.
    The eval side is scanned once for the check and once for the
    packed aggregate; for a benchmark-suite-sized table both scans
    are trivial.

    Determinism: cosine is rounded 1e-6 (class contract); the witness
    tiebreak is the LOWEST eval id via array_max over (cosine,
    -eval_id) structs — order-independent, so collect_list's
    nondeterministic packing order cannot change results.

    Degenerate inputs (same contract as ivf_knn_graph): zero-norm,
    null, or NaN-norm eval vectors are dropped from the packed suite
    (a zero norm is a 0-divisor — ANSI DIVIDE_BY_ZERO; a NaN norm
    would make every cosine NaN, and NaN ranks GREATEST in Spark's
    Double ordering AND passes ``>= min_cosine``, so one NaN eval
    vector would otherwise become the witness for — and flag — the
    ENTIRE corpus); an eval set that becomes EMPTY after that filter
    raises (decontaminating against nothing must not silently pass
    everything); zero-norm / null / NaN-norm train vectors are
    excluded from flagging by the same filter.
    """
    eval_id_col = eval_id_col or id_col
    eval_vec_col = eval_vec_col or vec_col

    def usable(norm_col):
        # < +inf matters as much as the NaN check: an Inf-norm vector
        # (an Inf element, or a dot() that overflows) makes every
        # cosine against it Inf/Inf = NaN, and NaN ranks GREATEST and
        # passes >= min_cosine — one such eval vector would flag the
        # ENTIRE corpus (review round 10)
        return (
            norm_col.isNotNull()
            & ~F.isnan(norm_col)
            & (norm_col > 0)
            & (norm_col < F.lit(float("inf")))
        )

    ev = eval_df.select(
        F.col(eval_id_col).cast("long").alias("__eid"),
        F.col(eval_vec_col).alias("__ev"),
        F.sqrt(dot(F.col(eval_vec_col), F.col(eval_vec_col))).alias("__en"),
    ).filter(usable(F.col("__en")))
    # ONE eager, LIMIT-bounded action at call time (documented in the
    # docstring): it is both the emptiness check and the packing-size
    # refusal. LIMIT n+1 means the scan stops early on huge suites —
    # it never counts past the bound.
    n_ev = ev.limit(_MAX_EVAL_PACK + 1).count()
    if n_ev == 0:
        raise ValueError(
            "semantic_decontaminate: eval set is empty after the "
            "zero-norm filter — refusing to vacuously pass the corpus"
        )
    if n_ev > _MAX_EVAL_PACK:
        raise ValueError(
            f"semantic_decontaminate: eval set exceeds "
            f"{_MAX_EVAL_PACK} usable rows — the packed broadcast row "
            "would be multi-GB; use brute_force_knn's window path or "
            "LSH-bucket both sides instead (see docstring)"
        )
    packed = ev.agg(
        F.collect_list(F.struct("__eid", "__ev", "__en")).alias("__eval")
    )
    base = train.select(
        F.col(id_col),
        F.col(vec_col),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("__nv"),
    ).filter(usable(F.col("__nv")))
    best = F.array_max(
        F.transform(
            F.col("__eval"),
            lambda e: F.struct(
                cosine(
                    F.col(vec_col),
                    e["__ev"],
                    norm_a=F.col("__nv"),
                    norm_b=e["__en"],
                ).alias("c"),
                (-e["__eid"]).alias("neg_id"),
            ),
        )
    )
    return (
        base.crossJoin(F.broadcast(packed))
        .select(
            F.col(id_col),
            (-best["neg_id"]).alias("matched_eval_id"),
            best["c"].alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(min_cosine))
    )


def lsh_neardup_pairs_multiprobe(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    min_cosine: float = 0.99,
    n_probe_bits: int = 2,
) -> DataFrame:
    """Hyperplane-LSH near-dup pairs with MULTI-PROBE: besides its home
    bucket, each vector probes the buckets reached by flipping its
    ``n_probe_bits`` lowest-margin hyperplane signs (the bits most
    likely to differ for a true near-duplicate sitting close to a
    plane). This is the recall lever that pairs with auto_n_planes:
    finer bucketing (more planes) cuts bucket sizes linearly while
    multi-probe recovers the near-misses, instead of coarsening the
    whole table. Probe-side rows fan out (1 + n_probe_bits)x; the join
    stays a bucket equi-join (probe bucket == home bucket, both
    directions via the symmetric fan-out), never all-pairs.
    """
    dots = F.array(
        *[dot(F.col(vec_col), F.lit(list(p))) for p in planes]
    )
    n_planes = len(planes)

    with_geom = emb.select(
        F.col(id_col), F.col(vec_col), dots.alias("__dots")
    ).select(
        id_col,
        vec_col,
        F.concat(
            *[
                F.when(F.element_at("__dots", i + 1) >= 0, F.lit("1")).otherwise(
                    F.lit("0")
                )
                for i in range(n_planes)
            ]
        ).alias("home"),
        F.transform(
            # plane indices sorted by |margin| ascending — the flips
            F.slice(
                F.array_sort(
                    F.array(
                        *[
                            F.struct(
                                F.abs(F.element_at("__dots", i + 1)).alias("m"),
                                F.lit(i).alias("i"),
                            )
                            for i in range(n_planes)
                        ]
                    )
                ),
                1,
                n_probe_bits,
            ),
            lambda s: s["i"],
        ).alias("__flip_idx"),
    )
    # Flip bit i of the home bucket string (i is 0-based; substring is
    # 1-based): prefix of length i + negated bit + suffix.
    flipped = F.transform(
        F.col("__flip_idx"),
        lambda i: F.concat(
            F.substring(F.col("home"), F.lit(1), i),
            F.when(F.substring(F.col("home"), i + 1, 1) == "1", F.lit("0")).otherwise(
                F.lit("1")
            ),
            F.substring(F.col("home"), i + 2, F.lit(n_planes)),
        ),
    )
    probes = with_geom.select(
        id_col,
        vec_col,
        "home",
        F.explode(
            F.array_union(F.array(F.col("home")), flipped)
        ).alias("probe"),
    )
    # Bipartite blocked join (see dedup.blocked_join_pairs): probes x
    # homes within a bucket fan out over block-pair cells, so a dense
    # bucket cannot pin one task (the sf1 soak skew lesson, applied to
    # every pair generator).
    from travelpulse_spark_stream_tourism_analytics_spark.operators.dedup import (
        blocked_join_pairs,
    )

    homes = with_geom.select(
        F.col(id_col).alias("__rid"),
        F.col(vec_col).alias("vb"),
        F.col("home").alias("probe"),
    )
    a = probes.select(
        F.col(id_col).alias("__lid"), F.col(vec_col).alias("va"), "probe"
    )
    pairs = (
        blocked_join_pairs(a, homes, ["probe"])
        .filter(F.col("__lid") != F.col("__rid"))
        .select(
            F.least("__lid", "__rid").alias("id_a"),
            F.greatest("__lid", "__rid").alias("id_b"),
            cosine(F.col("va"), F.col("vb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
        .distinct()
    )
    return pairs


def ivf_index(
    emb: DataFrame, id_col: str, vec_col: str, n_cells: int = 16, seed: int = 42
):
    """IVF index: KMeans centroids partition the corpus into cells
    (coarse quantizer). Returns (corpus with `cell`, fitted model).

    The scale path beyond hyperplane LSH: cells adapt to the data
    distribution, and search probes only `n_probe` cells — the cross
    join shrinks by ~n_cells/n_probe. Centroids are a tiny broadcast
    model; assignment is one map-side pass.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    featurized = emb.withColumn("__features", array_to_vector(F.col(vec_col)))
    model = KMeans(
        k=n_cells, seed=seed, maxIter=10, featuresCol="__features"
    ).fit(featurized)
    assigned = (
        model.transform(featurized)
        .withColumnRenamed("prediction", "cell")
        .drop("__features")
    )
    return assigned, model


def ivf_knn(
    corpus_with_cells: DataFrame,
    model,
    queries: DataFrame,
    id_col: str,
    query_id_col: str,
    vec_col: str = "v",
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k cosine within the query's n_probe nearest cells.

    Recall/cost trade: n_probe = n_cells recovers exact brute force.
    """
    import numpy as np
    from pyspark.sql.window import Window

    centers = model.clusterCenters()

    def cell_rank_pairs(qv_np):
        d = [float(np.linalg.norm(qv_np - c)) for c in centers]
        return [c for c, _ in sorted(enumerate(d), key=lambda t: t[1])[:n_probe]]

    # Queries are few: compute their probe cells driver-side and
    # broadcast (centroids are plan constants, like the LSH planes).
    q_rows = queries.collect()
    probe = [
        (r[query_id_col], r["qv"], cell)
        for r in q_rows
        for cell in cell_rank_pairs(np.array(r["qv"]))
    ]
    spark = queries.sparkSession
    q_df = spark.createDataFrame(
        probe, f"{query_id_col} long, qv array<double>, cell int"
    )
    scored = (
        corpus_with_cells.join(F.broadcast(q_df), "cell")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col("qv"), F.col(vec_col)).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


# Cell-assignment strategy bounds (VERDICT r8 items 3/6): the
# plan-constant path embeds every centroid as codegen literals — right
# for a tiny quantizer, but at the soak's own sqrt(N) sizing (~31k
# cells at 1e9 vectors) a multi-megabyte literal array and
# O(n_cells*dim) per-row expression tree hit Janino constant-pool
# limits long before the math does. Above _AUTO_BROADCAST_CELLS the
# auto path switches to a broadcast numpy matrix + Arrow-batched
# pandas UDF (vectorized matmul per batch, zero shuffle, no codegen
# growth); _MAX_BROADCAST_CELLS bounds the driver-side centroid
# collect (a quantizer bigger than that wants two-level coarse
# quantization, not a flat argmax).
_AUTO_BROADCAST_CELLS = 256
_MAX_PLAN_CELLS = 1024
_MAX_BROADCAST_CELLS = 200_000
# semantic_decontaminate packs the eval suite into ONE broadcast row;
# past this many usable eval rows that row is multi-GB and dies
# opaquely in the executor — refuse with the documented fallback
# instead (same bounded-collect contract as _MAX_BROADCAST_CELLS)
_MAX_EVAL_PACK = 100_000
# (batch x tile) score-matrix bound inside the broadcast assignment
# UDF; captured as a closure value at plan-build time (patchable in
# tests to force multi-tile merging on small fixtures)
_ASSIGN_TILE_CELLS = 2048


_ASSIGN_BUFS: dict = {}


def _assign_bufs(b: int, width: int):
    """Per-worker buffer cache for the assignment kernel: page faults
    on fresh large allocations cost ~40us/page in this environment,
    and three (batch x tile) buffers are ~500 MB — allocated once per
    reused python worker instead of once per Arrow batch (measured:
    the per-batch allocation dominated the 10^6 x 10^4 assignment
    wall). Keyed by shape; one live set per worker (batch sizes are
    uniform except a partition's tail batch, which evicts at most
    once). The kernel references this helper by module name, so every
    executor task resolves to the SAME worker-process dict."""
    import numpy as np

    key = (b, width)
    bufs = _ASSIGN_BUFS.get(key)
    if bufs is None:
        if len(_ASSIGN_BUFS) > 2:
            _ASSIGN_BUFS.clear()
        bufs = (
            np.empty((b, width)),
            np.empty((b, width)),
            np.empty((b, width), dtype=np.int64),
        )
        _ASSIGN_BUFS[key] = bufs
    return bufs


def _ranked_cells_pandas(spark, cents, n_probe: int, vec_col: str):
    """struct(own, probes) pandas UDF over the vector column: each
    vector's own (top-1) cell and its ``n_probe`` nearest cells by
    (rounded cosine DESC, cell_id ASC) — the same comparator as the
    plan-constant struct sort, replayed in numpy.

    Parity engineering: the dot products accumulate SEQUENTIALLY over
    dimensions (``acc += V[:, d] * C[:, d]`` in element order — the
    identical IEEE add sequence as the ``F.aggregate`` fold in
    :func:`dot`), norms multiply in the same ``na * nb`` order,
    rounding is half-away-from-zero at 1e-6, and NaN cosines (a
    zero-norm vector or centroid) rank GREATEST like Spark's Double
    ordering (substituted with +inf before ranking — emitted values
    are cell ids, never the scores, so the substitution is
    invisible). Known 1-ulp caveat: Spark's ``round`` is HALF_UP on
    the double's SHORTEST DECIMAL rendering (BigDecimal.valueOf)
    while this path rounds the binary value — they disagree only for
    doubles within ~1 ulp of a .5e-6 decimal boundary, and a
    disagreement changes the output only if it also flips a cell
    ORDER (another cell's cosine between the two roundings); absent
    on the pinned fixtures, ~1e-16-per-comparison at random. The same
    caveat already applies to every DuckDB-round-vs-Spark-round
    oracle in the repo. Null / wrong-dimension / null-element vectors
    get a NULL assignment (they fall out of the cell equi-join —
    exactly where the plan-constant path's null cosines land them).
    Centroid chunks bound the (batch x cells) score matrix at
    ~2048-cell tiles; a cell cut at a tile boundary is dominated by
    >= n_probe cells of its own tile under the global comparator, so
    tiling never changes the global top-n_probe. The centroid matrix
    ships as a SparkContext broadcast that lives as long as the
    returned expression's lineage (the ContextCleaner reclaims it
    with the plan) — at the 200k-cell cap that is ~100 MB per live
    plan, the price of not re-shipping it with every task closure."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    order = sorted(range(len(cents)), key=lambda i: int(cents[i]["cell_id"]))
    cell_ids = np.array(
        [int(cents[i]["cell_id"]) for i in order], dtype=np.int64
    )
    cmat = np.array(
        [[float(x) for x in cents[i]["sv"]] for i in order], dtype=np.float64
    )
    cnorm = np.zeros(len(cmat))
    for d in range(cmat.shape[1]):
        cnorm += cmat[:, d] * cmat[:, d]
    cnorm = np.sqrt(cnorm)
    bc = spark.sparkContext.broadcast((cell_ids, cmat, cnorm))
    npb = int(n_probe)
    tile_n = int(_ASSIGN_TILE_CELLS)

    @pandas_udf("own bigint, probes array<bigint>")
    def ranked(v: pd.Series) -> pd.DataFrame:
        ids, cm, cn = bc.value
        if len(v) == 0:
            return pd.DataFrame({"own": [], "probes": []})
        raw = v.to_numpy()
        dim = cm.shape[1]
        try:
            # np.stack over the Arrow-delivered array column: no
            # Python-float boxing (tolist() at 10^6 x 64 doubles was
            # a measurable slice of the batch wall)
            vm = np.stack(raw).astype(np.float64, copy=False)
            if vm.ndim != 2 or vm.shape[1] != dim:
                raise ValueError("ragged or wrong-dimension batch")
            valid = np.ones(len(vm), dtype=bool)
        except (TypeError, ValueError):
            # null vectors / null elements / ragged dims: rank as
            # NULL (dropped by the cell equi-join, like the plan
            # path's null cosines) instead of crashing the batch
            valid = np.array(
                [
                    r is not None
                    and len(r) == dim
                    and not any(x is None for x in r)
                    for r in raw
                ]
            )
            vm = np.array(
                [
                    r if ok else [0.0] * dim
                    for r, ok in zip(raw, valid)
                ],
                dtype=np.float64,
            )
        b = len(vm)
        vn = np.zeros(b)
        for d in range(dim):
            vn += vm[:, d] * vm[:, d]
        vn = np.sqrt(vn)
        # Round-10 kernel rework, all measured on this box:
        # (a) dot-product regime split — the dim-SEQUENTIAL
        #     accumulation exists for bit-parity with the
        #     plan-constant path's F.aggregate fold, but that path is
        #     REFUSED past _MAX_PLAN_CELLS, so past it there is
        #     nothing to be bit-identical to and one BLAS GEMM
        #     replaces ~dim full passes over the score matrix (GEMM's
        #     pairwise summation drifts <=1 ulp BEFORE the 1e-6
        #     rounding — the docstring's existing caveat, now only in
        #     the regime where no plan twin exists);
        # (b) preallocated buffers + in-place ops — fresh numpy
        #     temporaries page-fault at ~40us/page in this
        #     environment, and the old body allocated ~10 full
        #     (batch x tile) arrays per tile (28s/batch at 10^4
        #     cells, gemm itself 0.4s); two float + one int buffer
        #     are reused across tiles;
        # (c) exact int64 composite comparator + argmax selection —
        #     mi = the 1e-6-rounded cosine in integer units (NaN/+Inf
        #     -> a sentinel ABOVE every real cosine, replaying
        #     Spark's NaN-greatest Double ordering; -Inf -> below),
        #     comp = mi * 2^32 - cell_position packs (cosine DESC,
        #     cell_id ASC) into one collision-free key (|mi| <= 2e6,
        #     positions < 2^32 by the _MAX_BROADCAST_CELLS bound);
        #     top-n_probe per tile is n_probe argmax sweeps with
        #     in-place knockout instead of a full argsort or an
        #     index-matrix-allocating argpartition.
        seq_parity = len(cm) <= _MAX_PLAN_CELLS
        width = min(tile_n, len(cm))
        fbuf, fbuf2, ibuf = _assign_bufs(b, width)
        rows_idx = np.arange(b)
        cand_comp, cand_pos = [], []
        for s in range(0, len(cm), tile_n):
            tile = cm[s : s + tile_n]
            w = len(tile)
            acc = fbuf[:, :w]
            if seq_parity:
                acc.fill(0.0)
                for d in range(dim):
                    acc += vm[:, d : d + 1] * tile[:, d][None, :]
            else:
                np.matmul(vm, tile.T, out=acc)
            denom = fbuf2[:, :w]
            # single divide by the (vn * cn) PRODUCT — dividing by
            # each factor in turn lands on different ulps than the
            # fold path's dot/(na*nb)
            np.multiply(vn[:, None], cn[s : s + w][None, :], out=denom)
            with np.errstate(divide="ignore", invalid="ignore"):
                acc /= denom
            m = denom  # reuse: holds the rounded comparator next
            np.fabs(acc, out=m)
            m *= 1e6
            m += 0.5
            np.floor(m, out=m)
            np.copysign(m, acc, out=m)
            np.nan_to_num(
                m, copy=False, nan=2e6, posinf=2e6, neginf=-2e6
            )
            comp = ibuf[:, :w]
            comp[...] = m  # cast pass
            comp *= np.int64(1) << 32
            comp -= np.arange(s, s + w, dtype=np.int64)[None, :]
            nsel = min(npb, w)
            sel_comp = np.empty((b, nsel), dtype=np.int64)
            sel_pos = np.empty((b, nsel), dtype=np.int64)
            for j in range(nsel):
                am = comp.argmax(axis=1)
                sel_comp[:, j] = comp[rows_idx, am]
                sel_pos[:, j] = am + s
                comp[rows_idx, am] = np.iinfo(np.int64).min
            cand_comp.append(sel_comp)
            cand_pos.append(sel_pos)
        ccomp = np.concatenate(cand_comp, axis=1)
        cpos = np.concatenate(cand_pos, axis=1)
        # global top-npb: the composite key IS the comparator, so a
        # plain stable argsort over the few surviving candidates per
        # row finishes the exact (cosine DESC, cell_id ASC) ranking
        sel = np.argsort(-ccomp, axis=1, kind="stable")[:, :npb]
        top = ids[np.take_along_axis(cpos, sel, axis=1)]
        own = [int(t) if ok else None for t, ok in zip(top[:, 0], valid)]
        probes = [
            [int(x) for x in row] if ok else None
            for row, ok in zip(top, valid)
        ]
        return pd.DataFrame({"own": own, "probes": probes})

    return ranked(F.col(vec_col))


def ivf_knn_graph(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    assignment: str = "auto",
) -> DataFrame:
    """``(id, neighbor_id, cosine)`` — the top-k cosine neighbors of
    EVERY corpus vector (the kNN GRAPH), distributed end-to-end.

    ``brute_force_knn``/``ivf_knn`` collect-and-broadcast their query
    set — right for serving a handful of probes, structurally wrong
    when the query set IS the corpus (SemDedup clustering, kNN-graph
    community detection, per-document nearest-neighbor features at
    100 TB). Here nothing about the corpus is ever collected:

    * ``centroids`` is the usual tiny-quantizer contract ((cell_id,
      sv) rows — the seeded lowest-id set for oracle parity, an
      ``ivf_index`` model's centers in production) and rides as PLAN
      CONSTANTS;
    * each vector's own cell AND its ``n_probe`` nearest cells are
      pure PROJECTIONS — ``array_sort`` over per-centroid
      (cosine, -cell) structs, the :func:`semantic_dedup` argmax
      generalized to top-n; row self-norms computed once;
    * the corpus side holds each vector ONCE, keyed by its own cell;
      the query side replicates each vector into its ``n_probe``
      probe cells; an equi-join on cell + a per-query top-k window
      gives the graph. Shuffle cost: one hash shuffle per side on
      cell plus the window's — never an all-pairs cross join, and a
      corpus vector can meet a query at most once (it lives in
      exactly one cell), so no pair dedup is needed.

    ``n_probe = |centroids|`` degrades to EXACT brute force (every
    query meets every corpus vector) — pinned bit-for-bit against
    ``brute_force_knn`` in tests; narrower probes trade recall for
    the ~n_cells/n_probe join shrink exactly like ``ivf_knn``.
    Cosine is rounded 1e-6 BEFORE ranking with a neighbor-id
    tiebreak — deterministic and engine-portable. Mega-cell skew is
    the :func:`semantic_dedup_assigned` story: size the quantizer
    ~n/target_cell_size; a saturated cell is tileable with the
    blocked pair machinery.

    ``assignment`` picks the cell-assignment strategy (VERDICT r8
    item 3): ``"plan"`` embeds centroids as plan constants (pure
    projection, zero Python — right up to ~10^3 cells, refused above
    ``_MAX_PLAN_CELLS``); ``"broadcast"`` ships them as a broadcast
    numpy matrix into an Arrow-batched pandas UDF (no codegen growth —
    the sqrt(N)-cell sizing path); ``"auto"`` switches at
    ``_AUTO_BROADCAST_CELLS``. Both paths use the identical
    (rounded-cosine DESC, cell_id ASC) comparator and are pinned
    bit-for-bit against each other on a shared fixture. The centroid
    collect itself is bounded at ``_MAX_BROADCAST_CELLS`` (a
    LIMIT-guarded collect, never an unbounded one — VERDICT r8
    item 6): past that, use two-level coarse quantization instead of
    a flat argmax."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators._cache import (
        scoped_persist,
    )

    cents, assignment = _validated_cents(centroids, n_probe, assignment)
    base = _flat_assigned(emb, id_col, vec_col, cents, n_probe, assignment)
    if assignment == "broadcast":
        # the assigned frame feeds BOTH sides of the cell join; on the
        # plan-constant path re-evaluating it is a cheap projection,
        # but on the broadcast path it is the Arrow-batched pandas UDF
        # over the whole corpus — without the stage boundary that UDF
        # executes twice (measured ~2x the assignment wall at 10^5
        # vectors x 10^3 cells; at 10^6 it dominates the build). Same
        # contract as incremental_knn_graph's scoped persists; on a
        # cluster this seam is a parquet materialization.
        base = scoped_persist(base, "similarity.ivf_knn_graph.assigned")
    return _graph_from_assigned(base, id_col, vec_col, k)


def _validated_cents(
    centroids: DataFrame,
    n_probe: int,
    assignment: str,
    caller: str = "ivf_knn_graph",
) -> tuple:
    """Bounded centroid collect + the shared validation contract of
    the flat kNN-graph family (see :func:`ivf_knn_graph`); returns
    (collected rows, resolved assignment). ``caller`` names the
    user-facing API in error messages."""
    cents = (
        centroids.select("cell_id", "sv")
        .limit(_MAX_BROADCAST_CELLS + 1)
        .collect()
    )
    if not cents:
        raise ValueError(f"{caller}: empty centroid set")
    if len(cents) > _MAX_BROADCAST_CELLS:
        raise ValueError(
            f"{caller}: centroid table exceeds "
            f"{_MAX_BROADCAST_CELLS} rows — use two_level_knn_graph "
            "(coarse-then-fine assignment; the fine table stays a "
            "DataFrame), not a flat driver-side argmax"
        )
    if not 1 <= n_probe <= len(cents):
        raise ValueError(
            f"{caller}: n_probe must be in [1, {len(cents)}], "
            f"got {n_probe}"
        )
    if assignment == "auto":
        assignment = (
            "plan" if len(cents) <= _AUTO_BROADCAST_CELLS else "broadcast"
        )
    if assignment not in ("plan", "broadcast"):
        raise ValueError(
            f"{caller}: assignment must be auto|plan|broadcast, "
            f"got {assignment!r}"
        )
    # Degenerate inputs (review round 9). Centroids: a zero-norm (or
    # null) centroid has no direction — every cosine against it is a
    # 0-divisor, which ANSI mode turns into a task-killing
    # DIVIDE_BY_ZERO — refuse it up front with the cell id named.
    # Corpus vectors: null / null-element vectors (null self-norm) and
    # zero vectors (0 self-norm) are EXCLUDED from the graph by
    # contract — without this filter the plan path dies on ANSI
    # division and the broadcast path would silently diverge from it.
    # NaN-element vectors pass (NaN > 0 in Spark's Double ordering)
    # and rank identically in both paths (NaN greatest).
    for row in cents:
        sv = row["sv"]
        if sv is None or not any(float(x) != 0.0 for x in sv):
            raise ValueError(
                f"{caller}: zero-norm centroid (cell_id="
                f"{row['cell_id']}) — a quantizer cell must have a "
                "direction; drop or re-fit it"
            )
    return cents, assignment


def _cell_struct_array_sql(cents, vec_sql: str, nv_sql: str) -> str:
    """Render the per-centroid ``(cosine, -cell_id)`` struct array —
    the plan-constant assignment's core expression — as ONE SQL string
    for a single ``F.expr`` parse.

    Semantically identical to the per-cell Python construction
    (``F.struct(cosine(vec, F.array(*lits), norm_a=nv), F.lit(-cell))``
    — same zip_with/aggregate fold order, same round scale, double
    literals rendered with ``repr`` which round-trips bitwise through
    the SQL parser's D-suffix doubles), but built in one py4j round
    trip instead of ~55 per centroid: profiled at 8 cells x 64 dims
    the lambda-heavy Python construction spent 1.2-1.7 s of driver
    wall in py4j socket reads per build, and at the 1,024-cell
    ``_MAX_PLAN_CELLS`` bound it would be minutes — the parser path
    is flat in cell count (guide §4-style boundary cost, on the
    driver instead of the executor)."""

    import math

    def _dot(a: str, b: str) -> str:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
            "(acc, x) -> acc + x)"
        )

    def _dlit(x) -> str:
        x = float(x)
        if math.isfinite(x):
            return repr(x) + "D"  # repr round-trips doubles bitwise
        return f"CAST('{x}' AS DOUBLE)"  # inf/-inf/nan

    structs = []
    for row in cents:
        cent = "array(" + ", ".join(_dlit(x) for x in row["sv"]) + ")"
        cos = (
            f"round({_dot(vec_sql, cent)} / "
            f"({nv_sql} * sqrt({_dot(cent, cent)})), 6)"
        )
        structs.append(
            f"named_struct('c', {cos}, 'neg_cell', {-int(row['cell_id'])})"
        )
    return "array(" + ", ".join(structs) + ")"


def _flat_assigned(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    cents: list,
    n_probe: int,
    assignment: str,
) -> DataFrame:
    """Shared flat cell assignment over a COLLECTED, validated centroid
    list: ``(id, vec, __nv, __own, __probes)`` via plan constants or
    the broadcast-numpy kernel (see :func:`ivf_knn_graph`)."""
    base = emb.select(
        F.col(id_col),
        F.col(vec_col),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("__nv"),
    ).filter(F.col("__nv").isNotNull() & (F.col("__nv") > 0))
    if assignment == "plan":
        if len(cents) > _MAX_PLAN_CELLS:
            raise ValueError(
                f"ivf_knn_graph: {len(cents)} centroids exceed the "
                f"plan-constant path's {_MAX_PLAN_CELLS}-cell bound "
                "(codegen literal blow-up) — pass "
                "assignment='broadcast'"
            )
        # descending (cosine, -cell) structs: element 1 is the
        # vector's own cell (same convention as semantic_dedup's
        # array_max), the first n_probe are its probe set. Built as a
        # single SQL parse — see _cell_struct_array_sql.
        ranked_cells = F.reverse(
            F.array_sort(
                F.expr(
                    _cell_struct_array_sql(cents, f"`{vec_col}`", "`__nv`")
                )
            )
        )
        return base.withColumn("__cells", ranked_cells).select(
            id_col,
            vec_col,
            "__nv",
            (-F.element_at("__cells", 1)["neg_cell"])
            .cast("long")
            .alias("__own"),
            F.transform(
                F.slice("__cells", 1, n_probe),
                lambda s: (-s["neg_cell"]).cast("long"),
            ).alias("__probes"),
        )
    ranked = _ranked_cells_pandas(emb.sparkSession, cents, n_probe, vec_col)
    return base.withColumn("__rc", ranked).select(
        id_col,
        vec_col,
        "__nv",
        F.col("__rc.own").alias("__own"),
        F.col("__rc.probes").alias("__probes"),
    )


def _graph_from_assigned(
    base: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """(id, vec, __nv, __own, __probes) -> the top-k cosine graph:
    corpus keyed by own cell, queries replicated into probe cells,
    sort-merge equi-join on cell, per-query top-k window. Shared by
    every cell-assignment strategy (plan constants / broadcast numpy /
    two-level)."""
    return _topk_edges(
        _scored_cell_pairs(base, base, id_col, vec_col), id_col, k
    )


def _scored_cell_pairs(
    corpus_base: DataFrame, query_base: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Candidate edges between two assigned frames: corpus side keyed
    by its OWN cell, query side replicated into its probe cells,
    sort-merge equi-join on cell, rounded cosine per met pair."""
    corpus_side = corpus_base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__nv").alias("__cn"),
        F.col("__own").alias("__cell"),
    )
    query_side = query_base.select(
        F.col(id_col).alias("__qid"),
        F.col(vec_col).alias("__qv"),
        F.col("__nv").alias("__qn"),
        F.explode("__probes").alias("__cell"),
    )
    # The cell join must NEVER broadcast: both sides are corpus-sized
    # (the query side n_probe-times over), and the pandas-UDF-backed
    # base carries no size stats — at sf1 the planner misestimated it,
    # picked a broadcast build, and blew the driver (SOAK_r9 first
    # run). The merge hint pins the scale-safe sort-merge-on-cell plan
    # regardless of estimates; AQE still handles cell skew under it.
    return (
        corpus_side.hint("merge")
        .join(query_side.hint("merge"), "__cell")
        .filter(F.col("neighbor_id") != F.col("__qid"))
        .select(
            F.col("__qid").alias(id_col),
            "neighbor_id",
            cosine(
                F.col("__qv"),
                F.col("__cv"),
                norm_a=F.col("__qn"),
                norm_b=F.col("__cn"),
            ).alias("cosine"),
        )
    )


def _topk_edges(scored: DataFrame, id_col: str, k: int) -> DataFrame:
    """Per-query top-k over candidate edges with the shared
    (rounded cosine DESC, neighbor_id ASC) comparator."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def incremental_knn_graph(
    old_graph: DataFrame,
    old_emb: DataFrame,
    new_emb: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    assignment: str = "auto",
    validate: bool = False,
) -> DataFrame:
    """Incremental kNN-graph maintenance: fold a NEW batch of vectors
    into an existing :func:`ivf_knn_graph` result without re-joining
    the old corpus against itself — the graph twin of
    ``add_to_ann_index`` / ``incremental_simhash_neardups``, for the
    daily-embedding-batch ingest.

    Parity contract (the incremental-dedup contract, applied to the
    graph): with the SAME frozen quantizer, ``k``, ``n_probe`` and
    assignment as the original build, chaining this over batches is
    BIT-FOR-BIT equal to rebuilding ``ivf_knn_graph`` over the whole
    corpus (test-pinned). That holds because top-k is mergeable:
    a full rebuild ranks each old vector over (old candidates ∪ new
    candidates), and top-k(top-k(old) ∪ new) == top-k(old ∪ new) —
    the old graph already IS top-k(old). New and old ids must be
    DISJOINT (same contract as every incremental operator here) — a
    re-delivered batch whose ids overlap the old corpus would
    silently union the stored old top-k with fresh new-side edges for
    the same vertex, producing duplicate edge sets instead of the
    advertised rebuild parity. Pass ``validate=True`` (the CLI
    ``--update-graph`` mode does) to check: one eager LIMIT-bounded
    semi-join raises with the first overlapping id. Default off so
    library callers who already enforce disjointness upstream keep a
    fully lazy operator. Quantizer drift is the rebuild signal,
    exactly as for the ANN index; deletions are
    :func:`delete_from_knn_graph`.

    Cost shape — the whole point: the corpus x corpus cell join runs
    ONLY where the batch is involved. Three pieces:

    * new queries vs (old ∪ new) corpus — |new| x cell-width join;
    * old queries vs the NEW corpus only — |old| probes meet |new|
      own-cells on the same merge-hinted cell join (never
      |old| x |old| again);
    * those candidates union the old graph's stored edges (already
      scored — no recompute) and re-rank per old vertex.

    The old corpus IS rescanned once for its map-side cell assignment
    (pure projection, no shuffle) — what is avoided is the quadratic
    piece, the old x old cell join. Both assigned frames are
    scoped-persisted: each feeds TWO join branches (old: corpus side
    of the new-query join + query side of the candidate join; new:
    the reverse), and without the stage boundary the full scan +
    per-vector centroid ranking would re-execute per branch — on a
    cluster you would materialize the assignments to parquet at the
    same seam."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators._cache import (
        scoped_persist,
    )

    cents, assignment = _validated_cents(
        centroids, n_probe, assignment, caller="incremental_knn_graph"
    )
    if validate:
        # eager, LIMIT-bounded disjointness check (docstring contract):
        # id-projection semi-join, stops at the first overlap
        clash = (
            new_emb.select(id_col)
            .join(old_emb.select(id_col), id_col, "left_semi")
            .limit(1)
            .collect()
        )
        if clash:
            raise ValueError(
                f"incremental_knn_graph: new-batch id "
                f"{clash[0][id_col]!r} already exists in the old "
                "corpus — new and old ids must be disjoint (a "
                "re-delivered batch would silently duplicate that "
                "vertex's edge set); dedup the batch or rebuild"
            )
    assigned_old = scoped_persist(
        _flat_assigned(old_emb, id_col, vec_col, cents, n_probe, assignment),
        "similarity.incremental_knn_graph.old",
    )
    assigned_new = scoped_persist(
        _flat_assigned(new_emb, id_col, vec_col, cents, n_probe, assignment),
        "similarity.incremental_knn_graph.new",
    )
    new_edges = _topk_edges(
        _scored_cell_pairs(
            assigned_old.unionByName(assigned_new),
            assigned_new,
            id_col,
            vec_col,
        ),
        id_col,
        k,
    )
    old_candidates = _scored_cell_pairs(
        assigned_new, assigned_old, id_col, vec_col
    )
    old_edges = _topk_edges(
        old_graph.select(id_col, "neighbor_id", "cosine").unionByName(
            old_candidates
        ),
        id_col,
        k,
    )
    return old_edges.unionByName(new_edges)


def delete_from_knn_graph(
    graph: DataFrame,
    emb: DataFrame,
    deleted: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    assignment: str = "auto",
) -> DataFrame:
    """Deletion maintenance for an :func:`ivf_knn_graph` result: drop
    the deleted vertices AND repair every surviving vertex whose
    stored top-k pointed at one — the missing half of the
    :func:`incremental_knn_graph` daily-ingest story (additions fold,
    deletions re-rank).

    Why re-rank is unavoidable for affected vertices: the graph
    stores only the top ``k`` edges, so when a stored neighbor
    disappears the (k+1)-th candidate is simply not there — no local
    patch can recover it. But the blast radius is bounded: a deleted
    vertex appears in at most (in-degree) stored edge lists, so the
    re-rank set is ~``k x |deleted|`` vertices, NOT the corpus. The
    repair is those affected queries re-run through the same
    merge-hinted cell join against the REMAINING corpus.

    Parity contract (test-pinned): with the same frozen quantizer /
    ``k`` / ``n_probe`` / assignment, the result is BIT-FOR-BIT equal
    to ``ivf_knn_graph`` rebuilt over ``emb`` minus ``deleted``.
    Proof shape: affected vertices are literally rebuilt; an
    UNaffected vertex's stored top-k contains no deleted neighbor, and
    removing non-top-k candidates from a candidate set never changes
    top-k, so its stored edges ARE the rebuild's. Edges are never
    recomputed for unaffected vertices — their stored cosines are
    reused as-is.

    ``deleted`` is a DataFrame of ids (one column named ``id_col``) —
    batch-sized by contract, joined via semi/anti joins so nothing is
    collected. Ids in ``deleted`` that never existed are ignored
    (idempotent replays are safe). 100 TB cost shape: three anti/semi
    joins on id plus ONE cell join whose query side is the
    ~``k x |deleted|`` affected set; the remaining corpus is scanned
    once for its map-side cell assignment (scoped-persisted — it
    feeds both sides of the repair join)."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators._cache import (
        scoped_persist,
    )

    cents, assignment = _validated_cents(
        centroids, n_probe, assignment, caller="delete_from_knn_graph"
    )
    dset = deleted.select(F.col(id_col)).distinct()
    surviving = graph.select(id_col, "neighbor_id", "cosine").join(
        dset, id_col, "left_anti"
    )
    affected = (
        surviving.join(
            dset.withColumnRenamed(id_col, "neighbor_id"),
            "neighbor_id",
            "left_semi",
        )
        .select(id_col)
        .distinct()
    )
    kept_edges = surviving.join(affected, id_col, "left_anti")
    remaining = emb.join(dset, id_col, "left_anti")
    assigned_rem = scoped_persist(
        _flat_assigned(remaining, id_col, vec_col, cents, n_probe, assignment),
        "similarity.delete_from_knn_graph.remaining",
    )
    affected_queries = assigned_rem.join(affected, id_col, "left_semi")
    repaired = _topk_edges(
        _scored_cell_pairs(assigned_rem, affected_queries, id_col, vec_col),
        id_col,
        k,
    )
    return kept_edges.unionByName(repaired)


def two_level_knn_graph(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    n_coarse: int | None = None,
    n_coarse_probe: int | None = None,
) -> DataFrame:
    """:func:`ivf_knn_graph` for quantizers TOO LARGE TO COLLECT —
    the regime past ``_MAX_BROADCAST_CELLS`` where even a broadcast
    centroid matrix stops being reasonable (sqrt(N) sizing crosses
    200k cells around 4x10^10 vectors). The fine centroid table stays
    a DataFrame end to end; nothing corpus- or quantizer-sized ever
    reaches the driver:

    * a COARSE quantizer of ``n_coarse`` cells (default
      ``~sqrt(|centroids|)``, capped at 4096) is drawn
      deterministically from the fine table by hash-stride
      (``xxhash64(cell_id) % stride == 0`` — no ordering shuffle, no
      collect of the big table; only the selected coarse rows are
      collected, and they are small by construction);
    * every FINE centroid is assigned to its nearest coarse cell with
      the same broadcast-numpy kernel the flat path uses (the fine
      table is just another vector corpus here);
    * every corpus vector ranks the coarse cells (same kernel), probes
      its ``n_coarse_probe`` nearest, and meets only the fine
      centroids living in those coarse cells through a sort-merge
      equi-join on coarse cell — |emb| x (fine/coarse x probes)
      candidate rows instead of |emb| x |centroids|;
    * the per-vector top-``n_probe`` fine cells use the identical
      (rounded cosine DESC, cell_id ASC) comparator, then the shared
      :func:`_graph_from_assigned` join/window builds the graph.

    Exactness contract: ``n_coarse_probe`` >= the DRAWN coarse count
    (hash-stride draws ~n_fine/stride cells, not exactly
    ``n_coarse``) makes every fine cell reachable, and the result is
    pinned BIT-FOR-BIT against the flat-assignment graph in tests;
    narrower coarse probes trade recall exactly like IVF probing (a
    vector can miss a fine cell whose coarse parent it did not
    probe).

    ``n_coarse_probe`` DEFAULT (round 10, recall-guided): ``None``
    resolves to ``max(2, round(sqrt(drawn coarse count)))`` — the
    measured SOAK_r10 curve on the dispersed 20k-vector corpus
    (1,024 fine / ~36 drawn coarse cells, edge overlap vs the flat
    graph) reads 0.22 / 0.34 / 0.48 / 0.66 / 0.96 at 2 / 4 / 8 / 16
    / 32 probes, and the clustered 1M-vector corpus (10^4 fine / 100
    coarse) measured recall 0.897 vs exact at just 4 probes — the
    sqrt-rule lands on the useful part of both curves while keeping
    assignment work per vector ~sqrt(C), where the old constant
    default of 2 sat at 0.22 overlap (silent low recall)."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators._cache import (
        scoped_persist,
    )

    assigned = _two_level_assigned(
        emb, id_col, vec_col, centroids, n_probe, n_coarse, n_coarse_probe,
        caller="two_level_knn_graph",
    )
    # both sides of the graph join read the assignment, whose lineage
    # here is always the coarse-ranking UDF plus the fine-centroid
    # join — persist the seam (see ivf_knn_graph's broadcast note)
    assigned = scoped_persist(
        assigned, "similarity.two_level_knn_graph.assigned"
    )
    return _graph_from_assigned(assigned, id_col, vec_col, k)


def two_level_cell_assignment(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    n_coarse: int | None = None,
    n_coarse_probe: int | None = None,
    cell_col: str = "cell_id",
) -> DataFrame:
    """Own-cell assignment through the coarse-then-fine join — the
    pre-assignment feeder for :func:`semantic_dedup_assigned` when the
    quantizer is too large to collect (the path semantic_dedup's
    >``_MAX_BROADCAST_CELLS`` error points at). Returns
    ``(id, vec, cell_col)`` where the cell is the vector's top fine
    centroid by the shared (rounded cosine DESC, cell_id ASC)
    comparator, searched only within the ``n_coarse_probe`` probed
    coarse cells. With every coarse cell probed the assignment equals
    the flat argmax bit-for-bit (test-pinned); narrower probes can
    mis-assign a vector whose true cell hides behind an unprobed
    coarse parent — the same recall trade as IVF probing, acceptable
    for dedup because SemDedup only compares WITHIN cells."""
    assigned = _two_level_assigned(
        emb, id_col, vec_col, centroids, 1, n_coarse, n_coarse_probe,
        caller="two_level_cell_assignment",
    )
    return assigned.select(
        id_col, vec_col, F.col("__own").alias(cell_col)
    )


def _two_level_assigned(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    n_probe: int,
    n_coarse: int | None,
    n_coarse_probe: int | None,
    caller: str = "two_level_knn_graph",
) -> DataFrame:
    """Shared coarse-then-fine assignment: ``(id, vec, __nv, __own,
    __probes)`` with the fine table kept as a DataFrame end to end
    (see :func:`two_level_knn_graph` for the plan shape)."""
    import math

    n_fine = centroids.count()
    if n_fine == 0:
        raise ValueError(f"{caller}: empty centroid set")
    if not 1 <= n_probe <= n_fine:
        raise ValueError(
            f"{caller}: n_probe must be in [1, {n_fine}], "
            f"got {n_probe}"
        )
    if n_coarse is None:
        n_coarse = min(4096, max(1, round(math.sqrt(n_fine))))
    stride = max(1, n_fine // n_coarse)
    coarse = (
        centroids.filter(F.pmod(F.xxhash64("cell_id"), F.lit(stride)) == 0)
        .select("cell_id", "sv")
        .limit(_MAX_BROADCAST_CELLS)
        .collect()
    )
    if not coarse:  # hash-stride can miss on tiny tables — fall back
        coarse = centroids.select("cell_id", "sv").limit(1).collect()
    for row in coarse:
        if row["sv"] is None or not any(float(x) != 0.0 for x in row["sv"]):
            raise ValueError(
                f"{caller}: zero-norm coarse centroid "
                f"(cell_id={row['cell_id']})"
            )
    if n_coarse_probe is None:
        # sqrt-rule default (round 10, measured — SOAK_r10): probing
        # ~sqrt(n_coarse) coarse cells keeps assignment work per
        # vector at ~sqrt(C) fine candidates while landing on the
        # useful part of the recall curve — 1M clustered vectors
        # through 10^4 fine / 100 coarse cells measured recall 0.897
        # vs exact at 4 probes (sqrt-rule: 10), and the dispersed
        # 20k-vector sf1 corpus measured edge overlap vs flat of
        # 0.48 at 8-of-36 (sqrt-rule: 6 -> ~0.43). The old constant
        # default of 2 sat at 0.22 overlap on that curve — silent
        # low-recall territory (VERDICT r9). Exactness callers pass
        # n_coarse_probe >= the drawn coarse count (hash-stride draws
        # ~n_fine/stride cells, not exactly n_coarse).
        n_coarse_probe = max(2, round(math.sqrt(len(coarse))))
    n_coarse_probe = min(n_coarse_probe, len(coarse))

    def with_coarse(df, rank_n, out_col):
        ranked = _ranked_cells_pandas(
            df.sparkSession, coarse, rank_n, "sv" if "sv" in df.columns else vec_col
        )
        return df.withColumn("__crc", ranked).withColumn(
            out_col,
            F.col("__crc.probes") if rank_n > 1 else F.array("__crc.own"),
        ).drop("__crc")

    # fine centroids -> their single nearest coarse cell
    fine_assigned = (
        with_coarse(
            centroids.select("cell_id", "sv").filter(
                F.col("sv").isNotNull()
            ),
            1,
            "__coarse",
        )
        .select(
            F.col("cell_id").alias("__fcell"),
            F.col("sv").alias("__fsv"),
            F.sqrt(dot(F.col("sv"), F.col("sv"))).alias("__fn"),
            F.explode("__coarse").alias("__ccell"),
        )
        .filter(F.col("__fn") > 0)
    )
    # corpus vectors -> probed coarse cells -> candidate fine cells ->
    # top-n_probe fine cells by the shared comparator
    vec_coarse = with_coarse(
        emb.select(
            F.col(id_col),
            F.col(vec_col),
            F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("__nv"),
        ).filter(F.col("__nv").isNotNull() & (F.col("__nv") > 0)),
        n_coarse_probe,
        "__cprobes",
    ).select(
        id_col, vec_col, "__nv", F.explode("__cprobes").alias("__ccell")
    )
    from pyspark.sql.window import Window

    cand = (
        vec_coarse.hint("merge")
        .join(fine_assigned.hint("merge"), "__ccell")
        .select(
            id_col,
            vec_col,
            "__nv",
            "__fcell",
            cosine(
                F.col(vec_col),
                F.col("__fsv"),
                norm_a=F.col("__nv"),
                norm_b=F.col("__fn"),
            ).alias("__fc"),
        )
    )
    wf = Window.partitionBy(id_col).orderBy(
        F.desc("__fc"), F.asc("__fcell")
    )
    return (
        cand.withColumn("__frn", F.row_number().over(wf))
        .filter(F.col("__frn") <= n_probe)
        .groupBy(id_col)
        .agg(
            F.first(vec_col).alias(vec_col),
            F.first("__nv").alias("__nv"),
            F.min(F.when(F.col("__frn") == 1, F.col("__fcell"))).alias(
                "__own"
            ),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__frn", "__fcell"))
                ),
                lambda s: s["__fcell"],
            ).alias("__probes"),
        )
    )


def assign_cells(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    caller: str = "assign_cells",
    keep_vec: bool = False,
) -> DataFrame:
    """Every usable vector's argmax-cosine cell under a packed
    broadcast centroid table — the shared zero-shuffle assignment
    kernel of :func:`~..operators.splits.cluster_balanced_sample` and
    :func:`~..operators.drift.embedding_drift`.

    ``centroids`` is the usual tiny-quantizer relation ``(cell_id,
    sv)``; it is LIMIT-collect-bounded at ``_MAX_BROADCAST_CELLS``
    (past that, pre-assign with :func:`two_level_cell_assignment`) and
    validated: empty sets and zero/NaN/Inf-norm centroids are refused
    by id (an Inf-norm centroid's cosines are all Inf/Inf = NaN, which
    ranks GREATEST and would swallow every vector). The packed row
    carries precomputed centroid norms so the dim-length self-norm
    fold is not re-evaluated once per (vector, cell) pair.

    Output: ``(id, cell_id, own_cosine[, vec])`` — cosine rounded
    1e-6, cell tiebreak lowest id (array_max over (cosine, -cell)
    structs, order-independent of collect_list packing). Degenerate
    corpus vectors (null / zero / NaN / Inf norm) are EXCLUDED, not
    fatal — the semantic_decontaminate contract."""
    import math

    cents = (
        centroids.select(
            F.col("cell_id").cast("long").alias("__cid"),
            F.col("sv").alias("__sv"),
            F.sqrt(dot(F.col("sv"), F.col("sv"))).alias("__sn"),
        )
        .limit(_MAX_BROADCAST_CELLS + 1)
        .collect()
    )
    if len(cents) > _MAX_BROADCAST_CELLS:
        raise ValueError(
            f"{caller}: centroid table exceeds "
            f"{_MAX_BROADCAST_CELLS} rows — assign cells with "
            "two_level_cell_assignment (the quantizer stays a "
            "DataFrame) instead of a flat driver-side argmax"
        )
    bad = [
        r["__cid"]
        for r in cents
        if r["__sn"] is None or not math.isfinite(r["__sn"]) or r["__sn"] <= 0
    ]
    if not cents or bad:
        raise ValueError(
            f"{caller}: empty centroid set"
            if not cents
            else f"{caller}: unusable (zero/NaN-norm) centroids "
            f"{bad} — drop or re-fit them"
        )
    spark = emb.sparkSession
    c_df = spark.createDataFrame(
        [
            (r["__cid"], [float(x) for x in r["__sv"]], float(r["__sn"]))
            for r in cents
        ],
        "cell_id long, sv array<double>, sn double",
    )
    packed = c_df.agg(
        F.collect_list(F.struct("cell_id", "sv", "sn")).alias("__cells")
    )
    nv = F.sqrt(dot(F.col(vec_col), F.col(vec_col)))
    best = F.array_max(
        F.transform(
            F.col("__cells"),
            lambda c: F.struct(
                cosine(
                    F.col(vec_col),
                    c["sv"],
                    norm_a=F.col("__nv"),
                    norm_b=c["sn"],
                ).alias("c"),
                (-c["cell_id"]).alias("neg_cell"),
            ),
        )
    )
    return (
        emb.select(F.col(id_col), F.col(vec_col), nv.alias("__nv"))
        .filter(
            F.col("__nv").isNotNull()
            & ~F.isnan("__nv")
            & (F.col("__nv") > 0)
            & (F.col("__nv") < F.lit(float("inf")))
        )
        .crossJoin(F.broadcast(packed))
        .select(
            id_col,
            (-best["neg_cell"]).alias("cell_id"),
            best["c"].alias("own_cosine"),
            *([vec_col] if keep_vec else []),
        )
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    min_cosine: float = 0.99,
    assignment: str = "auto",
) -> DataFrame:
    """SemDedup-shape semantic deduplication (cluster-then-prune, the
    Abbas et al. 2023 recipe, arXiv:2303.09540): assign every vector
    to its most-similar centroid, then inside each cluster drop any
    vector whose cosine to an EARLIER (lower-id) cluster member is
    >= ``min_cosine``. Returns one row per dropped vector:
    (id, cell_id, dup_of = the smallest matching earlier id, cosine).

    This is the deterministic earlier-wins variant (no chaining: the
    witness may itself be dropped), which makes the whole operation
    closed-form — with a deterministic centroid set it is fully
    SQL-oracle-able, unlike greedy sequential SemDedup whose keep-set
    depends on iteration order. ``centroids`` is (cell_id, sv); pass
    the seeded lowest-id quantizer for oracle parity or an
    ``ivf_index`` KMeans model's centroids for production recall.

    Scale shape: the centroid set is tiny by contract (a quantizer),
    so it is collected once and the argmax-cosine assignment compiles
    to a pure PROJECTION — array_max over per-centroid (cosine,
    -cell_id) structs, zero shuffle, no join (an earlier broadcast-NLJ
    + groupBy formulation shuffled |emb| x n_cells rows carrying full
    vector copies). The intra-cluster pair join is an equi-join on
    cell_id, O(sum of cluster_size^2) — bounded by sizing the centroid
    count ~n/target_cluster_size exactly like IVF cells, and tileable
    with blocked_self_join_pairs if a cluster saturates.

    ``assignment`` is the same strategy switch as
    :func:`ivf_knn_graph` (VERDICT r8 item 3): ``"plan"`` compiles the
    argmax to plan constants (refused past ``_MAX_PLAN_CELLS``);
    ``"broadcast"`` routes through the broadcast-numpy pandas UDF —
    the n/cluster_size-sized quantizer at corpus scale is exactly the
    sqrt(N)-cells regime where codegen literals stop working;
    ``"auto"`` switches at ``_AUTO_BROADCAST_CELLS``. Both paths share
    the (rounded-cosine DESC, cell_id ASC) comparator and are pinned
    value-identical in tests."""
    cents = (
        centroids.select("cell_id", "sv")
        .limit(_MAX_BROADCAST_CELLS + 1)
        .collect()
    )
    if not cents:
        raise ValueError("semantic_dedup: empty centroid set")
    if len(cents) > _MAX_BROADCAST_CELLS:
        raise ValueError(
            f"semantic_dedup: centroid table exceeds "
            f"{_MAX_BROADCAST_CELLS} rows — pre-assign cells (with "
            "ivf_index, or two_level_cell_assignment for a quantizer "
            "this size) and call semantic_dedup_assigned"
        )
    if assignment == "auto":
        assignment = (
            "plan" if len(cents) <= _AUTO_BROADCAST_CELLS else "broadcast"
        )
    if assignment == "plan":
        if len(cents) > _MAX_PLAN_CELLS:
            raise ValueError(
                f"semantic_dedup: {len(cents)} centroids exceed the "
                f"plan-constant path's {_MAX_PLAN_CELLS}-cell bound — "
                "pass assignment='broadcast'"
            )
        # Row self-norm computed ONCE per vector (not once per
        # centroid); each centroid's self-dot is a constant Catalyst
        # folds away. Built as a single SQL parse — see
        # _cell_struct_array_sql.
        best = F.array_max(
            F.expr(_cell_struct_array_sql(cents, f"`{vec_col}`", "`__nv`"))
        )
        assigned = (
            emb.withColumn(
                "__nv", F.sqrt(dot(F.col(vec_col), F.col(vec_col)))
            )
            .withColumn("__best", best)
            .select(
                F.col(id_col),
                F.col(vec_col),
                (-F.col("__best.neg_cell")).cast("long").alias("cell_id"),
            )
        )
    elif assignment == "broadcast":
        ranked = _ranked_cells_pandas(emb.sparkSession, cents, 1, vec_col)
        assigned = emb.withColumn("__rc", ranked).select(
            F.col(id_col),
            F.col(vec_col),
            F.col("__rc.own").alias("cell_id"),
        )
    else:
        raise ValueError(
            f"semantic_dedup: assignment must be auto|plan|broadcast, "
            f"got {assignment!r}"
        )
    return semantic_dedup_assigned(
        assigned, id_col, vec_col, "cell_id", min_cosine
    )


def semantic_dedup_assigned(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str = "cell_id",
    min_cosine: float = 0.99,
) -> DataFrame:
    """The prune stage of :func:`semantic_dedup` over a corpus that
    already carries a cluster column — e.g. the `cell` assignment an
    ``ivf_index`` KMeans model produces. This is the production
    composition: fit the quantizer once (cells sized ~n/64), reuse the
    assignment for BOTH the ANN index and semantic dedup.

    In-cluster pairs are generated with dedup.blocked_self_join_pairs
    (VERDICT r3 nit 1): a plain cell_id equi-join put a mega-cluster's
    k^2/2 pairs in ONE task (AQE can't split it — it sizes by input
    bytes, the cost is output rows); the tiled generator fans each
    cluster over block-pair cells, so the worst task is bounded at
    ~block_rows^2 pairs regardless of cluster skew — the same pair
    machinery lsh_neardup_pairs uses."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.dedup import (
        blocked_self_join_pairs,
    )

    with_norm = assigned.select(
        F.col(id_col).alias("__id"),
        F.col(cell_col).alias("cell_id"),
        F.col(vec_col).alias("__v"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("__nrm"),
    )
    pairs = (
        blocked_self_join_pairs(
            with_norm, ["cell_id"], "__id", ("__v", "__nrm")
        )
        .select(
            "cell_id",
            F.col("id_a").alias("__id_a"),
            F.col("id_b").alias("__id_b"),
            cosine(
                F.col("__v_a"),
                F.col("__v_b"),
                norm_a=F.col("__nrm_a"),
                norm_b=F.col("__nrm_b"),
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )
    return (
        pairs.groupBy("__id_b", "cell_id")
        .agg(
            F.min(F.struct(F.col("__id_a").alias("id_a"), F.col("cosine").alias("cosine"))).alias("m")
        )
        .select(
            F.col("__id_b").alias(id_col),
            "cell_id",
            F.col("m.id_a").alias("dup_of"),
            F.col("m.cosine").alias("cosine"),
        )
    )


# --- Product quantization (round 3) --------------------------------------


def _round_half_up(x: float, scale: int = 6) -> float:
    """SQL-compatible rounding (half away from zero for positives);
    Python round() is banker's and disagrees on exact ties."""
    import math

    p = 10.0**scale
    return math.floor(x * p + 0.5) / p


def seeded_pq_codebooks(
    m: int, k: int, dim: int, seed: str = "pq", scale: float = 0.25
) -> list:
    """Data-INDEPENDENT codebooks from the same seeded-hash generator
    as the LSH hyperplanes: m subspace codebooks of k centroids each,
    entries in ``[-scale, scale)``. These exist so the PQ encode + ADC
    search machinery can be driven through the DuckDB oracle — the
    codebook floats are plan constants embeddable as SQL literals,
    exactly like the seeded IVF centroids. Production fits
    :func:`pq_codebooks` (k-means) instead; everything downstream
    (encode, ADC) is the identical code path."""
    import numpy as np

    sub = dim // m
    if sub * m != dim:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    return [
        np.array(
            [
                [
                    _seeded_unit(f"{seed}:{j}:{c}:{d}") * scale
                    for d in range(sub)
                ]
                for c in range(k)
            ]
        )
        for j in range(m)
    ]


def pq_codebooks(
    emb: DataFrame,
    vec_col: str = "v",
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    sample_limit: int = 10_000,
) -> list:
    """Fit per-subspace codebooks for product quantization.

    Splits the dimension into ``m`` contiguous subspaces and runs a
    seeded Lloyd's k-means (numpy, driver-side) on a bounded sample of
    each — codebooks are tiny plan constants exactly like IVF
    centroids and LSH planes, so the fit cost is O(sample), never
    O(corpus). Returns a list of m (k x d/m) float arrays.

    The sample is taken by CONTENT-hash order (TakeOrderedAndProject
    over md5 of the vector bytes), not ``limit``: a bare limit is
    partition-layout-dependent, so the same corpus written in a
    different file order yielded different codebooks despite the fixed
    seed (ADVICE r3). Hash order is a property of the data alone —
    codebooks are now stable across repartitions/sorts — and a
    hash-ordered prefix is an unbiased sample of a sorted/clustered
    corpus, where a positional prefix is maximally biased. ``k`` is
    clamped to the sample size so undersized corpora degrade to fewer
    centroids instead of raising inside ``rng.choice``.
    """
    import numpy as np

    sample = np.array(
        [
            r[0]
            for r in emb.select(vec_col)
            .orderBy(F.md5(F.to_json(F.col(vec_col))), F.col(vec_col))
            .limit(sample_limit)
            .collect()
        ]
    )
    if len(sample) == 0:
        raise ValueError("pq_codebooks: empty corpus")
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    k = min(k, len(sample))
    sub = d // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        x = sample[:, j * sub : (j + 1) * sub]
        cents = x[rng.choice(len(x), size=k, replace=False)].copy()
        for _ in range(15):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                pts = x[assign == c]
                if len(pts):
                    cents[c] = pts.mean(axis=0)
        books.append(cents)
    return books


def pq_encode(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list,
    dist_round: int | None = None,
) -> DataFrame:
    """Encode vectors to m small codes (nearest centroid per
    subspace) — the 4-bit/8-bit-per-subspace representation that cuts
    vector storage ~32-64x. Vectorized numpy over ``mapInPandas``
    (per-row argmin over m*k centroids is the designed Pandas-UDF
    site; everything downstream of the codes stays in pure exprs).

    ``dist_round``: round subspace distances (half away from zero) at
    this scale BEFORE the argmin, making the code assignment portable
    across engines that compute the same distance with a different
    floating-point expression order (the DuckDB oracle uses the
    |a|^2 - 2ab + |b|^2 expansion); argmin tie-break is first-index on
    both sides. None (default) keeps the production exact argmin."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    sub = codebooks[0].shape[1]
    books = [b.copy() for b in codebooks]
    out_schema = f"{id_col} long, codes array<int>"

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist())
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(
                    axis=2
                )
                if dist_round is not None:
                    p = 10.0**dist_round
                    d2 = np.floor(d2 * p + 0.5) / p
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "codes": list(codes)}
            )

    return emb.select(id_col, vec_col).mapInPandas(encode, out_schema)


def pq_search_adc(
    codes_df: DataFrame,
    codebooks: list,
    queries: DataFrame,
    id_col: str,
    query_id_col: str,
    qvec_col: str = "qv",
    k: int = 5,
    table_round: int | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes.

    ``table_round``: round each per-(query, subspace, centroid) table
    entry (half away from zero) before shipping, so an oracle engine
    recomputing the same entries with a different float expression
    order sums IDENTICAL values — the final sum of m rounded doubles
    is then bit-equal under the same left-to-right fold order.

    Per query, the m x k table of exact subspace distances to every
    centroid is precomputed driver-side (queries are few by the same
    bounded contract as ivf_knn) and shipped as a literal column; a
    corpus row's approximate L2^2 is then just m table lookups summed
    — `aggregate(zip_with(codes, tables, (c, t) -> t[c+1]))`, pure
    JVM-side exprs over the 32-64x-smaller codes, no decode, no float
    vectors streaming through the join. Distances round at 1e-6 before
    ranking; ties break on the neighbor id."""
    import numpy as np

    from pyspark.sql.window import Window

    m = len(codebooks)
    sub = codebooks[0].shape[1]
    rows = []
    for r in queries.collect():
        qv = np.array(r[qvec_col])
        tables = []
        for j in range(m):
            qs = qv[j * sub : (j + 1) * sub]
            ent = [float(((qs - c) ** 2).sum()) for c in codebooks[j]]
            if table_round is not None:
                ent = [_round_half_up(v, table_round) for v in ent]
            tables.append(ent)
        rows.append((r[query_id_col], tables))
    spark = queries.sparkSession
    q_df = spark.createDataFrame(
        rows, f"{query_id_col} long, tables array<array<double>>"
    )
    scored = (
        codes_df.crossJoin(F.broadcast(q_df))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            F.round(
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
            ).alias("adc_dist"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
