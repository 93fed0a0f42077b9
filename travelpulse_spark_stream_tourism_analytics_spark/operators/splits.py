"""Leakage-safe train/validation splitting and budgeted mixture sampling.

Splitting a corpus doc-by-doc leaks: two near-duplicate documents can
land on opposite sides, and the model is then evaluated on (almost)
training data. The safe unit is the NEAR-DUP CLUSTER — every member
of a connected component (operators/components.py over the verified
near-dup pairs) goes to the same side.

The assignment is the engine's standard deterministic-hash split
(md5-hex threshold, like docs_stratified_sample): reproducible across
runs/engines, no RNG state, and a document ADDED to an existing
cluster later lands on that cluster's side automatically. One
broadcast-or-shuffle join of docs against the (tiny) component map;
singleton docs hash on their own id.

``sample_to_token_budget`` is the other half of mixture construction:
given per-source mixture weights and a total token budget, pick the
actual documents — per source, in deterministic md5 order, keeping
docs while the running token total stays within that source's share of
the budget. (The mixture weights say WHAT fraction each source should
contribute; this picks WHICH documents realize it.)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cluster_safe_split(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    component_col: str = "component",
    val_hex_prefixes: str = "012",
) -> DataFrame:
    """Append ``split`` ('train' | 'val') such that every doc in the
    same near-dup component gets the same side.

    ``components`` is (id, component) as produced by
    connected_components / connected_components_star — it covers only
    docs that HAVE a near-dup edge; uncovered docs form singleton
    groups keyed by their own id. ``val_hex_prefixes`` selects the val
    share in 16ths of the md5 key space ('012' -> 3/16 ~= 19%); the
    hex-threshold trick keeps the split engine-portable and exactly
    reproducible (no Bernoulli RNG)."""
    comp = components.select(
        F.col(id_col), F.col(component_col).alias("__grp")
    )
    grouped = docs.join(comp, id_col, "left").withColumn(
        "__grp", F.coalesce(F.col("__grp"), F.col(id_col))
    )
    first_hex = F.substring(F.md5(F.col("__grp").cast("string")), 1, 1)
    chars = [F.lit(c) for c in val_hex_prefixes]
    return grouped.withColumn(
        "split",
        F.when(first_hex.isin(*chars), F.lit("val")).otherwise(
            F.lit("train")
        ),
    ).drop("__grp")


def temperature_weights(
    docs: DataFrame,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    alpha: float = 0.3,
) -> DataFrame:
    """``(source, weight)`` — temperature-scaled mixture weights from
    the corpus's own per-source token mass: ``w_i = t_i^alpha /
    sum_j t_j^alpha`` (Conneau & Lample 2019; the XLM-R / multilingual
    pretraining standard, also how Llama-class mixes rebalance
    low-resource sources). ``alpha=1`` reproduces the natural
    proportions, ``alpha=0`` is uniform, and the usual 0.2-0.7 range
    upsamples small sources without letting any source dominate.
    Feed directly into ``sample_to_token_budget``.

    One partial-agg shuffle on source; the normalizer rides as a
    broadcast 1-row aggregate (lazy, no driver collect). Cross-engine
    exactness follows the mixture-branch recipe: each ``t^alpha`` is
    rounded at 1e-6 (pow is transcendental — libm vs JVM may differ a
    ulp) THEN accumulated as DECIMAL(28,6), so the normalizing sum is
    exact and order-independent; the final ratio rounds at 1e-9."""
    if alpha < 0:
        raise ValueError("temperature_weights: alpha must be >= 0")
    per = docs.groupBy(source_col).agg(
        F.sum(tokens_col).cast("double").alias("__t")
    )
    num = F.round(F.pow(F.col("__t"), F.lit(float(alpha))), 6).cast(
        "decimal(28,6)"
    )
    z = per.agg(F.sum(num).alias("__z"))
    return per.crossJoin(F.broadcast(z)).select(
        source_col,
        F.round(
            num.cast("double") / F.col("__z").cast("double"), 9
        ).alias("weight"),
    )


def sample_to_token_budget(
    docs: DataFrame,
    weights: DataFrame,
    budget_tokens: int | None = None,
    budget_frac: float | None = None,
    id_col: str = "doc_id",
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Select documents realizing a token-budgeted source mixture.

    ``weights`` is ``(source, weight)`` (e.g. the temperature-scaled
    mixture of docs_stratified_sample); each source's budget is
    ``floor(weight * B)`` tokens where ``B`` is ``budget_tokens`` or
    ``budget_frac * total corpus tokens`` (the latter stays lazy — the
    total rides as a broadcast 1-row aggregate, the same recipe as the
    PSI/perplexity edges). Within a source, docs are taken in
    ``md5(id)`` order (deterministic, engine-portable, uncorrelated
    with any data attribute) while the running token total INCLUDING
    the candidate stays <= the budget — greedy next-fit, may undershoot
    by less than one document, never overshoots.

    Scale shape: a naive per-source cumulative-sum window sorts each
    whole source in ONE task — the biggest source becomes a
    straggler at 100 TB. Instead the running sum is two-phase, keyed by
    the first two md5 hex chars (256 buckets): (1) per-(source,bucket)
    token totals — one partial-agg shuffle, then a window over at most
    256 rows per source gives each bucket's starting offset; (2) a
    window WITHIN each (source,bucket) — bounded sort width — adds the
    offset. Ordering by (bucket, full-md5) is the plain md5 order, so
    the two-phase result is identical to the naive window.

    Returns the kept docs with ``__cum_tokens`` (running total through
    this doc) and ``__budget_tokens`` (the source's budget) appended.
    """
    if (budget_tokens is None) == (budget_frac is None):
        raise ValueError("pass exactly one of budget_tokens / budget_frac")
    d = docs.withColumn(
        "__ok", F.md5(F.col(id_col).cast("string"))
    ).withColumn("__bk", F.substring("__ok", 1, 2))

    if budget_frac is None:
        b_expr = F.lit(float(budget_tokens))
        budgets = weights
    else:
        total = docs.agg(
            F.sum(tokens_col).cast("double").alias("__total")
        )
        budgets = weights.crossJoin(F.broadcast(total))
        b_expr = F.lit(float(budget_frac)) * F.col("__total")
    budgets = budgets.select(
        F.col(source_col),
        F.floor(F.col("weight") * b_expr).cast("long").alias(
            "__budget_tokens"
        ),
    )

    per_bucket = d.groupBy(source_col, "__bk").agg(
        F.sum(tokens_col).cast("long").alias("__bt")
    )
    w_buckets = (
        Window.partitionBy(source_col)
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bases = per_bucket.select(
        source_col,
        "__bk",
        (F.sum("__bt").over(w_buckets) - F.col("__bt")).alias("__base"),
    )

    w_in = (
        Window.partitionBy(source_col, "__bk")
        .orderBy("__ok", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        d.join(F.broadcast(bases), [source_col, "__bk"])
        .withColumn(
            "__cum_tokens",
            F.col("__base") + F.sum(tokens_col).over(w_in),
        )
        .drop("__base", "__bk")
    )
    return (
        cum.join(F.broadcast(budgets), source_col)
        .filter(F.col("__cum_tokens") <= F.col("__budget_tokens"))
        .drop("__ok")
    )


def weighted_sample_without_replacement(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    stratify_col: str | None = None,
    seed: str = "es5",
    key_col: str = "es_key",
    rank_col: str = "es_rank",
    scale: int = 9,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — top-k per
    stratum under the Efraimidis-Spirakis A-ES scheme (Inf. Proc.
    Letters 2006): each row gets key ``u^(1/w)`` for a uniform u, and
    the k largest keys are a weighted sample without replacement.

    The uniform is hash-derived, not RNG: ``u = (md5(id || seed)[:8 hex]
    + 0.5) / 2^32`` — reproducible across runs, partitionings, and
    engines (the SQL twin spells the identical arithmetic), the same
    engine-portability argument as the md5-threshold sampler. Keys are
    rounded BEFORE ranking with an id tie-break, so the one-ulp
    divergence transcendental pow() is allowed between libm and the JVM
    cannot flip a selection at the k boundary.

    ``scale`` trades those two pressures. Keys for weight w live in
    ``[exp(-22/w), 1)`` — a band of width ~22/w — so rounding must be
    much finer than ``22/(w·k)`` or heavy rows collapse into rounded
    ties broken by id (destroying the weighted randomness exactly for
    the rows that matter most), while each extra digit multiplies the
    chance a 1-ulp (~2^-52) divergence lands on a rounding boundary.
    The default 1e-9 keeps full selectivity for weights up to ~1e6
    (token/char counts of real documents) with boundary-collision
    probability ~1e-7 per row; for weights beyond ~1e7, pre-scale the
    weight column (only ratios matter in A-ES) rather than raising
    ``scale``.

    Scale shape: one scan computing the key (codegen'd hash + pow), one
    rank. Per-stratum top-k uses a window only over rows that survive
    nothing — at 100 TB swap the window for the standard two-phase
    top-k (per-partition TakeOrdered then merge) if strata are huge;
    the unstratified path (stratify_col=None) already plans
    TakeOrderedAndProject via orderBy+limit semantics when consumed
    with a limit.

    Rows with non-positive weight are excluded (zero-weight items have
    zero selection probability; the key is undefined for w <= 0).
    """
    d = df.filter(F.col(weight_col) > 0)
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    u = (v + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.round(F.pow(u, F.lit(1.0) / F.col(weight_col)), scale)
    d = d.withColumn(key_col, key)
    part = (
        Window.partitionBy(stratify_col)
        if stratify_col is not None
        else Window.partitionBy()
    )
    w = part.orderBy(F.desc(key_col), F.asc(id_col))
    return (
        d.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )


def cluster_balanced_sample(
    emb: DataFrame,
    centroids: DataFrame,
    cap: int,
    id_col: str = "doc_id",
    vec_col: str = "v",
) -> DataFrame:
    """Embedding-cluster-balanced subsampling: assign every vector to
    its max-cosine centroid cell, then keep at most ``cap`` members
    per cell in deterministic md5 order — the diversity-sampling
    primitive (cap the over-represented embedding neighborhoods
    instead of sampling them proportionally; the cluster-level
    counterpart of per-domain caps, and the keep-some complement of
    SemDedup's prune-all-but-one).

    100 TB shape: the centroid table (sized ~n/target_cluster by the
    caller, small by construction) packs into ONE broadcast row via
    the shared :func:`~..operators.similarity.assign_cells` kernel —
    cell assignment is pure array expressions fused into the scan,
    the same zero-shuffle kernel as semantic_decontaminate; the only
    shuffle is the per-cell cap window, keyed by cell. Determinism:
    cosine rounded 1e-6, cell tiebreak lowest id (array_max over
    (cosine, -cell) structs — order-independent of collect_list
    packing), in-cell order md5(id) with an id tiebreak.

    Degenerate inputs follow the semantic_decontaminate contract
    (enforced inside assign_cells): zero/NaN/Inf-norm centroids are
    refused by id (an unusable cell would silently swallow its
    members), same-kind vectors are excluded from the sample. The
    centroid collect is LIMIT-bounded at _MAX_BROADCAST_CELLS — past
    that, pre-assign with similarity.two_level_cell_assignment and
    cap with a window instead.
    """
    from travelpulse_spark_stream_tourism_analytics_spark.operators.similarity import (
        assign_cells,
    )

    if cap < 1:
        raise ValueError(f"cluster_balanced_sample: cap must be >= 1, got {cap}")
    assigned = assign_cells(
        emb,
        centroids,
        id_col=id_col,
        vec_col=vec_col,
        caller="cluster_balanced_sample",
    )
    w = Window.partitionBy("cell_id").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        assigned.withColumn(
            "cluster_rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("cluster_rank") <= cap)
    )


def shuffled_shards(
    docs: DataFrame,
    n_shards: int,
    seed: str = "",
    id_col: str = "doc_id",
    shard_col: str = "shard",
    pos_col: str = "pos",
    validate: bool = False,
) -> DataFrame:
    """Deterministic corpus shuffle + shard assignment — the last mile
    of a training-data pipeline: tokenized/packed rows leave the engine
    as N shard files in a shuffled order a trainer can replay exactly.

    Every row gets a shuffle key ``md5(id || ':' || seed)`` — the
    engine's standard portable-hash primitive (no RNG state, identical
    on any engine/partitioning/cluster size) — then:

    - ``shard`` = first 8 hex chars of the key as an integer, mod
      ``n_shards``. Hash-mod, NOT a global-rank range split: shard
      sizes are binomial-concentrated around N/n_shards (relative
      spread ~ 1/sqrt(N/n_shards) — at a million rows per shard,
      +-0.1%) and every shard is a statistically identical,
      mixture-preserving sample of the corpus (any prefix of any shard
      has the corpus's source mix in expectation — the property
      training-order shuffling exists to provide). The 2^32-mod bias
      is <= n_shards/2^32 per shard — irrelevant below millions of
      shards.
    - ``pos`` = 1-based rank of the key within the shard (id
      tie-break; md5 collisions on distinct ids are 2^-128 — the
      tie-break keeps determinism unconditional, not probabilistic).

    A trainer reads shards in any order but each shard sequentially by
    ``pos``; (seed, n_shards) fully determine the layout, so an epoch
    is reproducible bit-for-bit and a different ``seed`` gives an
    independent epoch order.

    Scale shape: ONE hash-partition shuffle on ``shard`` (which the
    sharded write needs anyway) and a per-shard streaming
    ``row_number`` — no global sort, no single-task rank, no driver
    collect. At 100 TB pick n_shards >> executor count (e.g. 8-64k) so
    each shard sorts a bounded slice; the window sort is the price of
    a replayable within-shard order.
    """
    if n_shards < 1:
        raise ValueError(
            f"shuffled_shards: n_shards must be >= 1, got {n_shards}"
        )
    if validate:
        # two rows with one id shuffle-key identically, and their
        # relative pos assignment is partition-order luck — the replay
        # guarantee silently breaks. One eager agg; the CLI always
        # validates (the --update-graph convention), library callers
        # opt in.
        dup = (
            docs.groupBy(id_col)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"shuffled_shards: id {dup[0][id_col]!r} appears "
                f"{dup[0]['count']} times — duplicate ids make the "
                "within-shard order nondeterministic between the "
                "copies; run exact_dedup (or drop duplicates) first"
            )
    key = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))
    )
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
        % F.lit(int(n_shards))
    ).cast("int")
    d = docs.withColumn("__shuffle_key", key).withColumn(shard_col, shard)
    w = Window.partitionBy(shard_col).orderBy("__shuffle_key", id_col)
    return (
        d.withColumn(pos_col, F.row_number().over(w).cast("long"))
        .drop("__shuffle_key")
    )


def shard_manifest(
    assigned: DataFrame,
    id_col: str = "doc_id",
    shard_col: str = "shard",
    pos_col: str = "pos",
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-shard manifest over a ``shuffled_shards`` result:
    ``(shard, n_docs, n_tokens, id_checksum)``.

    ``id_checksum`` is the DECIMAL(38,0) sum of the first 15 md5 hex
    chars of each member id as an integer — exact, order-independent,
    engine-portable (the float-free accumulation recipe every checksum
    in this engine uses), so two manifests agree iff the shards hold
    the same id SETS regardless of partitioning or engine.
    ``n_docs == max(pos)`` by construction (row_number is dense), so a
    manifest row also certifies the shard's positions are the
    contiguous 1..n_docs a sequential reader expects.

    One partial-agg shuffle on shard (map-side combined); the manifest
    is n_shards rows — write it next to the shards and a resuming
    trainer can verify a shard file without re-reading the corpus.
    """
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum(
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                16,
                10,
            ).cast("decimal(38,0)")
        ).alias("id_checksum"),
        F.max(pos_col).alias("__max_pos"),
    ]
    if tokens_col is not None:
        aggs.insert(1, F.sum(tokens_col).cast("long").alias("n_tokens"))
    else:
        aggs.insert(1, F.lit(None).cast("long").alias("n_tokens"))
    out = assigned.groupBy(shard_col).agg(*aggs)
    return out.select(
        shard_col,
        "n_docs",
        "n_tokens",
        "id_checksum",
        (F.col("n_docs") == F.col("__max_pos")).alias("positions_dense"),
    )


def verify_shards(
    spark,
    export_dir: str,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Re-derive the manifest from a written ``--mode shard`` export
    and compare it shard-by-shard against the stored one:
    ``(shard, ok, n_docs, n_docs_stored, checksum_ok, dense_ok)``.

    The consumer-side half of the manifest contract: a trainer (or a
    copy job) runs this against the export it actually sees — a
    truncated parquet file, a lost shard directory, or a re-write
    under a different seed all surface as a row with ``ok = false``
    naming the shard, without the trainer having to know anything
    about the shuffle key. Cost is one scan of the shards + the
    n_shards-row manifest join; nothing is collected.

    A shard present in the manifest but missing on disk appears with
    null recomputed counts (full outer join); a shard on disk missing
    from the manifest likewise fails with null stored counts.
    """
    import os

    stored = spark.read.parquet(
        os.path.join(export_dir, "manifest.parquet")
    ).select(
        "shard",
        F.col("n_docs").alias("n_docs_stored"),
        F.col("n_tokens").alias("n_tokens_stored"),
        F.col("id_checksum").alias("id_checksum_stored"),
    )
    written = spark.read.parquet(os.path.join(export_dir, "shards"))
    fresh = shard_manifest(
        written,
        id_col=id_col,
        tokens_col=tokens_col
        if tokens_col is not None
        else ("n_tokens" if "n_tokens" in written.columns else None),
    )
    j = fresh.join(stored, "shard", "full_outer")
    checksum_ok = (
        F.col("id_checksum").isNotNull()
        & F.col("id_checksum_stored").isNotNull()
        & (F.col("id_checksum") == F.col("id_checksum_stored"))
    )
    tokens_ok = F.coalesce(
        F.col("n_tokens") == F.col("n_tokens_stored"),
        F.col("n_tokens").isNull() & F.col("n_tokens_stored").isNull(),
    )
    counts_ok = (
        F.col("n_docs").isNotNull()
        & (F.col("n_docs") == F.col("n_docs_stored"))
    )
    dense_ok = F.coalesce(F.col("positions_dense"), F.lit(False))
    return j.select(
        "shard",
        (checksum_ok & counts_ok & dense_ok & tokens_ok).alias("ok"),
        "n_docs",
        "n_docs_stored",
        checksum_ok.alias("checksum_ok"),
        dense_ok.alias("dense_ok"),
    )
