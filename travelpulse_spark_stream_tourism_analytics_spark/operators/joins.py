"""Advanced join operators: the reference's merge machinery,
re-expressed as pure DataFrame composition (SURVEY.md §2.4).

- staged_fallback_merge (J5): try progressively looser key pairs; after
  each pass fill only still-NULL payload columns — a coalescing join
  cascade (reference scripts/rebuild_and_merge_cities_it.py:175-224).
- suffix-disambiguated merge (J7): rename colliding right columns
  before joining (reference scripts/merge_cities_all.py:66-69,119-146).
- keyed remap (J8): optional mapping table rewrites join keys pre-merge
  (reference scripts/rebuild_and_merge_cities_it.py:239-246).
- nearest_neighbor_join (J6): argmin-distance theta join via broadcast
  + per-key window (reference scripts/build_hotels_yaml.py:237-257).

Scale: every stage is a plain left join — broadcastable when the right
side is a dimension; the NULL-fill is a projection, so the cascade adds
no extra shuffles beyond its joins.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def staged_fallback_merge(
    left: DataFrame,
    right: DataFrame,
    key_pairs: Sequence[tuple[str, str]],
    payload_cols: Sequence[str],
    broadcast_right: bool = True,
) -> DataFrame:
    """Left-join `right` onto `left` trying each (left_key, right_key)
    pair in order; each pass fills only payload columns still NULL
    (pandas ``combine_first`` semantics, reference J5).

    Rows that matched an earlier (more precise) key never get
    overwritten by a later (looser) one.
    """
    out = left
    for col in payload_cols:
        if col not in out.columns:
            out = out.withColumn(col, F.lit(None))
    for lk, rk in key_pairs:
        r = right.select(
            F.col(rk).alias("__rk"),
            *[F.col(c).alias(f"__tmp_{c}") for c in payload_cols],
        )
        # Keys can repeat on the right under loose normalization; keep a
        # deterministic single candidate per key (first by payload) so
        # the cascade never fans out rows.
        r = r.groupBy("__rk").agg(
            *[F.min(f"__tmp_{c}").alias(f"__tmp_{c}") for c in payload_cols]
        )
        if broadcast_right:
            r = F.broadcast(r)
        out = out.join(r, on=out[lk] == r["__rk"], how="left").drop("__rk")
        for c in payload_cols:
            out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__tmp_{c}")))
        out = out.drop(*[f"__tmp_{c}" for c in payload_cols])
    return out


def still_missing(df: DataFrame, payload_cols: Sequence[str]) -> DataFrame:
    """Rows whose payload is entirely NULL after the cascade — the
    anti-join the reference emulates with merge+isna (J5 tail,
    reference scripts/rebuild_and_merge_cities_it.py:217-222)."""
    cond = None
    for c in payload_cols:
        term = F.col(c).isNull()
        cond = term if cond is None else (cond & term)
    return df.filter(cond)


def suffixed_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    suffix: str,
    how: str = "left",
) -> DataFrame:
    """Left join with colliding right columns renamed ``<col><suffix>``
    (reference J7)."""
    keys = [on] if isinstance(on, str) else list(on)
    collisions = (set(left.columns) & set(right.columns)) - set(keys)
    r = right
    for c in collisions:
        r = r.withColumnRenamed(c, f"{c}{suffix}")
    return left.join(r, on=keys, how=how)


def remap_keys(
    df: DataFrame, mapping: DataFrame, key: str, src: str, dst: str
) -> DataFrame:
    """Rewrite join keys through an optional (source -> target) mapping
    table; unmapped keys pass through (reference J8)."""
    m = F.broadcast(
        mapping.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    )
    return (
        df.join(m, on=df[key] == m["__src"], how="left")
        .withColumn(key, F.coalesce(F.col("__dst"), F.col(key)))
        .drop("__src", "__dst")
    )


def nearest_neighbor_join(
    probe: DataFrame,
    dim: DataFrame,
    probe_id: str,
    distance: Callable[[], Column],
    k: int = 1,
    tiebreak: str | None = None,
) -> DataFrame:
    """k-NN theta join: broadcast cross join + per-probe window
    (reference J6). `distance()` builds the metric from joined columns.
    At larger dim sizes, prefilter by a spatial cell (geohash bucket)
    before this — see operators/similarity.lsh_neardup_pairs for the
    bucketed pattern."""
    from pyspark.sql.window import Window

    joined = probe.crossJoin(F.broadcast(dim)).withColumn("__dist", distance())
    order = [F.asc("__dist")] + ([F.asc(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(probe_id).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def nearest_value_join(
    probe: DataFrame,
    corpus: DataFrame,
    probe_val: str,
    corpus_val: str,
    probe_key: str,
    corpus_key: str,
    rows_per_band: int = 1024,
) -> DataFrame:
    """1-D nearest-neighbor join: for each probe row, the corpus row
    minimizing |probe_val - corpus_val| (ties -> lowest corpus_key),
    returned as (probe columns, best struct<diff, key>).

    Scale shape (the sf1 soak lesson): the brute-force broadcast NLJ is
    |probe| x |corpus| — quadratic when both sides grow with the data
    (measured x53 wall at x10 data). In 1-D the true neighbor is the
    predecessor or successor in value order, so banding the corpus by
    its own approximate quantiles and probing only the home band plus
    its neighbors bounds candidates at ~3*rows_per_band per probe:
    equal values share a band, every band is non-empty by construction,
    so the predecessor/successor always sit in the home or adjacent
    band — exact result, linear work (a 1-D IVF). Small corpora get
    one band and degenerate to the broadcast NLJ this replaces.

    The quantile pass is one driver action over the corpus value column
    (same pattern as the IVF centroid fit); the argmin still folds
    map-side as min(struct) so only |probe| rows shuffle.

    Cost-based, like Catalyst's broadcast threshold: below
    ``brute_force_max_pairs`` probe*corpus pairs the banding overhead
    (two count actions + a quantile pass + band shuffles) exceeds its
    savings, so the operator keeps the broadcast-NLJ + map-side-argmin
    plan there and bands only when the product is genuinely large."""
    brute_force_max_pairs = 100_000_000
    n = corpus.count()
    n_probe = probe.count()
    diff_b = F.abs(F.col(probe_val) - F.col(corpus_val))
    if n * n_probe <= brute_force_max_pairs:
        best = F.min(
            F.struct(diff_b.alias("diff"), F.col(corpus_key).alias("key"))
        ).alias("best")
        streamed = probe.repartition(
            probe.sparkSession.sparkContext.defaultParallelism
        )
        return (
            streamed.crossJoin(
                F.broadcast(corpus.select(corpus_key, corpus_val))
            )
            .groupBy(*[F.col(f) for f in probe.columns])
            .agg(best)
        )
    n_bands = max(1, n // rows_per_band)
    bounds: list[float] = []
    if n_bands > 1:
        qs = [i / n_bands for i in range(1, n_bands)]
        raw = corpus.approxQuantile(corpus_val, qs, 0.001)
        bounds = sorted(set(raw))  # dedupe: equal quantiles = one band

    def band_of(col: Column) -> Column:
        if not bounds:
            return F.lit(0)
        # Plain when-sum, not a higher-order F.aggregate: the lambda
        # variable binding trips Catalyst's attribute resolution when
        # the expression sits under a join + partial aggregate.
        terms = [
            F.when(col >= F.lit(b), 1).otherwise(0) for b in bounds
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    c = corpus.select(
        F.col(corpus_key).alias("__ckey"),
        F.col(corpus_val).alias("__cval"),
        band_of(F.col(corpus_val)).alias("__band"),
    ).withColumn(
        "__probe_band",
        F.explode(
            F.array(F.col("__band") - 1, F.col("__band"), F.col("__band") + 1)
        ),
    ).filter(F.col("__probe_band").between(0, len(bounds)))
    p = probe.withColumn("__probe_band", band_of(F.col(probe_val)))
    # Explicit partition count on the join key: AQE would size this
    # exchange by its (small) input and serialize the candidate
    # expansion (see dedup.blocked_self_join_pairs).
    p = p.repartition(
        p.sparkSession.sparkContext.defaultParallelism, "__probe_band"
    )
    diff = F.abs(F.col(probe_val) - F.col("__cval"))
    best = F.min(
        F.struct(diff.alias("diff"), F.col("__ckey").alias("key"))
    ).alias("best")
    return (
        p.join(c, "__probe_band")
        .groupBy(*[F.col(f) for f in probe.columns])
        .agg(best)
        .drop("__probe_band")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """As-of (most-recent-at-or-before) left join — the temporal join
    the reference lacks (SURVEY.md §2.4 "absent: range/as-of joins").

    For each left row, attach ``right_ts`` and the ``payload`` columns
    of the right row with the greatest ``right_ts <= left_ts`` within
    the same ``on`` key (inclusive on ties). Left rows with no prior
    right row keep NULLs.

    Scale path: instead of a range-condition join (which Spark plans as
    a broadcast-nested-loop or an exploding theta join), both sides are
    tagged and unioned, then a single ``last(.., ignorenulls=True)``
    running window over (key, ts) carries the latest right payload
    forward — one shuffle on the key, sort within partitions, no row
    explosion; the standard sort-merge formulation of as-of.

    Payload columns ride inside one struct so a NULL payload *field* on
    a matched right row is preserved (``last(ignorenulls)`` skips NULL
    structs, not NULL fields).
    """
    from pyspark.sql.window import Window

    keys = [on] if isinstance(on, str) else list(on)
    pay_struct = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in payload]
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(left_ts),
        pay_struct.alias("__pay"),
    ).withColumn("__tag", F.lit(0))
    l = left.withColumn("__pay", F.lit(None).cast(r.schema["__pay"].dataType))
    l = l.withColumn("__tag", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    # Right rows sort before left rows at equal ts => inclusive (>=).
    # The trailing __pay sort makes duplicate right-side (key, ts) rows
    # deterministic: the running last() then always carries the
    # greatest payload struct, independent of partition/shuffle order
    # (left rows all have NULL __pay, sorted first within their slot,
    # so their relative order never affects the carried value).
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col(left_ts).asc(),
            F.col("__tag").asc(),
            F.col("__pay").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__last", F.last("__pay", ignorenulls=True).over(w))
    out = carried.filter(F.col("__tag") == 1).withColumn(
        f"{prefix}{right_ts}", F.col("__last.__ts")
    )
    for c in payload:
        out = out.withColumn(f"{prefix}{c}", F.col(f"__last.{c}"))
    return out.drop("__pay", "__tag", "__last")


def pointintime_join(
    facts: DataFrame,
    dim_versions: DataFrame,
    on: str,
    fact_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (feature-store) join: attach the dimension version
    valid at each fact's event time — half-open [valid_from, valid_to)
    membership, NULL valid_to meaning current — so no future version
    ever leaks backward.

    The versioned dimension is broadcast (it is the small side by
    construction: versions, not events). Stateless, so the identical
    transform also enriches a streaming fact DataFrame per micro-batch
    (stream-static join).
    """
    d = dim_versions.withColumnRenamed(on, "__dim_key")
    cond = (
        (facts[on] == d["__dim_key"])
        & (facts[fact_ts] >= d[valid_from])
        & (d[valid_to].isNull() | (facts[fact_ts] < d[valid_to]))
    )
    return facts.join(F.broadcast(d), cond, how).drop("__dim_key")
