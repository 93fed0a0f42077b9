"""KPI queries over the ``events`` stream table.

Batch expressions of the reference's streaming KPIs (SURVEY.md §2.5,
§2.8): every transform here is a pure DataFrame function, so the same
logic is reused by ``streaming/`` over a readStream input. Windows are
epoch-aligned tumbling/sliding buckets exactly like ``F.window``;
oracles use DuckDB ``time_bucket`` with a 1970-01-01 origin.

Scale notes: all aggregations are partial-aggregatable (map-side
combine before the shuffle); top-N per group is a single window
function over the aggregated (small) intermediate, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.functions.numeric import (
    money_sum,
    safe_ratio,
)
from travelpulse_spark_stream_tourism_analytics_spark.functions.temporal import tumbling
from travelpulse_spark_stream_tourism_analytics_spark.plans.catalog import (
    load_table,
    query,
)

_MINUTE_BUCKET = (
    "time_bucket(INTERVAL '1 minute', ts::TIMESTAMP, TIMESTAMP '1970-01-01')"
)


@query(
    "events_per_minute",
    oracle=f"""
    SELECT {_MINUTE_BUCKET} AS window_start,
           {_MINUTE_BUCKET} + INTERVAL '1 minute' AS window_end,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def events_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-minute event counts (reference A2,
    spark/kafka_to_metrics.py:224-225)."""
    ev = load_table(spark, sf_dir, "events")
    return tumbling(ev, "ts", "1 minute").groupBy("window_start", "window_end").agg(
        F.count("*").alias("n_events")
    )


def top_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: per-day top-5 purchasers by (count, spend).

    The per-group top-N done right: ``row_number() over (partition by
    window ...)`` instead of the reference's global orderBy+limit that
    mixes windows inside one micro-batch (documented quirk, SURVEY.md
    §4.3 item 2; reference spark/kafka_to_metrics.py:293-301).
    rn_global exercises an un-partitioned window (single-reducer — fine
    on the tiny aggregated set, never on raw events).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            # date_trunc returns TIMESTAMP_LTZ; keep outputs NTZ so
            # collected values are tz-naive like the DuckDB oracle.
            F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_purchases"),
            money_sum("value", "spend"),
        )
    )
    in_day = Window.partitionBy("day").orderBy(
        F.desc("n_purchases"), F.desc("spend"), F.asc("user_id")
    )
    global_w = Window.orderBy(
        F.asc("day"), F.desc("n_purchases"), F.desc("spend"), F.asc("user_id")
    )
    return (
        agg.withColumn("rn_global", F.row_number().over(global_w).cast("long"))
        .withColumn("rank_in_day", F.row_number().over(in_day).cast("long"))
        .filter(F.col("rank_in_day") <= 5)
    )


def today_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Today' snapshot (reference W9/P6, spark/kafka_to_metrics.py:265-269)
    with an injectable as-of day (here: max event day) so it is
    deterministic — the reference's ``current_date()`` version is
    documented as untestable without a clock fixture (SURVEY.md §7.3)."""
    ev = load_table(spark, sf_dir, "events")
    today = ev.agg(F.max(F.to_date("ts")).alias("__today"))
    return (
        ev.join(F.broadcast(today), F.to_date("ts") == F.col("__today"), "inner")
        .groupBy(F.to_date("ts").cast("timestamp_ntz").alias("day"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            money_sum("value", "spend"),
        )
    )


def sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min / 5 min) — an engine extension; the
    reference only has tumbling windows (SURVEY.md §2.8 W2)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        tumbling(ev, "ts", "10 minutes", "5 minutes")
        .groupBy("window_start", "window_end", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


# Fixed query shape for the time-series branch; z-normalized
# driver-side and embedded as literals on both sides (a plan constant,
# like the LSH planes).
_TS_PATTERN = [1.0, 3.0, 2.0, 5.0]
_TS_M = len(_TS_PATTERN)


def _ts_q_sql() -> str:
    import math

    mu = sum(_TS_PATTERN) / _TS_M
    sd = math.sqrt(sum((x - mu) ** 2 for x in _TS_PATTERN) / _TS_M)
    return (
        "["
        + ", ".join(repr((x - mu) / sd) for x in _TS_PATTERN)
        + "]::DOUBLE[]"
    )


_TS_Q_SQL = _ts_q_sql()


@query(
    "latest_event_per_user",
    oracle=f"""
    SELECT 'latest' AS branch, user_id, ts::TIMESTAMP AS last_ts,
           event_type AS last_type, event_id AS last_event_id,
           NULL::BIGINT AS "offset", NULL::DOUBLE AS zdist
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ) WHERE rn = 1
    UNION ALL
    -- Time-series pattern search (round 4, operators/timeseries.py):
    -- top-10 sliding windows of each user's time-ordered value series
    -- by z-normalized Euclidean distance to the fixed query shape.
    SELECT 'tsmatch' AS branch, user_id, NULL::TIMESTAMP AS last_ts,
           NULL::VARCHAR AS last_type, NULL::BIGINT AS last_event_id,
           "offset", zdist
    FROM (
        WITH series AS (
            SELECT user_id, list(value ORDER BY ts, value) AS vals
            FROM events GROUP BY user_id
        ),
        wins AS (
            SELECT user_id, i AS "offset",
                   vals[i:i+{_TS_M - 1}] AS w
            FROM series, LATERAL unnest(
                generate_series(1, len(vals) - {_TS_M - 1})) t(i)
            WHERE len(vals) >= {_TS_M}
        ),
        stats AS (
            SELECT user_id, "offset", w,
                   list_avg(w) AS mu,
                   sqrt(list_sum(list_transform(w,
                        x -> (x - list_avg(w)) * (x - list_avg(w))))
                        / {_TS_M}) AS sd
            FROM wins
        )
        SELECT user_id, "offset",
               round(sqrt(list_sum(list_transform(
                   list_zip(list_transform(w, x -> (x - mu) / sd),
                            {_TS_Q_SQL}),
                   p -> (p[1] - p[2]) * (p[1] - p[2])))), 6) AS zdist
        FROM stats WHERE sd > 0
        ORDER BY zdist, user_id, "offset"
        LIMIT 10
    ) ts
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged temporal entry.

    branch='latest' — latest-per-key temporal dedup (reference T3,
    SURVEY.md §2.6).

    branch='tsmatch' — time-series similarity search (round 4,
    operators/timeseries.py pattern_matches): top-10 (user, offset)
    sliding windows most similar to a fixed query pattern under
    z-normalized Euclidean distance. Series assembly is one shuffle on
    user_id; every window scores map-side with pure array exprs; the
    pattern is a z-normalized plan constant like the LSH planes, and
    the top-k is TakeOrderedAndProject. Constant (sd=0) windows have
    no shape and are skipped on both sides."""
    from pyspark.sql.window import Window

    from travelpulse_spark_stream_tourism_analytics_spark.operators.timeseries import (
        pattern_matches,
    )

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.lit("latest").alias("branch"),
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("event_id").alias("last_event_id"),
            F.lit(None).cast("long").alias("offset"),
            F.lit(None).cast("double").alias("zdist"),
        )
    )
    tsmatch = pattern_matches(
        ev, _TS_PATTERN, "user_id", "ts", "value", k=10
    ).select(
        F.lit("tsmatch").alias("branch"),
        "user_id",
        F.lit(None).cast("timestamp_ntz").alias("last_ts"),
        F.lit(None).cast("string").alias("last_type"),
        F.lit(None).cast("long").alias("last_event_id"),
        "offset",
        "zdist",
    )
    return latest.unionByName(tsmatch)


_SESSIONS_SQL = """
    WITH marked AS (
        SELECT user_id, ts::TIMESTAMP AS ts,
               CASE WHEN lag(ts::TIMESTAMP) OVER w IS NULL
                         OR ts::TIMESTAMP - lag(ts::TIMESTAMP) OVER w
                            >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n_events
    FROM sess
    GROUP BY user_id, sid
"""


def user_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user — an engine extension;
    the reference has only tumbling windows (SURVEY.md §2.8 W2). On a
    stream this is ``F.session_window`` with a watermark; the oracle
    mirrors the merge semantics via gaps-and-islands SQL."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(F.count("*").alias("n_events")).select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        "n_events",
    )


def user_day_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-day retention: distinct-activity self-join on (user, day+1)
    — the cohort shape every activity pipeline needs; one dedup shuffle
    plus one equi-join on (user_id, day)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    nxt = daily.select(
        F.col("user_id").alias("u2"), F.date_sub("day", 1).alias("prev_day")
    )
    joined = daily.join(
        nxt,
        (F.col("user_id") == F.col("u2")) & (F.col("day") == F.col("prev_day")),
        "left",
    )
    return joined.groupBy(
        F.col("day").cast("timestamp_ntz").alias("day")
    ).agg(
        F.count("*").alias("n_active"),
        F.sum(F.when(F.col("u2").isNotNull(), 1).otherwise(0)).alias("n_retained"),
        F.round(
            F.sum(F.when(F.col("u2").isNotNull(), 1).otherwise(0))
            / F.count("*").cast("double"),
            6,
        ).alias("retention"),
    )


def clicks_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the same user's most recent
    at-or-before purchase (ts + value) — the temporal-join class the
    reference lacks (SURVEY.md §2.4 "absent: as-of joins"), built with
    the union + running-last formulation in operators/joins.asof_join
    (one shuffle, no range explosion; survives 100 TB where a
    theta-join would not)."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.joins import (
        asof_join,
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        clicks, purchases, on="user_id", payload=["value"]
    ).select("event_id", "user_id", "ts", "asof_ts", "asof_value")


_ROLLUP_LEVEL = """
    SELECT '{grain}' AS grain,
           time_bucket(INTERVAL '1 {grain}', ts::TIMESTAMP,
                       TIMESTAMP '1970-01-01') AS bucket_start,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_error,
           round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE, 6) AS error_share
    FROM events
    GROUP BY 2
"""


@query(
    "event_hypertable_rollup",
    oracle=" UNION ALL ".join(
        _ROLLUP_LEVEL.format(grain=g) for g in ("minute", "hour", "day")
    ),
)
def event_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-grain rollup (minute / hour / day) as ONE
    GROUPING SETS aggregation: a single scan and a single shuffle;
    Catalyst's Expand emits one row per grain ahead of the map-side
    partial aggregate, so the shuffle still carries only aggregated
    buckets. Decimal partial sums keep every level bit-exact and
    order-independent.

    Chosen over the union-of-levels form because DataFrame union
    branches do not share common subtrees (no automatic CTE
    materialization — the raw table would be scanned once per grain),
    and over persist()-chained levels because a catalog query should
    not pin executor storage for the session. A production continuous
    aggregate materializes each level incrementally instead — that
    shape is the streaming chained_window_rollup."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.date_trunc("minute", "ts").alias("m"),
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        "value",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
    )
    g = keyed.groupingSets([["m"], ["h"], ["d"]], "m", "h", "d").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("__dec"),
        F.sum("is_err").alias("n_error"),
        F.grouping("m").cast("int").alias("__gm"),
        F.grouping("h").cast("int").alias("__gh"),
    )
    return g.select(
        F.when(F.col("__gm") == 0, F.lit("minute"))
        .when(F.col("__gh") == 0, F.lit("hour"))
        .otherwise(F.lit("day"))
        .alias("grain"),
        F.coalesce("m", "h", "d").alias("bucket_start"),
        "n_events",
        F.col("__dec").cast("double").alias("total_value"),
        "n_error",
        safe_ratio(F.col("n_error").cast("double"), F.col("n_events")).alias(
            "error_share"
        ),
    )


@query(
    "user_value_scd2_intervals",
    oracle="""
    SELECT user_id,
           ts::TIMESTAMP AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, value)
               AS valid_to,
           value,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, value)
                     IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    WHERE event_type = 'signup'
    """,
)
def user_value_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension) interval build: each signup
    event opens a validity interval closed by the user's next signup
    (`lead` over (user, ts)); the open-ended row is flagged current.
    The change-log -> versioned-dimension primitive every warehouse
    pipeline needs; one shuffle on user_id, window sort reused for
    both lead and the flag. ``value`` in the window ORDER BY (both
    engines) keeps duplicate (user, ts) change rows deterministic."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "value")
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            "value",
        )
        .withColumn(
            "is_current",
            F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("long"),
        )
    )


_FUNNEL_SQL = """
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events
        GROUP BY 1
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_signup,
           CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after_signup,
           CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                         AND t_purchase > t_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM firsts
"""


def signup_click_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup -> first later click -> first later
    purchase) counted per user — the sequence-analysis shape of every
    product/conversion pipeline. One conditional-min aggregation per
    stage (single shuffle on user_id, map-side partials), then a global
    roll-up; no self-joins, so it scales linearly in events."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    sign = F.col("t_signup").isNotNull()
    click = sign & (F.col("t_click") > F.col("t_signup"))
    full = click & (F.col("t_purchase") > F.col("t_click"))
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return firsts.agg(
        F.count("*").alias("n_users"),
        one(sign).alias("n_signup"),
        one(click).alias("n_click_after_signup"),
        one(full).alias("n_full_funnel"),
    )


def events_pointintime_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment (the feature-store join): each purchase
    gets the signup-dimension version that was valid AT ITS EVENT TIME
    — never a future version (no leakage), never a stale one. Built as
    SCD2 intervals (lead window) + an interval-membership join. At
    scale the dimension side is orders of magnitude smaller than the
    fact stream and broadcasts; the same transform applied per
    micro-batch is the stream-static enrich pattern (tested in
    test_streaming.py::test_stream_static_pointintime_enrich).
    Intervals are half-open [valid_from, valid_to) and the version
    chain is deterministic via the (ts, value) tiebreak."""
    from pyspark.sql.window import Window

    from travelpulse_spark_stream_tourism_analytics_spark.operators.joins import (
        pointintime_join,
    )

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "value")
    dim = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.col("value").alias("signup_value"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return pointintime_join(purchases, dim, on="user_id", fact_ts="ts").select(
        "event_id", "user_id", "ts", "valid_from", "signup_value"
    )


# ---------------------------------------------------------------------------
# Merged catalog entries.
#
# The driver scores at most 50 queries; each entry below composes
# several operator plans (the constituent transforms above, unchanged)
# into one hash-checked result so every SURVEY.md §2 operator keeps a
# driver correctness row. Tags in the first column identify which
# branch produced each row.
# ---------------------------------------------------------------------------


@query(
    "user_spend_snapshots",
    oracle="""
    WITH agg AS (
        SELECT date_trunc('day', ts::TIMESTAMP) AS day,
               user_id,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    topd AS (
        SELECT day, user_id, n_events, spend,
               row_number() OVER (
                   ORDER BY day, n_events DESC, spend DESC, user_id
               ) AS rn_global,
               row_number() OVER (
                   PARTITION BY day
                   ORDER BY n_events DESC, spend DESC, user_id
               ) AS rank_in_day
        FROM agg
    )
    SELECT 'daily_top5' AS scope, day, user_id, n_events, spend,
           rn_global, rank_in_day
    FROM topd WHERE rank_in_day <= 5
    UNION ALL
    SELECT 'today' AS scope, CAST(ts::DATE AS TIMESTAMP) AS day, user_id,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS spend,
           NULL::BIGINT AS rn_global, NULL::BIGINT AS rank_in_day
    FROM events
    WHERE ts::DATE = (SELECT max(ts::DATE) FROM events)
    GROUP BY 2, 3
    """,
)
def user_spend_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP (merged): per-day top-5 purchasers (T1 per-window topN,
    reference spark/kafka_to_metrics.py:293-301 quirk fixed) + the
    'today' snapshot with an injectable clock (W9/P6,
    kafka_to_metrics.py:265-269). Constituents: top_users_daily +
    today_user_spend above."""
    top = top_users_daily(spark, sf_dir).select(
        F.lit("daily_top5").alias("scope"),
        "day",
        "user_id",
        F.col("n_purchases").alias("n_events"),
        "spend",
        "rn_global",
        "rank_in_day",
    )
    today = today_user_spend(spark, sf_dir).select(
        F.lit("today").alias("scope"),
        "day",
        "user_id",
        "n_events",
        "spend",
        F.lit(None).cast("long").alias("rn_global"),
        F.lit(None).cast("long").alias("rank_in_day"),
    )
    return top.unionByName(today)


@query(
    "event_window_variants",
    oracle=f"""
    SELECT 'sliding10m5m' AS kind, event_type AS key,
           time_bucket(INTERVAL '5 minutes', ts::TIMESTAMP, TIMESTAMP '1970-01-01')
               - k * INTERVAL '5 minutes' AS window_start,
           time_bucket(INTERVAL '5 minutes', ts::TIMESTAMP, TIMESTAMP '1970-01-01')
               - k * INTERVAL '5 minutes' + INTERVAL '10 minutes' AS window_end,
           count(*) AS n_events
    FROM events, (VALUES (0), (1)) shifts(k)
    GROUP BY 1, 2, 3, 4
    UNION ALL
    SELECT 'session30m' AS kind, CAST(user_id AS VARCHAR) AS key,
           session_start AS window_start, session_end AS window_end, n_events
    FROM ({_SESSIONS_SQL}) s
    """,
)
def event_window_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged window-shape catalog (W2 extensions): sliding 10m/5m
    per-type counts + 30-minute-gap session windows per user
    (``F.session_window``; the oracle mirrors merge semantics with
    gaps-and-islands SQL). Constituents: sliding_event_counts +
    user_session_windows above."""
    sliding = sliding_event_counts(spark, sf_dir).select(
        F.lit("sliding10m5m").alias("kind"),
        F.col("event_type").alias("key"),
        "window_start",
        "window_end",
        "n_events",
    )
    sessions = user_session_windows(spark, sf_dir).select(
        F.lit("session30m").alias("kind"),
        F.col("user_id").cast("string").alias("key"),
        F.col("session_start").alias("window_start"),
        F.col("session_end").alias("window_end"),
        "n_events",
    )
    return sliding.unionByName(sessions)


@query(
    "event_type_profile",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(quantile_cont(value, 0.10), 6) AS p10,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.90), 6) AS p90,
           quantile_disc(value, 0.10) AS p10_approx,
           quantile_disc(value, 0.90) AS p90_approx,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6)
               AS avg_k
    FROM events
    GROUP BY 1
    """,
)
def event_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged per-event-type profile, ONE aggregation pass: exact
    interpolated percentiles, the reference's percentile_approx at
    degenerate accuracy (A8, kafka_to_metrics.py:458-472 — GK sketch ==
    quantile_disc at accuracy=INT_MAX), and JSON payload decode stats
    (S2 from_json, kafka_to_metrics.py:174-179). Subsumes the r1
    queries event_value_percentiles(_approx) + props_json_stats."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(value, 0.10)"), 6).alias("p10"),
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.90)"), 6).alias("p90"),
        F.expr("percentile_approx(value, 0.10, 2147483647)").alias("p10_approx"),
        F.expr("percentile_approx(value, 0.90, 2147483647)").alias("p90_approx"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
    )


@query(
    "event_time_profiles",
    oracle="""
    SELECT 'hour' AS grain,
           date_trunc('hour', ts::TIMESTAMP) AS bucket_ts,
           NULL::BIGINT AS dow_iso, NULL::BIGINT AS hour_of_day,
           count(*) AS n_events,
           min(value) AS min_value,
           max(value) AS max_value,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)
               AS avg_value
    FROM events
    GROUP BY 2
    UNION ALL
    SELECT 'dow_hour' AS grain,
           NULL::TIMESTAMP AS bucket_ts,
           CAST(isodow(ts::TIMESTAMP) AS BIGINT) AS dow_iso,
           CAST(extract(hour FROM ts::TIMESTAMP) AS BIGINT) AS hour_of_day,
           count(*) AS n_events,
           NULL::DOUBLE AS min_value,
           NULL::DOUBLE AS max_value,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           NULL::DOUBLE AS avg_value
    FROM events
    GROUP BY 3, 4
    UNION ALL
    -- PSI drift (round 5, operators/drift.py): bucket edges are the
    -- baseline's exact deciles (quantile_cont == Spark percentile
    -- bit-exactly — both linear-interpolate doubles), bucket id =
    -- number of edges <= value, shares rounded at 1e-6, PSI =
    -- sum (p-q) ln(p/q) over the 10-bucket grid with the standard
    -- 1e-4 empty-bucket floor, rounded at 1e-6 (ln parity at that
    -- scale is the same contract the tfidf oracle already relies on).
    SELECT * FROM (
        WITH pb AS (SELECT value FROM events WHERE user_id % 2 = 0),
        pc AS (SELECT value FROM events WHERE user_id % 2 = 1),
        ed AS (SELECT quantile_cont(value,
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e
               FROM pb),
        bs AS (
            SELECT bucket, round(count(*) / sum(count(*)) OVER (), 6) AS share
            FROM (SELECT len(list_filter(ed.e, x -> pb.value >= x)) AS bucket
                  FROM pb, ed)
            GROUP BY bucket
        ),
        cs AS (
            SELECT bucket, round(count(*) / sum(count(*)) OVER (), 6) AS share
            FROM (SELECT len(list_filter(ed.e, x -> pc.value >= x)) AS bucket
                  FROM pc, ed)
            GROUP BY bucket
        ),
        grid AS (SELECT unnest(generate_series(0, 9)) AS bucket),
        psiv AS (
            SELECT round(sum((p - q) * ln(p / q)), 6) AS v
            FROM (
                SELECT greatest(coalesce(bs.share, 0.0), 0.0001) AS p,
                       greatest(coalesce(cs.share, 0.0), 0.0001) AS q
                FROM grid LEFT JOIN bs USING (bucket)
                          LEFT JOIN cs USING (bucket)
            )
        )
        SELECT 'psi_base' AS grain, NULL::TIMESTAMP AS bucket_ts,
               bucket::BIGINT AS dow_iso, NULL::BIGINT AS hour_of_day,
               NULL::BIGINT AS n_events, NULL::DOUBLE AS min_value,
               NULL::DOUBLE AS max_value, NULL::DOUBLE AS sum_value,
               share AS avg_value
        FROM bs
        UNION ALL
        SELECT 'psi_cand', NULL::TIMESTAMP, bucket::BIGINT, NULL::BIGINT,
               NULL::BIGINT, NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE, share
        FROM cs
        UNION ALL
        SELECT 'psi', NULL::TIMESTAMP, NULL::BIGINT, NULL::BIGINT,
               NULL::BIGINT, NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE, v
        FROM psiv
    )
    """,
)
def event_time_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged time-profile rollups: hourly null-aware value stats
    (A4/A6, reference kafka_to_metrics.py:230,234) + the hour-of-day x
    ISO-weekday heatmap (weekday parity pinned: Spark weekday() is
    0=Monday, DuckDB isodow 1=Monday). Subsumes the r1 queries
    hourly_value_stats + hour_weekday_heatmap, computed as
    ONE GROUPING SETS aggregation — a single scan and a single shuffle
    (Expand emits one row per grain before the map-side partial
    aggregate), where the union-of-branches form scanned events
    twice.

    Round 5 adds the PSI drift-monitor grains (operators/drift.py):
    'psi_base' / 'psi_cand' are the bucket_shares relations of the
    even- vs odd-user event values over the baseline's exact decile
    edges (quantile_edges), and 'psi' is the Population Stability
    Index scalar between them — the ingest-batch drift alarm, fully
    SQL-oracled (edges, shares, and the (p-q)ln(p/q) sum are all
    recomputed independently in DuckDB). One extra aggregation per
    snapshot plus a 9-element plan-constant edge list; no join in the
    bucket stage."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.drift import (
        bucket_shares,
        psi_from_shares,
        quantile_edges,
        shares_dict,
    )

    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("user_id") % 2 == 0)
    cand = ev.filter(F.col("user_id") % 2 == 1)
    # ONE exact-percentile pass: the edges feed both the share
    # relations below and the driver-side PSI scalar (psi_from_shares
    # — calling psi() here would re-run the percentile job, the
    # expensive half of the branch; round-5 review finding).
    edges = quantile_edges(base, "value", 10)

    def _share_rows(df, tag):
        return bucket_shares(df, "value", edges).select(
            F.lit(tag).alias("grain"),
            F.lit(None).cast("timestamp_ntz").alias("bucket_ts"),
            F.col("bucket").cast("long").alias("dow_iso"),
            F.lit(None).cast("long").alias("hour_of_day"),
            F.lit(None).cast("long").alias("n_events"),
            F.lit(None).cast("double").alias("min_value"),
            F.lit(None).cast("double").alias("max_value"),
            F.lit(None).cast("double").alias("sum_value"),
            F.col("share").alias("avg_value"),
        )

    psi_val = round(
        psi_from_shares(
            shares_dict(base, "value", edges),
            shares_dict(cand, "value", edges),
        ),
        6,
    )
    psi_scalar = spark.createDataFrame(
        [(psi_val,)], "v double"
    ).select(
        F.lit("psi").alias("grain"),
        F.lit(None).cast("timestamp_ntz").alias("bucket_ts"),
        F.lit(None).cast("long").alias("dow_iso"),
        F.lit(None).cast("long").alias("hour_of_day"),
        F.lit(None).cast("long").alias("n_events"),
        F.lit(None).cast("double").alias("min_value"),
        F.lit(None).cast("double").alias("max_value"),
        F.lit(None).cast("double").alias("sum_value"),
        F.col("v").alias("avg_value"),
    )
    psi_rows = (
        _share_rows(base, "psi_base")
        .unionByName(_share_rows(cand, "psi_cand"))
        .unionByName(psi_scalar)
    )
    keyed = ev.select(
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket_ts"),
        (F.weekday("ts") + 1).cast("long").alias("dow_iso"),
        F.hour("ts").cast("long").alias("hour_of_day"),
        "value",
    )
    dec_sum = F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    g = keyed.groupingSets(
        [["bucket_ts"], ["dow_iso", "hour_of_day"]],
        "bucket_ts",
        "dow_iso",
        "hour_of_day",
    ).agg(
        F.count("*").alias("n_events"),
        F.min("value").alias("__min"),
        F.max("value").alias("__max"),
        dec_sum.alias("sum_value"),
        (dec_sum / F.count("value")).alias("__avg"),
        F.grouping("bucket_ts").cast("int").alias("__gb"),
    )
    is_hour = F.col("__gb") == 0
    profile = g.select(
        F.when(is_hour, F.lit("hour")).otherwise(F.lit("dow_hour")).alias("grain"),
        "bucket_ts",
        "dow_iso",
        "hour_of_day",
        "n_events",
        F.when(is_hour, F.col("__min")).alias("min_value"),
        F.when(is_hour, F.col("__max")).alias("max_value"),
        "sum_value",
        F.when(is_hour, F.col("__avg")).alias("avg_value"),
    )
    return profile.unionByName(psi_rows)


@query(
    "user_lifecycle_metrics",
    oracle=f"""
    WITH daily AS (
        SELECT DISTINCT user_id, ts::DATE AS day FROM events
    )
    SELECT 'retention_day' AS metric,
           CAST(a.day AS TIMESTAMP) AS day,
           count(*) AS n_a,
           CAST(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_b,
           NULL::BIGINT AS n_c, NULL::BIGINT AS n_d,
           round(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE, 6) AS ratio
    FROM daily a
    LEFT JOIN daily b
      ON a.user_id = b.user_id AND b.day = a.day + INTERVAL 1 DAY
    GROUP BY 2
    UNION ALL
    SELECT 'funnel' AS metric, NULL::TIMESTAMP AS day,
           n_users AS n_a, n_signup AS n_b,
           n_click_after_signup AS n_c, n_full_funnel AS n_d,
           NULL::DOUBLE AS ratio
    FROM ({_FUNNEL_SQL}) f
    """,
)
def user_lifecycle_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged cohort analytics: next-day retention (distinct-activity
    self-join on (user, day+1)) + the ordered signup->click->purchase
    funnel (conditional-min per stage, single shuffle on user_id).
    Constituents: user_day_retention + signup_click_purchase_funnel
    above."""
    ret = user_day_retention(spark, sf_dir).select(
        F.lit("retention_day").alias("metric"),
        "day",
        F.col("n_active").alias("n_a"),
        F.col("n_retained").alias("n_b"),
        F.lit(None).cast("long").alias("n_c"),
        F.lit(None).cast("long").alias("n_d"),
        F.col("retention").alias("ratio"),
    )
    fun = signup_click_purchase_funnel(spark, sf_dir).select(
        F.lit("funnel").alias("metric"),
        F.lit(None).cast("timestamp_ntz").alias("day"),
        F.col("n_users").alias("n_a"),
        F.col("n_signup").alias("n_b"),
        F.col("n_click_after_signup").alias("n_c"),
        F.col("n_full_funnel").alias("n_d"),
        F.lit(None).cast("double").alias("ratio"),
    )
    return ret.unionByName(fun)


@query(
    "temporal_join_enrich",
    oracle="""
    SELECT 'asof_click_purchase' AS kind,
           c.event_id, c.user_id, c.ts::TIMESTAMP AS ts,
           p.ts::TIMESTAMP AS ref_ts, p.value AS ref_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    UNION ALL
    SELECT 'pit_purchase_signup' AS kind,
           p.event_id, p.user_id, p.ts::TIMESTAMP AS ts,
           d.valid_from AS ref_ts, d.signup_value AS ref_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (
        SELECT user_id,
               ts::TIMESTAMP AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, value)
                   AS valid_to,
               value AS signup_value
        FROM events
        WHERE event_type = 'signup'
    ) d
      ON p.user_id = d.user_id
     AND p.ts >= d.valid_from
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    """,
)
def temporal_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged temporal-join catalog: as-of join (union + running-last,
    one shuffle — operators/joins.asof_join) + point-in-time
    feature-store enrich (SCD2 intervals + broadcast interval join —
    operators/joins.pointintime_join). Both are join classes the
    reference lacks (SURVEY.md §2.4). Constituents:
    clicks_asof_last_purchase + events_pointintime_enrich above."""
    asof = clicks_asof_last_purchase(spark, sf_dir).select(
        F.lit("asof_click_purchase").alias("kind"),
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts").alias("ref_ts"),
        F.col("asof_value").alias("ref_value"),
    )
    pit = events_pointintime_enrich(spark, sf_dir).select(
        F.lit("pit_purchase_signup").alias("kind"),
        "event_id",
        "user_id",
        "ts",
        F.col("valid_from").alias("ref_ts"),
        F.col("signup_value").alias("ref_value"),
    )
    return asof.unionByName(pit)
