"""Event-stream analytics (batch restatement of the streaming surface).

The streaming module (mit6_5840_6_824_lab1_mapreduce_spark/streaming)
runs the same logic incrementally with watermarks; these batch
queries are the oracle-checkable semantics. Timestamps are emitted as
formatted strings (cross-engine hash stability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans import table
from ._util import det_round_spark, det_round_sql, exact_ratio_spark, exact_ratio_sql, ts_str
from .registry import query


@query(
    "events_hourly_agg",
    oracle=r"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (1h) — the batch twin of the
    streaming windowed count. Partial aggregation before the shuffle;
    cardinality = hours × event_types, tiny at any scale."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            ts_str(F.date_trunc("hour", F.col("ts")), "hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_value"),
        )
    )


@query(
    "events_sessionization",
    oracle=r"""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM gaps
    GROUP BY user_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via gap detection (30 min), the classic
    lag-window pattern. One shuffle by user_id; at 100 TB this is the
    `session_window` streaming aggregation instead."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                > 30 * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    return gaps.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@query(
    "events_user_running_value",
    oracle=r"""
    SELECT event_id,
           user_id,
           round(CAST(sum(CAST(value AS DECIMAL(18,2)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS running_value
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def events_user_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total window (cumulative per-user spend) — ordered
    frame coverage. Exact decimal running sum for determinism."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double"), 2
        ).alias("running_value"),
    )


@query(
    "events_daily_active_users",
    oracle=r"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS dau,
           count(*) AS n_events
    FROM events
    GROUP BY 1
    """,
)
def events_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU rollup; at scale the distinct-count shuffles once by
    (day, user) then once by day (two-phase distinct agg)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    ).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count("*").alias("n_events"),
    )


@query(
    "events_type_pivot",
    oracle=r"""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS n_click,
           count(*) FILTER (WHERE event_type = 'error')    AS n_error,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           count(*) FILTER (WHERE event_type = 'view')     AS n_view
    FROM events
    GROUP BY user_id
    """,
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts, one column per event type. The
    explicit value list keeps the plan a single-pass aggregation (no
    distinct-values pre-scan) — mandatory at scale; absent cells are
    0, not null, matching the SQL FILTER restatement."""
    ev = table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    p = ev.groupBy("user_id").pivot("event_type", types).count()
    return p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    )


@query(
    "events_props_json",
    oracle=r"""
    WITH ex AS (
      SELECT CASE WHEN json_type(TRY_CAST(props AS JSON), '$.k')
                       IN ('BIGINT', 'UBIGINT')
                  THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT)
             END AS k,
             value
      FROM events
    )
    SELECT k % 10 AS k_bucket,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
    FROM ex
    WHERE k IS NOT NULL
    GROUP BY 1
    """,
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON props column with a
    typed schema (from_json — JVM-side, no Python), bucket by the
    extracted field, aggregate. At scale, promote hot JSON fields to
    columns at ingest; this query is the probe pattern for the long
    tail that stays JSON.

    Typed-field contract (and the oracle's twin of it): the field
    survives ONLY when the JSON value is an integral number fitting
    int64 — strings ("12"), doubles, bools, nulls, missing keys,
    malformed JSON, and out-of-range numbers all become NULL and are
    filtered, exactly as Spark's PERMISSIVE from_json does. The
    oracle needs json_type() + TRY_CAST to say the same thing: a
    plain CAST(json_extract(..)) throws on non-numeric values
    (round-6 unicode sweep, props = '{"k": "héllo"}'). Parity domain:
    SINGLE-document props — Spark's lenient parser extracts from the
    first document of '{"k":5} extra' where DuckDB's strict parser
    rejects the input (pinned divergence; clean concatenated JSON
    upstream)."""
    ev = table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "k", F.from_json("props", "struct<k: bigint>").getField("k")
    ).where(F.col("k").isNotNull())
    return parsed.groupBy((F.col("k") % 10).alias("k_bucket")).agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_value"),
    )


@query(
    "events_funnel",
    oracle=r"""
    WITH s AS (
      SELECT user_id, min(ts) FILTER (WHERE event_type = 'signup') AS s_ts
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.s_ts
        AND e.ts <= s.s_ts + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        AND e.ts <= c.c_ts + INTERVAL 24 HOUR
      GROUP BY e.user_id
    )
    SELECT CASE WHEN p.p_ts IS NOT NULL THEN 3
                WHEN c.c_ts IS NOT NULL THEN 2
                WHEN s.s_ts IS NOT NULL THEN 1
                ELSE 0 END AS funnel_stage,
           count(*) AS n_users
    FROM s LEFT JOIN c ON s.user_id = c.user_id
           LEFT JOIN p ON s.user_id = p.user_id
    GROUP BY 1
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: signup → first click within 24h of signup →
    first purchase within 24h of that click; users counted at their
    deepest stage. Three conditional-min aggregations + two joins,
    all hashed on user_id — the per-stage ordering constraint never
    needs a sort or a self-theta-join, and each stage's events are
    filtered before the join ships them."""
    ev = table(spark, sf_dir, "events")
    day = F.expr("INTERVAL 24 HOURS")
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s_ts")
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(s, "user_id")
        .where((F.col("ts") > F.col("s_ts")) & (F.col("ts") <= F.col("s_ts") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where((F.col("ts") > F.col("c_ts")) & (F.col("ts") <= F.col("c_ts") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    staged = (
        s.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            F.when(F.col("p_ts").isNotNull(), 3)
            .when(F.col("c_ts").isNotNull(), 2)
            .when(F.col("s_ts").isNotNull(), 1)
            .otherwise(0)
            .alias("funnel_stage")
        )
    )
    return staged.groupBy("funnel_stage").agg(F.count("*").alias("n_users"))


@query(
    "events_weekly_retention",
    oracle=r"""
    WITH firstseen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events
    )
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS BIGINT)
             AS week_offset,
           count(*) AS n_users
    FROM firstseen f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week,
    counted in every later week they were active. First-seen is an
    aggregate (no sort/window); the activity dedup keys on
    (user, week) so its partial aggregation collapses duplicates
    map-side before the shuffle. Both engines truncate weeks to
    Monday, so offsets are exact multiples of 7 days."""
    ev = table(spark, sf_dir, "events")
    firstseen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        firstseen.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "events_counts_unpivot",
    oracle=r"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    t AS (SELECT unnest(['click','error','purchase','signup','view'])
            AS event_type),
    c AS (SELECT user_id, event_type, count(*) AS n
          FROM events GROUP BY 1, 2)
    SELECT u.user_id, 'n_' || t.event_type AS metric,
           COALESCE(c.n, 0) AS n
    FROM u CROSS JOIN t
    LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type
    """,
)
def events_counts_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → unpivot roundtrip: the wide per-user count matrix
    melted back to long form (user, metric, n), zero cells included.
    Exercises Spark's unpivot operator (Expand node — no shuffle on
    top of the pivot aggregation); the oracle builds the dense long
    form directly from a user × type spine."""
    ev = table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    wide = ev.groupBy("user_id").pivot("event_type", types).count()
    wide = wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    )
    return wide.unpivot(
        ids=["user_id"],
        values=[f"n_{t}" for t in types],
        variableColumnName="metric",
        valueColumnName="n",
    )


@query(
    "events_weekly_purchase_gapfill",
    oracle=r"""
    WITH wk AS (
      SELECT user_id, date_trunc('week', ts) AS week,
             sum(CAST(value AS DECIMAL(18,2))) AS v
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, min(week) AS w0, max(week) AS w1 FROM wk GROUP BY 1
    ),
    spine AS (
      SELECT user_id,
             unnest(generate_series(w0, w1, INTERVAL 7 DAY)) AS week
      FROM span
    )
    SELECT s.user_id, strftime(s.week, '%Y-%m-%d') AS week,
           round(CAST(COALESCE(wk.v, 0) AS DOUBLE), 2) AS sum_value
    FROM spine s LEFT JOIN wk ON wk.user_id = s.user_id
                             AND wk.week = s.week
    """,
)
def events_weekly_purchase_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: weekly purchase totals per user with
    explicit zero rows for silent weeks between the user's first and
    last active week. The calendar spine comes from sequence() +
    explode — generated from the per-user span aggregate (tiny), never
    from a driver loop; the join back to the weekly sums is
    co-partitioned on user_id."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    wk = ev.groupBy(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    span = wk.groupBy("user_id").agg(
        F.min("week").alias("w0"), F.max("week").alias("w1")
    )
    spine = span.select(
        "user_id",
        F.explode(
            F.sequence("w0", "w1", F.expr("INTERVAL 7 DAYS"))
        ).alias("week"),
    )
    return (
        spine.join(wk, ["user_id", "week"], "left")
        .select(
            "user_id",
            F.date_format("week", "yyyy-MM-dd").alias("week"),
            F.round(
                F.coalesce(F.col("v"), F.lit(0).cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("sum_value"),
        )
    )


@query(
    "events_outlier_stats",
    oracle=r"""
    WITH st AS (
      SELECT event_type,
             count(*) AS n,
             sum(CAST(value AS DECIMAL(18,2))) AS s,
             sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS sq
      FROM events GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n,
             CAST(s AS DOUBLE) / n AS mean,
             sqrt(greatest((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                           / (n - 1), 0)) AS sd
      FROM st WHERE n >= 2
    )
    SELECT e.event_type, any_value(m.n) AS n,
           {MEAN} AS mean,
           {STDDEV} AS stddev,
           CAST(sum(CASE WHEN abs(e.value - m.mean) > 3 * m.sd THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM events e JOIN m USING (event_type)
    GROUP BY e.event_type
    """.replace(
        "{MEAN}", det_round_sql("any_value(m.mean)")
    ).replace("{STDDEV}", det_round_sql("any_value(m.sd)")),
)
def events_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type 3σ outlier screen — the metric-anomaly first
    pass. Mean and stddev derive from EXACT decimal sum / sum-of-
    squares (one aggregate; order-independent, so the result is
    stable under any partitioning), then the tiny per-type stats
    table broadcasts back for the outlier count — two shuffles of
    one row per event type each, one corpus pass per side.

    (A naive avg()/stddev() over doubles would hash-mismatch across
    engines: float summation order differs; the decimal-sums-first
    form is the determinism contract from queries/_util.py.)"""
    ev = table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    st = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("sq"),
    ).where(F.col("n") >= 2)
    m = st.select(
        "event_type",
        "n",
        (F.col("s").cast("double") / F.col("n")).alias("mean"),
        # greatest(..., 0): float cancellation on a (near-)constant group
        # can push the radicand to ~-1e-6; DuckDB's sqrt raises on
        # negatives (Spark would emit NaN) — clamp on BOTH sides.
        F.sqrt(
            F.greatest(
                (
                    F.col("sq").cast("double")
                    - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
                )
                / (F.col("n") - 1),
                F.lit(0.0),
            )
        ).alias("sd"),
    )
    j = ev.join(F.broadcast(m), "event_type")
    return j.groupBy("event_type").agg(
        F.any_value("n").alias("n"),
        # det_round for BOTH (r5 review): value sums can be negative
        # (the exact_ratio idiom's div-vs-// semantics split on
        # negative numerators), and sd is an irrational sqrt — the
        # decimal-exact-sum -> double -> divide pipeline is already
        # engine-identical, det_round finishes it tie-proof.
        det_round_spark("any_value(mean)").alias("mean"),
        det_round_spark("any_value(sd)").alias("stddev"),
        F.sum(
            (F.abs(F.col("value") - F.col("mean")) > 3 * F.col("sd")).cast("int")
        ).cast("long").alias("n_outliers"),
    )


@query(
    "events_salted_type_stats",
    oracle=r"""
    SELECT event_type,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events GROUP BY event_type
    """,
)
def events_salted_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation over the hottest key in the
    testdata (5 event types × the whole table — every group is a hot
    key): phase 1 aggregates by (type, salt) spreading each type over
    16 reducers, phase 2 recombines partials by type. The oracle is
    the PLAIN group-by — the driver's hash compare is exactly the
    proof that salting is semantics-preserving (salt never leaks into
    results, exact decimal partials recombine losslessly).

    This is the skew escape hatch for aggregates whose partial state
    AQE can't shrink map-side; here it doubles as its own
    correctness demonstration."""
    from ..operators.skew import salted_aggregate

    ev = table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        aggs=[
            (F.count("*"), F.sum("n"), "n"),
            (F.sum(v), F.sum("tv"), "tv"),
        ],
        n_salts=16,
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("tv").cast("double"), 2).alias("total_value"),
    )


@query(
    "events_session_sequences",
    oracle=r"""
    WITH gaps AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
    ),
    sess AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                                       ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts,
           array_to_string(list_slice(
             list(coalesce(event_type, '<null>')
                  ORDER BY ts NULLS FIRST, event_id NULLS FIRST),
             1, 20), '>') AS path,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def events_session_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered per-session action sequences — the behavioral training
    examples a recommender or user-model pipeline feeds on (event path
    capped at 20 steps, session bounds, session value). Builds on the
    same 30-min-gap sessionization as `events_sessionization`, then
    one groupBy(user, session): the sequence is assembled by
    sort_array over (ts, event_id, type) structs — deterministic
    total order, no ordering assumption on collect_list itself.
    Two window passes + one aggregate, all partitioned by user_id —
    one shuffle at 100 TB (sessions never span users)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                > 30 * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # r08 nulls contract: the ORACLE's sort keys are explicit NULLS
    # FIRST (matching Spark's natural window order and sort_array's
    # NULL-field ordering — NULL smallest), and the path element is
    # coalesced to a sentinel on BOTH engines: array_join silently
    # drops NULL elements while DuckDB's list aggregate keeps them,
    # so a NULL event_type would otherwise vanish from the Spark
    # path but not the oracle's.
    path = F.array_join(
        F.transform(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                1,
                20,
            ),
            lambda x: F.coalesce(x["event_type"], F.lit("<null>")),
        ),
        ">",
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        ts_str(F.min("ts"), "start_ts"),
        ts_str(F.max("ts"), "end_ts"),
        path.alias("path"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
            "sum_value"
        ),
    )


@query(
    "events_action_markov",
    oracle=r"""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_action, next_type AS to_action,
             count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT from_action, CAST(sum(n) AS BIGINT) AS from_n
      FROM trans GROUP BY from_action
    )
    SELECT t.from_action, t.to_action, t.n AS n_transitions,
           o.from_n,
           {P_TRANSITION} AS p_transition
    FROM trans t JOIN tot o ON t.from_action = o.from_action
    """.replace("{P_TRANSITION}", exact_ratio_sql("t.n", "o.from_n")),
)
def events_action_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user action streams:
    P(next action | action), from lead() pairs within each user's
    (ts, event_id)-ordered event sequence — the behavioral model
    behind next-action prediction and funnel anomaly detection. One
    user_id shuffle for the window; the transition aggregate and the
    per-source totals collapse to an action-pair table (|A|² rows —
    constant-size for any corpus)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_action"),
        F.col("next_type").alias("to_action"),
    ).agg(F.count("*").alias("n_transitions"))
    tot = trans.groupBy("from_action").agg(
        F.sum("n_transitions").alias("from_n")
    )
    return trans.join(F.broadcast(tot), "from_action").select(
        "from_action",
        "to_action",
        "n_transitions",
        "from_n",
        # Integer-exact half-up (round-5 tie-class sweep): round(n/d, 6)
        # on a double diverges cross-engine when n/d's decimal expansion
        # ends in 5 at position 7 (e.g. denominators 640·5^t).
        exact_ratio_spark("n_transitions", "from_n").alias("p_transition"),
    )


@query(
    "events_mad_outliers",
    oracle=r"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.event_id, e.value,
             abs(e.value - m.med) AS adev, m.med
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           count(*) AS n_events,
           round(max(d.med), 4) AS median_value,
           round(max(m.mad), 4) AS mad,
           CAST(sum(CASE WHEN d.adev > 3.0 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen: per event type, count events whose
    absolute deviation from the median exceeds 3x the median absolute
    deviation — the screen that survives the heavy tails that break
    the 3-sigma rule (`events_outlier_stats` is the moment-based
    sibling). Exact linear-interpolation medians on both engines;
    the deviation comparison is per-row arithmetic on top of two
    broadcast-joined per-type aggregates (|event types| rows)."""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.max("med"), 4).alias("median_value"),
            F.round(F.max("mad"), 4).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3.0 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


@query(
    "events_funnel_conversion",
    oracle=r"""
    WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'signup' GROUP BY 1),
    s2 AS (SELECT e.user_id, min(e.ts) AS t
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
    s3 AS (SELECT e.user_id, min(e.ts) AS t
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
    s4 AS (SELECT e.user_id, min(e.ts) AS t
           FROM events e JOIN s3 ON e.user_id = s3.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1),
    counts AS (
      SELECT CAST(1 AS BIGINT) AS step_rank, 'signup' AS step,
             CAST(count(*) AS BIGINT) AS n_users FROM s1
      UNION ALL SELECT 2, 'view', count(*) FROM s2
      UNION ALL SELECT 3, 'click', count(*) FROM s3
      UNION ALL SELECT 4, 'purchase', count(*) FROM s4
    )
    SELECT step_rank, step, n_users,
           {CONVERSION} AS conversion
    FROM (SELECT step_rank, step, n_users,
                 nullif(first_value(n_users) OVER (ORDER BY step_rank), 0)
                   AS first_n
          FROM counts)
    """.replace("{CONVERSION}", exact_ratio_sql("n_users", "first_n")),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch funnel: signup -> view -> click -> purchase, each
    step's earliest event strictly after the user's earliest event of
    the previous step. The product-analytics workload every event
    warehouse runs; restated as a chain of per-step (filter ->
    co-partitioned user_id join -> min) phases.

    Plan shape at scale: every phase keys on user_id, so the chain is
    ONE shuffle key end-to-end (each step's survivor table is a
    strict subset — the join probe side shrinks monotonically);
    per-step counts are 1-row aggregates and the conversion window
    runs over 4 rows. The event_type filters reach the scan
    (PushedFilters), so each phase reads only its step's rows."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    steps = ["signup", "view", "click", "purchase"]
    prev: DataFrame | None = None
    counts: DataFrame | None = None
    for rank, step in enumerate(steps, start=1):
        cur = ev.where(F.col("event_type") == step)
        if prev is not None:
            cur = cur.join(
                prev.select("user_id", F.col("t").alias("prev_t")), "user_id"
            ).where(F.col("ts") > F.col("prev_t"))
        cur = cur.groupBy("user_id").agg(F.min("ts").alias("t"))
        row = cur.agg(F.count("*").alias("n_users")).select(
            F.lit(rank).cast("long").alias("step_rank"),
            F.lit(step).alias("step"),
            "n_users",
        )
        counts = row if counts is None else counts.unionByName(row)
        prev = cur
    w = Window.orderBy("step_rank")
    return (
        counts.withColumn(
            "first_n", F.nullif(F.first("n_users").over(w), F.lit(0))
        )
        # Integer-exact half-up conversion rate (round-5 tie-class sweep).
        .withColumn("conversion", exact_ratio_spark("n_users", "first_n"))
        .drop("first_n")
    )
