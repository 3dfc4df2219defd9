"""Time-series operators past the reference's single tumbling window:
multi-resolution rollups (the "hypertable continuous aggregate" shape),
gap-filling, and dynamic-dimension map processing — the operations a
Timestream-class store serves, expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parse import build_service_log_text, parse_service_logs
from ..functions.time import epoch_millis
from ..sources.batch import load_table, scatter
from .catalog import query


@query(
    "timeseries_multi_rollup",
    oracle="""
    SELECT CASE WHEN grouping(h) = 0 AND grouping(d) = 1 THEN 'hour' ELSE 'day' END
               AS resolution,
           coalesce(h, d) AS bucket_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM (
        SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS h,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d,
               event_type, value
        FROM events
    )
    GROUP BY GROUPING SETS ((h, event_type), (d, event_type))
    """,
    tags=("timeseries", "rollup", "grouping-sets"),
)
def timeseries_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate shape: hourly AND daily
    rollups of the point stream in ONE pass via GROUPING SETS — one scan,
    one shuffle, both resolutions (vs. two jobs reading 100 TB twice)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_mr")
    return spark.sql(
        """
        SELECT CASE WHEN grouping(h) = 0 AND grouping(d) = 1 THEN 'hour' ELSE 'day' END
                   AS resolution,
               coalesce(h, d) AS bucket_start,
               event_type,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM (
            SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
                   event_type, value
            FROM events_mr
        )
        GROUP BY GROUPING SETS ((h, event_type), (d, event_type))
        """
    )


@query(
    "timeseries_gapfill",
    oracle="""
    WITH buckets AS (
        SELECT unnest(generate_series(
            TIMESTAMP '2024-01-01 00:00:00',
            TIMESTAMP '2024-01-01 23:00:00',
            INTERVAL '1 hour')) AS bucket
    ),
    actual AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
               count(*) AS n, sum(value) AS sv
        FROM events
        WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01 00:00:00'
          AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-02 00:00:00'
        GROUP BY 1
    )
    SELECT b.bucket,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_events,
           round(coalesce(a.sv, 0.0), 2) AS sum_value
    FROM buckets b LEFT JOIN actual a ON b.bucket = a.bucket
    """,
    tags=("timeseries", "gapfill"),
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series for one day: a generated time spine LEFT
    JOINed to the actual buckets, empty hours zero-filled. The spine is
    `sequence()` + explode — generated distributed, never a driver loop;
    at scale the spine broadcasts (it's tiny by construction)."""
    e = load_table(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-01 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket")
    )
    actual = (
        e.filter(
            (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
        )
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
    )
    return spine.join(actual, "bucket", "left").select(
        "bucket",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.round(F.coalesce("sv", F.lit(0.0)), 2).alias("sum_value"),
    )


@query(
    "map_dimensions_long_form",
    oracle="""
    SELECT dim_key, dim_value, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT 'operation' AS dim_key, event_type AS dim_value FROM events
        UNION ALL
        SELECT 'awsaccountid', lpad(CAST(user_id AS VARCHAR), 12, '0') FROM events
        UNION ALL
        SELECT 'callerservice', 'GLUE' FROM events
    )
    GROUP BY 1, 2
    """,
    tags=("map", "explode", "parse"),
)
def map_dimensions_long_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-dimension map processing (the TimestreamPoint ``dimensions``
    MapType, TimestreamPoint.java:15): parse points, ``explode`` the map
    to long-form (key, value) rows, count value frequencies — the
    map_keys/element_at/explode family over real parsed data.

    explode_outer + a post-generate null filter, NOT plain explode
    (r12, the VERDICT r11 sweep-drift diagnosis): from a plain
    ``explode(dimensions)`` Catalyst's InferFiltersFromGenerate infers
    ``size(dimensions) > 0`` and filter-pushdown drags it below
    scatter's round-robin exchange — since ``dimensions`` is a DERIVED
    expression, that duplicates the ENTIRE build-text+parse tree into
    a pre-exchange Filter that runs on the unsplit scan side
    (single-threaded) and again post-exchange. Measured at sf0.1:
    5.3 s steady / 12.6 s first-touch with the inferred filter, 0.9 s
    steady / 5.2 s first-touch without; results identical (the null
    row an outer explode would add cannot occur — the parse always
    keeps the literal callerservice key — and the explicit dim_key
    filter pins the semantics anyway)."""
    e = scatter(load_table(spark, sf_dir, "events"))
    raw = e.select(
        build_service_log_text(
            operation=F.col("event_type"),
            aws_account_id=F.lpad(F.col("user_id").cast("string"), 12, "0"),
            latency=F.col("value").cast("string"),
            end_time_millis=epoch_millis(F.col("ts")),
            caller_service=F.lit("GLUE"),
        ).alias("value")
    )
    points = parse_service_logs(raw)
    exploded = points.select(
        F.explode_outer(F.col("dimensions")).alias("dim_key", "dim_value")
    ).filter(F.col("dim_key").isNotNull())
    return exploded.groupBy("dim_key", "dim_value").agg(F.count("*").alias("n"))


def _interpolate_oracle() -> str:
    from ..functions.exact import sql_div_round, sql_floor_round

    interp = f"prev_c + {sql_floor_round('(next_c - prev_c) * (idx - prev_i)', '(next_i - prev_i)')}"
    return f"""
    WITH buckets AS (
        SELECT unnest(generate_series(
            TIMESTAMP '2024-01-01 00:00:00',
            TIMESTAMP '2024-01-01 23:00:00',
            INTERVAL '1 hour')) AS bucket
    ),
    actual AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS b,
               sum(CAST(round(value * 100) AS BIGINT)) AS sc,
               CAST(count(*) AS BIGINT) AS n
        FROM events
        WHERE event_type = 'purchase'
          AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01 00:00:00'
          AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-02 00:00:00'
        GROUP BY 1
    ),
    grid AS (
        SELECT bk.bucket,
               CASE WHEN a.n IS NOT NULL THEN {sql_div_round('a.sc', 'a.n')} END
                   AS avg_cents,
               row_number() OVER (ORDER BY bk.bucket) AS idx
        FROM buckets bk LEFT JOIN actual a ON bk.bucket = a.b
    ),
    win AS (
        SELECT bucket, avg_cents, idx,
               last_value(avg_cents IGNORE NULLS) OVER wp AS prev_c,
               first_value(avg_cents IGNORE NULLS) OVER wf AS next_c,
               last_value(CASE WHEN avg_cents IS NOT NULL THEN idx END IGNORE NULLS)
                   OVER wp AS prev_i,
               first_value(CASE WHEN avg_cents IS NOT NULL THEN idx END IGNORE NULLS)
                   OVER wf AS next_i
        FROM grid
        WINDOW wp AS (ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (ORDER BY idx ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT bucket,
           CAST(CASE WHEN avg_cents IS NOT NULL THEN avg_cents
                     WHEN prev_c IS NOT NULL AND next_c IS NOT NULL THEN {interp}
                     WHEN prev_c IS NOT NULL THEN prev_c
                     WHEN next_c IS NOT NULL THEN next_c
                     ELSE 0 END AS BIGINT) / 100.0 AS value,
           CASE WHEN avg_cents IS NOT NULL THEN 'actual'
                WHEN prev_c IS NOT NULL AND next_c IS NOT NULL THEN 'interp'
                WHEN prev_c IS NOT NULL THEN 'locf'
                WHEN next_c IS NOT NULL THEN 'backfill'
                ELSE 'empty' END AS fill_kind
    FROM win
    """


@query(
    "timeseries_interpolate",
    oracle=_interpolate_oracle(),
    tags=("timeseries", "gapfill", "interpolate"),
)
def timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series with TimescaleDB-style value
    reconstruction: actual buckets keep their exact-integer average;
    interior gaps are LINEARLY INTERPOLATED between the nearest real
    neighbors (integer half-up arithmetic — both engines evaluate the
    identical formula); leading/trailing gaps fall back to
    backfill/LOCF, and each row carries its fill provenance. The
    ordered window runs over the generated SPINE (24 rows here), never
    the point stream — at 100 TB the points collapse into per-bucket
    aggregates first (one shuffle), and the tiny spine window is
    driver-negligible per series; many-series variants partition the
    window by series key."""
    from ..functions.exact import cents, floor_round, spark_div_round
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase")
        & (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
    )
    actual = e.groupBy(F.date_trunc("hour", "ts").alias("b")).agg(
        F.sum(cents(F.col("value"))).alias("sc"), F.count("*").alias("n")
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-01 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket")
    )
    grid = (
        spine.join(actual, spine.bucket == actual.b, "left")
        .selectExpr(
            "bucket",
            f"CASE WHEN n IS NOT NULL THEN {spark_div_round('sc', 'n')} END AS avg_cents",
        )
    )
    w_all = W.orderBy("bucket")
    wp = W.orderBy("idx").rowsBetween(W.unboundedPreceding, W.currentRow)
    wf = W.orderBy("idx").rowsBetween(W.currentRow, W.unboundedFollowing)
    g2 = grid.withColumn("idx", F.row_number().over(w_all))
    marked_idx = F.when(F.col("avg_cents").isNotNull(), F.col("idx"))
    win = g2.select(
        "bucket",
        "avg_cents",
        "idx",
        F.last("avg_cents", ignorenulls=True).over(wp).alias("prev_c"),
        F.first("avg_cents", ignorenulls=True).over(wf).alias("next_c"),
        F.last(marked_idx, ignorenulls=True).over(wp).alias("prev_i"),
        F.first(marked_idx, ignorenulls=True).over(wf).alias("next_i"),
    )
    interp = F.col("prev_c") + floor_round(
        (F.col("next_c") - F.col("prev_c")) * (F.col("idx") - F.col("prev_i")),
        F.col("next_i") - F.col("prev_i"),
    )
    filled = (
        F.when(F.col("avg_cents").isNotNull(), F.col("avg_cents"))
        .when(F.col("prev_c").isNotNull() & F.col("next_c").isNotNull(), interp)
        .when(F.col("prev_c").isNotNull(), F.col("prev_c"))
        .when(F.col("next_c").isNotNull(), F.col("next_c"))
        .otherwise(F.lit(0))
    )
    kind = (
        F.when(F.col("avg_cents").isNotNull(), F.lit("actual"))
        .when(
            F.col("prev_c").isNotNull() & F.col("next_c").isNotNull(), F.lit("interp")
        )
        .when(F.col("prev_c").isNotNull(), F.lit("locf"))
        .when(F.col("next_c").isNotNull(), F.lit("backfill"))
        .otherwise(F.lit("empty"))
    )
    return win.select(
        "bucket",
        (filled.cast("long") / 100.0).alias("value"),
        kind.alias("fill_kind"),
    )


_OHLC_ORACLE = """
WITH pts AS (
    SELECT event_type,
           CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket_start,
           CAST(round(value * 100) AS BIGINT) AS v_cents,
           CAST(ts AS TIMESTAMP) AS tsx, event_id
    FROM events
),
ranked AS (
    SELECT *,
           row_number() OVER (PARTITION BY event_type, bucket_start
                              ORDER BY tsx, event_id) AS rn_open,
           row_number() OVER (PARTITION BY event_type, bucket_start
                              ORDER BY tsx DESC, event_id DESC) AS rn_close
    FROM pts
)
SELECT event_type, bucket_start,
       CAST(max(CASE WHEN rn_open = 1 THEN v_cents END) AS BIGINT) AS open_cents,
       CAST(max(v_cents) AS BIGINT) AS high_cents,
       CAST(min(v_cents) AS BIGINT) AS low_cents,
       CAST(max(CASE WHEN rn_close = 1 THEN v_cents END) AS BIGINT) AS close_cents,
       CAST(count(*) AS BIGINT) AS n_points
FROM ranked
GROUP BY event_type, bucket_start
"""


@query(
    "timeseries_ohlc",
    oracle=_OHLC_ORACLE,
    tags=("timeseries", "downsample", "ohlc"),
)
def timeseries_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (open/high/low/close + point count per
    series × hour) — the canonical lossy time-series compaction every
    metrics store serves for dashboards at coarse zoom. open/close are
    totally ordered via row_number over (ts, event_id) — no
    first/last-in-group nondeterminism, no reliance on unique
    timestamps; values carried as exact integer cents.

    Scale shape: ONE shuffle on (series, bucket) feeds both window
    ranks and the final aggregate (same keys — Catalyst reuses the
    partitioning); per-bucket sort is bounded by bucket width × event
    rate, the same bound the sliced-sessionization operator engineered
    for. At 100 TB this runs per day-partition with the hour buckets
    never crossing partition borders."""
    from pyspark.sql import Window as W

    from ..functions.exact import cents

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket_start"),
        cents(F.col("value")).alias("v_cents"),
        F.col("ts"),
        "event_id",
    )
    part = W.partitionBy("event_type", "bucket_start")
    ranked = ev.withColumn(
        "rn_open", F.row_number().over(part.orderBy("ts", "event_id"))
    ).withColumn(
        "rn_close",
        F.row_number().over(part.orderBy(F.desc("ts"), F.desc("event_id"))),
    )
    return ranked.groupBy("event_type", "bucket_start").agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("v_cents"))).alias("open_cents"),
        F.max("v_cents").alias("high_cents"),
        F.min("v_cents").alias("low_cents"),
        F.max(F.when(F.col("rn_close") == 1, F.col("v_cents"))).alias("close_cents"),
        F.count("*").alias("n_points"),
    )


_RETENTION_ORACLE = """
WITH now_ref AS (SELECT max(CAST(ts AS TIMESTAMP)) AS now FROM events)
SELECT tier,
       CAST(count(*) AS BIGINT) AS n_points,
       min(tsx) AS oldest,
       max(tsx) AS newest
FROM (
    SELECT CAST(ts AS TIMESTAMP) AS tsx,
           CASE WHEN CAST(ts AS TIMESTAMP) > now_ref.now - INTERVAL 24 HOUR
                THEN 'memory'
                WHEN CAST(ts AS TIMESTAMP) > now_ref.now - INTERVAL 7 DAY
                THEN 'magnetic'
                ELSE 'expired' END AS tier
    FROM events, now_ref
)
GROUP BY tier
"""


@query(
    "events_retention_tiers",
    oracle=_RETENTION_ORACLE,
    tags=("timeseries", "retention", "reference-parity"),
)
def events_retention_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Timestream retention policy as a queryable
    classification (TimestreamInitializer.java:12-13, 47-49: memory
    store 24 h, magnetic store 7 days): each point is assigned the
    storage tier that would hold it, with 'expired' for points past
    magnetic retention — the audit a migration or cost model runs
    before adopting the policy. 'now' is pinned to the dataset's max
    event time so the verdict is deterministic and replayable (a live
    deployment passes the wall clock); it stays in-plan as a broadcast
    one-row aggregate, so the query is one scan + one crossJoin, no
    driver round-trip. At 100 TB the same CASE drives
    the partition-pruning layout: day-partitioned writes make tier
    transitions directory moves/drops, never row rewrites."""
    ev = load_table(spark, sf_dir, "events")
    # 'now' stays IN-PLAN (broadcast one-row max aggregate, as the
    # oracle's CTE does) — no driver collect, no second events scan
    now_df = ev.agg(F.max("ts").alias("__now"))
    tier = (
        F.when(F.col("ts") > F.col("__now") - F.expr("INTERVAL 24 HOURS"), "memory")
        .when(F.col("ts") > F.col("__now") - F.expr("INTERVAL 7 DAYS"), "magnetic")
        .otherwise("expired")
    )
    return (
        ev.crossJoin(F.broadcast(now_df))
        .select(F.col("ts").alias("tsx"), tier.alias("tier"))
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_points"),
            F.min("tsx").alias("oldest"),
            F.max("tsx").alias("newest"),
        )
    )


_RATE_ORACLE = """
WITH seq AS (
    SELECT user_id,
           CAST(ts AS TIMESTAMP) AS tsx,
           event_id,
           CAST(round(value * 100) AS BIGINT) AS v_cents,
           lag(CAST(round(value * 100) AS BIGINT)) OVER w AS prev_cents,
           lag(CAST(ts AS TIMESTAMP)) OVER w AS prev_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       event_id,
       CAST(v_cents - prev_cents AS BIGINT) AS delta_cents,
       CAST(epoch_us(tsx) - epoch_us(prev_ts) AS BIGINT) AS dt_micros,
       CAST(floor(((v_cents - prev_cents) * 1000000 * 2
             + (epoch_us(tsx) - epoch_us(prev_ts)))
            / ((epoch_us(tsx) - epoch_us(prev_ts)) * 2.0)) AS BIGINT)
           AS rate_cents_per_sec_e0
FROM seq
WHERE prev_cents IS NOT NULL AND epoch_us(tsx) > epoch_us(prev_ts)
"""


@query(
    "timeseries_rate_of_change",
    oracle=_RATE_ORACLE,
    tags=("timeseries", "derivative", "rate"),
)
def timeseries_rate_of_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete derivative per series (Timestream's ``rate()``/
    ``derivative()`` family): consecutive-sample delta and
    per-second rate for each (user, sample) pair — the counter/gauge
    analysis every time-series store serves. One lag() window over
    (series, ts, id); exact arithmetic throughout: value deltas in
    integer cents, time deltas in integer microseconds, and the rate as
    integer half-up of (delta_cents · 1e6) / dt_micros — i.e. whole
    cents/second — so both engines emit identical integers (a float
    division here would be the classic cross-engine last-bit trap).
    dt > 0 is guaranteed by the total (ts, event_id) order only when ts
    ties are impossible within a user; ties get dt=0 rows only if two
    samples share an exact microsecond — then the rate would divide by
    zero, so such rows are EXCLUDED on both sides by the same
    predicate."""
    from pyspark.sql import Window as W

    from ..functions.exact import cents, floor_round
    from ..functions.time import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        F.col("ts"),
        cents(F.col("value")).alias("v_cents"),
        F.lag(cents(F.col("value"))).over(w).alias("prev_cents"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    delta = F.col("v_cents") - F.col("prev_cents")
    dt = epoch_micros(F.col("ts")) - epoch_micros(F.col("prev_ts"))
    return seq.filter(F.col("prev_cents").isNotNull() & (dt > 0)).select(
        "user_id",
        "event_id",
        delta.alias("delta_cents"),
        dt.alias("dt_micros"),
        floor_round(delta * 1_000_000, dt).cast("long").alias("rate_cents_per_sec_e0"),
    )
