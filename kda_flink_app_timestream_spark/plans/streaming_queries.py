"""Streaming queries, driver-checkable: each runs a REAL Structured
Streaming query (readStream → watermark → windowed agg → memory sink,
``availableNow`` trigger) and returns the drained result as a batch
DataFrame. With a watermark wider than the data's disorder nothing is
dropped, so the oracle is the equivalent batch SQL — this pins the
window semantics (tumbling/sliding/session) themselves.

Tumbling is op #4 of the reference (StreamingJob.java:147-166);
sliding is imported-but-unused there (StreamingJob.java:39); session
windows are the Spark-native extension (SURVEY §2.2).
"""

from __future__ import annotations

import hashlib
import itertools
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from ..streaming.windows import session_windowed, sliding_windowed, tumbling_windowed
from .catalog import query

_mem_counter = itertools.count()

# Every staged stream is split into this many files and read with
# maxFilesPerTrigger=1, so each streaming query genuinely crosses
# micro-batch boundaries (state carry, watermark advancement) instead
# of degenerating to one batch (VERDICT r3 #6: "incremental" claims
# were proven by construction, not by a multi-batch run).
STREAM_SPLIT_FILES = 4


def _publish_stage_dir(build: str, stage: str, marker: str) -> None:
    """Atomically publish a fully-built stage directory: POSIX
    ``rename(2)`` either installs ``build`` as ``stage`` whole or fails
    because a directory already sits there. The existing directory is
    accepted as the winner ONLY if it carries the completeness
    ``marker`` — a partial stage left behind by a crashed pre-atomic
    run must not be adopted (it would silently feed every later
    streaming query a truncated file set); it is renamed ASIDE and the
    rename retried. The rename-aside (not a direct rmtree) closes the
    last race (BACKLOG r6 #1): between the marker check and a direct
    delete, a concurrent publisher could install a COMPLETE stage at
    the same path — grabbing the directory via rename first makes the
    re-check race-free (this process owns the tomb exclusively), and a
    complete stage caught that way is put straight back. No reader can
    ever observe a partial published stage."""
    for attempt in range(2):
        try:
            os.rename(build, stage)
            return
        except OSError:
            if not os.path.isdir(stage):
                raise
            if os.path.exists(os.path.join(stage, marker)):
                shutil.rmtree(build, ignore_errors=True)  # complete winner
                return
            if attempt == 0:
                tomb = f"{stage}.stale-{os.getpid()}-{uuid.uuid4().hex[:8]}"
                try:
                    os.rename(stage, tomb)
                except OSError:
                    continue  # someone else moved it; retry the publish
                if os.path.exists(os.path.join(tomb, marker)):
                    # raced a successful publisher: what we grabbed is
                    # complete — reinstall it (or, if a newer complete
                    # stage already took the path, discard our copy)
                    try:
                        os.rename(tomb, stage)
                    except OSError:
                        shutil.rmtree(tomb, ignore_errors=True)
                    shutil.rmtree(build, ignore_errors=True)
                    return
                shutil.rmtree(tomb, ignore_errors=True)  # true stale partial
    raise RuntimeError(
        f"could not publish stage {stage}: a marker-less directory keeps "
        "reappearing (another process repeatedly crashing mid-publish?)"
    )


def _staged_stream_dir(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Stage ``{sf_dir}/{name}.parquet`` as a directory of
    ``STREAM_SPLIT_FILES`` parquet part-files for the file streaming
    source (which requires a directory; testdata is read-only).

    The table is staged through ``load_table``, so the physical ts
    layout is normalized BEFORE the split — the streaming schema then
    comes from the staged files themselves and can never drift from the
    testdata's layout-of-the-round (the r2 failure: a hardcoded
    LongType schema silently collapsed event time 1000×).

    The stage key is the md5 of (path, mtime, size): content-tracking,
    so a regenerated testdata file at the same path re-stages (a
    ``hash(src)`` key reused a pre-regeneration copy whenever
    PYTHONHASHSEED was pinned — exactly the stale-layout class this
    staging exists to prevent), while unchanged files reuse one staged
    copy across processes instead of rewriting per run.

    Concurrency-safe (ADVICE r4): the split is written into a
    process-unique build dir and atomically ``os.rename``-d into place,
    so two processes racing on a cold stage can never interleave
    half-written file sets — a reader sees either nothing (and builds
    its own) or a complete, sealed directory. The loser of the rename
    race discards its build and uses the winner's."""
    src = os.path.realpath(f"{sf_dir}/{name}.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{src}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:16]
    stage = os.path.join(
        tempfile.gettempdir(),
        f"{name}_stream_{STREAM_SPLIT_FILES}_{key}",
    )
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        build = f"{stage}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        load_table(spark, sf_dir, name).repartition(STREAM_SPLIT_FILES).write.mode(
            "overwrite"
        ).parquet(build)
        _publish_stage_dir(build, stage, "_SUCCESS")
    return stage


def _table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """File-source stream over a staged multi-file table split — one
    file per micro-batch (``maxFilesPerTrigger=1``); for ``events`` the
    time column is already normalized to TimestampType at staging."""
    stage = _staged_stream_dir(spark, sf_dir, name)
    file_schema = spark.read.parquet(stage).schema
    return (
        spark.readStream.format("parquet")
        .schema(file_schema)
        .option("maxFilesPerTrigger", 1)
        .load(stage)
    )


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _table_stream(spark, sf_dir, "events")


# State-store partition count for the staged streaming queries. A
# stateful operator creates one store per shuffle partition per side,
# maintained EVERY micro-batch — with the session's batch-oriented 32
# partitions over KB-sized state, per-partition maintenance dominates
# runtime ~3× (measured: the left-outer interval join runs 16-25 s at
# 32 state partitions, 6 s at 8, identical results). Production rule,
# recorded in SCALE.md: size state partitions to projected STATE
# volume, not input parallelism — and size them up front, because the
# count is frozen into the checkpoint at first run.
STREAM_STATE_PARTITIONS = 8


def _run_to_memory(
    df: DataFrame, spark: SparkSession, mode: str = "complete"
) -> DataFrame:
    """Execute the streaming plan to completion (availableNow) into a
    memory sink; return the sink contents as a batch DataFrame.

    ``complete`` output mode: with a deliberately-wide watermark (no
    drops) windows never finalize, so append mode would emit nothing —
    complete mode emits the full aggregation state at the last trigger.
    Queries whose semantics rely on watermark progression pass
    ``append``/``update`` instead.

    The shuffle-partition conf is scoped to ``STREAM_STATE_PARTITIONS``
    for the query's lifetime (read once at ``start()``); the session's
    batch setting is restored afterwards.

    The memory-sink table retains the FULL result in driver memory for
    the session's lifetime unless dropped (BACKLOG r6 #2 — one copy per
    query per bench pass); it is registered for release through the
    same deferred hook plan-level caches use, so the drop happens only
    after the consumer has collected the returned frame."""
    from ..session import defer_release

    name = f"stream_result_{next(_mem_counter)}"
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(STREAM_STATE_PARTITIONS))
    try:
        q = (
            df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, prev)
    result = spark.table(name)
    defer_release(lambda: spark.catalog.dropTempView(name))
    return result


@query(
    "stream_tumbling_events",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window", "tumbling"),
)
def stream_tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Actual Structured Streaming tumbling window (10 min × event_type),
    file source, watermark 35 days (wider than the data span → no drops
    → batch-equivalent, so the oracle checks window assignment exactly)."""
    out = tumbling_windowed(
        _events_stream(spark, sf_dir),
        "ts",
        duration="10 minutes",
        keys=("event_type",),
        aggs=(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ),
        watermark="35 days",
    )
    result = _run_to_memory(out, spark)
    return result.select(
        F.col("window.start").alias("window_start"), "event_type", "n", "sum_value"
    )


@query(
    "stream_sliding_events",
    oracle="""
    WITH slid AS (
        SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
                 - i * INTERVAL '15 minutes' AS window_start,
               event_type, value, CAST(ts AS TIMESTAMP) AS tsx
        FROM events, (VALUES (0), (1)) AS offsets(i)
    )
    SELECT window_start, event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM slid
    WHERE tsx >= window_start AND tsx < window_start + INTERVAL '30 minutes'
    GROUP BY 1, 2
    """,
    tags=("streaming", "window", "sliding"),
)
def stream_sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window 30 min / slide 15 min — each event lands in 2
    windows (the operator Flink's SlidingEventTimeWindows would provide;
    imported but unused in the reference, StreamingJob.java:39)."""
    out = sliding_windowed(
        _events_stream(spark, sf_dir),
        "ts",
        duration="30 minutes",
        slide="15 minutes",
        keys=("event_type",),
        aggs=(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ),
        watermark="35 days",
    )
    result = _run_to_memory(out, spark)
    return result.select(
        F.col("window.start").alias("window_start"), "event_type", "n", "sum_value"
    )


@query(
    "stream_session_windows",
    oracle="""
    WITH ordered AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL THEN 1
                    WHEN CAST(ts AS TIMESTAMP) >= lag(CAST(ts AS TIMESTAMP)) OVER w
                         + INTERVAL '30 minutes' THEN 1
                    ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    islands AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM islands
    GROUP BY user_id, session_id
    """,
    tags=("streaming", "window", "session"),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30 min gap) per user via ``session_window`` in a
    real streaming query. Oracle: gaps-and-islands SQL — a new session
    starts when the gap to the previous event is ≥ the 30 min timeout
    (Spark merges windows that strictly overlap)."""
    out = session_windowed(
        _events_stream(spark, sf_dir),
        "ts",
        gap="30 minutes",
        keys=("user_id",),
        aggs=(F.count("*").alias("n_events"),),
        watermark="35 days",
    )
    result = _run_to_memory(out, spark)
    return result.select(
        "user_id",
        F.col("window.start").alias("session_start"),
        F.col("window.end").alias("session_end"),
        "n_events",
    )


@query(
    "stream_session_dynamic_gap",
    oracle="""
    WITH t AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN event_type = 'click' THEN INTERVAL '10 minutes'
                    WHEN event_type = 'view'  THEN INTERVAL '20 minutes'
                    ELSE INTERVAL '45 minutes' END AS gap
        FROM events
    ),
    o AS (
        SELECT user_id, ts, ts + gap AS w_end,
               max(ts + gap) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_end
        FROM t
    ),
    islands AS (
        SELECT user_id, ts, w_end,
               sum(CASE WHEN prev_end IS NULL OR ts >= prev_end
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS session_id
        FROM o
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(w_end) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM islands
    GROUP BY user_id, session_id
    """,
    tags=("streaming", "window", "session", "dynamic-gap"),
)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT gap: the session timeout depends
    on the event that extends it (clicks keep a session alive 10 min,
    views 20, everything else 45) — the activity-weighted
    sessionization a product-analytics pipeline actually wants, and a
    shape Flink expresses with a custom ``SessionWindowTimeGapExtractor``.
    Spark-first: ``session_window`` accepts a gap EXPRESSION, so the
    whole thing stays a native stateful streaming aggregation — no
    custom state. Oracle: gaps-and-islands where a session breaks when
    the event's start reaches the running max of (ts + gap(event)) over
    all earlier events — exactly Spark's merge-on-strict-overlap rule
    (touching windows do NOT merge, same tie direction the static-gap
    oracle pins); merged intervals are order-independent under ts
    ties, so the result is deterministic."""
    gap = (
        F.when(F.col("event_type") == "click", F.lit("10 minutes"))
        .when(F.col("event_type") == "view", F.lit("20 minutes"))
        .otherwise(F.lit("45 minutes"))
    )
    out = session_windowed(
        _events_stream(spark, sf_dir),
        "ts",
        gap=gap,
        keys=("user_id",),
        aggs=(F.count("*").alias("n_events"),),
        watermark="35 days",
    )
    result = _run_to_memory(out, spark)
    return result.select(
        "user_id",
        F.col("window.start").alias("session_start"),
        F.col("window.end").alias("session_end"),
        "n_events",
    )


@query(
    "stream_interval_join",
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'click')
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM p JOIN c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL '10 minutes'
     AND c.ts <= p.ts
    """,
    tags=("streaming", "join", "interval"),
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream time-interval join (clicks within the 10 minutes
    before a purchase, same user) — two watermarked streams, range
    condition bounding the join state. The Spark rendition of Flink's
    interval join; watermarks wider than the data span → no pruning →
    batch-equivalent oracle."""
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "35 days")
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "35 days")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select("purchase_id", "click_id", F.col("p_user").alias("user_id"))
    return _run_to_memory(joined, spark, mode="append")


def _documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _table_stream(spark, sf_dir, "documents")


def _minhash_band_dedup_oracle() -> str:
    from .dedup import minhash_sig_ctes

    return f"""
    WITH {minhash_sig_ctes()}
    SELECT DISTINCT CAST(band_idx AS INT) AS band, band_key FROM bands
    """


@query(
    "stream_dedup_minhash_bands",
    oracle=_minhash_band_dedup_oracle(),
    tags=("streaming", "dedup", "minhash", "llm"),
)
def stream_dedup_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup INDEX build: MinHash signatures computed
    per-row on a document stream (pure expressions — streaming-safe),
    exploded to LSH (band, band_key) buckets, deduplicated across
    micro-batches with keyed state. The emitted set is every distinct
    band bucket the corpus occupies — the incremental index a streaming
    curation pipeline probes to flag an arriving document as a near-dup
    candidate the moment ANY of its bands hits a claimed bucket (the
    streaming twin of ``dedup_minhash_pairs``' candidate stage).

    Emitting the distinct BUCKET SET (not first-claimant doc ids) keeps
    the output independent of arrival order, so the batch oracle is
    exact: same signatures, same bands, DISTINCT."""
    from ..functions.text import tokens
    from ..operators.dedup import band_structs, minhash_signature

    docs = _documents_stream(spark, sf_dir).filter(
        F.size(tokens(F.col("text"))) >= 3
    )
    sig = minhash_signature(docs)
    # the band layout is the SAME shared expression the batch candidate
    # generator uses (operators/dedup.py:band_structs — BACKLOG r6 #5),
    # so the streaming index can never drift from the batch banding or
    # the generated DuckDB twin
    banded = sig.select(
        F.explode(band_structs(F.col("sig"), band_field="band")).alias("bb")
    ).select(F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key"))
    dedup = banded.dropDuplicates(["band", "band_key"])
    return _run_to_memory(dedup, spark, mode="append")


@query(
    "stream_dedup_keys",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates on (user_id, event_type): exactly-once
    key emission across micro-batches via keyed state — the streaming
    twin of exact dedup. The emitted key set equals batch DISTINCT
    regardless of batch boundaries."""
    dedup = _events_stream(spark, sf_dir).select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return _run_to_memory(dedup, spark, mode="append")


# ONE oracle for both running-counts twins — the "same oracle, same
# hash" twin contract as a shared constant, so a future edit cannot
# drift one side silently
_RUNNING_COUNTS_ORACLE = """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY user_id
    """


@query(
    "stream_stateful_running_counts",
    oracle=_RUNNING_COUNTS_ORACLE,
    tags=("streaming", "stateful", "test-config"),
)
def stream_stateful_running_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom keyed state via applyInPandasWithState: per-user running
    (count, sum) — the general ProcessFunction-style capability (the
    reference's closest analog is its checkpointed sink buffer,
    TimestreamSink.java:150-172). Tagged ``test-config`` (VERDICT r7
    #1): this shape is fully expressible as a native streaming
    aggregation — ``stream_running_counts_native`` below is the
    production twin (JVM state store, measured ~30× cheaper at 100×,
    SCALE.md) — so this variant exists to prove the arbitrary-state
    extension point, and its Arrow-per-batch cost must never be read
    as the running-aggregate operator's. A key may emit once per
    micro-batch;
    the projection below keeps each key's LATEST state (n_events is
    monotone, so max-struct selects it), and because the state sums
    exact integer cents the final rows are independent of batch
    boundaries — equal to the batch GROUP BY the oracle runs."""
    from ..streaming.stateful import running_counts

    out = running_counts(_events_stream(spark, sf_dir))
    # latest state per key (a key may emit once per batch)
    result = _run_to_memory(out, spark, mode="update")
    w_latest = F.max(F.struct("n_events", "total_value")).alias("s")
    return (
        result.groupBy("user_id")
        .agg(w_latest)
        .select("user_id", F.col("s.n_events").alias("n_events"), F.col("s.total_value").alias("total_value"))
    )


@query(
    "stream_running_counts_native",
    oracle=_RUNNING_COUNTS_ORACLE,
    tags=("streaming", "stateful", "native-state"),
)
def stream_running_counts_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION twin of ``stream_stateful_running_counts``: the
    identical per-user running (count, sum) expressed as a NATIVE
    streaming aggregation — ``groupBy(user_id).agg(...)`` in update
    mode, so the keyed state lives in the JVM state store (partial
    aggregation map-side, no Arrow crossing, no Python worker).

    Why this twin exists: applyInPandasWithState ships EVERY grouped
    row through Arrow to a Python worker per micro-batch — measured
    247.8 s vs 7.9 s native at 100× (SCALE.md r8) — so the catalog's
    rule is "native state for every state shape a built-in expresses;
    applyInPandasWithState only for transition logic Spark genuinely
    lacks". This query IS that rule demonstrated on the same oracle:
    standard running aggregates need no custom state at all.

    Exactness: the running sum accumulates integer cents (bigint), so
    the result is independent of micro-batch boundaries and partial-agg
    order; update mode may emit a key once per batch, and n_events is
    monotone, so max-struct selects each key's final state — identical
    projection to the Python-state variant, same batch GROUP BY oracle.
    """
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("__cents"),
        )
        .select("user_id", "n_events", (F.col("__cents") / 100.0).alias("total_value"))
    )
    result = _run_to_memory(agg, spark, mode="update")
    w_latest = F.max(F.struct("n_events", "total_value")).alias("s")
    return (
        result.groupBy("user_id")
        .agg(w_latest)
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.col("s.total_value").alias("total_value"),
        )
    )


@query(
    "stream_static_enrichment_join",
    oracle="""
    WITH dim AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS user_events
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.event_type, d.user_events
    FROM events e JOIN dim d USING (user_id)
    """,
    tags=("streaming", "join", "stream-static"),
)
def stream_static_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join — the third join shape Structured Streaming
    supports beside stream-stream and batch: each arriving event is
    enriched against a STATIC dimension (here a per-user profile built
    by a batch aggregation of the same table, the lambda-architecture
    enrichment pattern). Stateless on the stream side — no watermark,
    no state store; the static side plans as a regular (broadcastable)
    relation per micro-batch — CACHED here, because "per micro-batch"
    means the dimension aggregate would otherwise recompute for every
    one of the split's 4+ triggers (BACKLOG r6 #6); released through
    the standard deferred hook once the result is consumed.
    """
    from ..session import defer_release

    static_dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("user_events"))
        .cache()
    )
    defer_release(static_dim)
    enriched = _events_stream(spark, sf_dir).join(static_dim, "user_id").select(
        "event_id", "user_id", "event_type", "user_events"
    )
    return _run_to_memory(enriched, spark, mode="append")


@query(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    tags=("streaming", "dedup", "bounded-state"),
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED-STATE streaming dedup: ``dropDuplicatesWithinWatermark``
    evicts a key's dedup state once the watermark passes its event time
    + delay, so state size is O(keys per watermark window), not O(all
    keys ever) — the production shape for an unbounded stream, where
    plain ``dropDuplicates`` (``stream_dedup_keys``) grows state
    forever. With the delay wider than the staged data's span every
    duplicate pair falls inside one watermark window, so the emitted
    key set equals batch DISTINCT and the oracle is exact; on a real
    unbounded stream the guarantee degrades gracefully to
    "no duplicates closer than the delay".

    The delay is DERIVED from the staged data's actual time span
    (max − min + 1 day margin, one bounded aggregate at plan time) —
    a hardcoded constant silently starts dropping rows as late the
    moment a testdata round spans longer than it (ADVICE r4), and the
    round-robin split puts the full span in every file, so any late
    drop diverges from the DISTINCT oracle."""
    ev = _events_stream(spark, sf_dir).select("user_id", "event_type", "ts")
    span = (
        load_table(spark, sf_dir, "events")
        .agg(
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("span_s")
        )
        .collect()[0]["span_s"]
    )
    if span is None:
        # empty events table: the plan-time aggregate is NULL and the
        # arithmetic below would TypeError (BACKLOG r6 #4) — the oracle
        # (DISTINCT over nothing) is empty, so return that directly
        return spark.createDataFrame([], "user_id long, event_type string")
    delay = f"{int(span) + 86400} seconds"
    dedup = (
        ev.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _run_to_memory(dedup, spark, mode="append")


def _time_ordered_sentinel_stage(spark: SparkSession, sf_dir: str) -> str:
    """Stage events as a TIME-ORDERED multi-file split plus a SENTINEL
    final file, for streaming queries whose semantics depend on real
    watermark progression (outer-join null emission, state eviction).

    The default round-robin split (``_staged_stream_dir``) makes every
    file span the full time range — fine for the wide-watermark queries
    (nothing drops), but fatal for a tight watermark: after the first
    file the watermark sits near the global max and ~3/4 of all later
    rows are dropped as late. Here the split is ``repartitionByRange``
    on ``ts`` (file i = i-th contiguous time slice, mtimes forced
    increasing because the file source orders by modification time), so
    the watermark advances the way a real stream's does and nothing is
    late.

    The sentinel is one click at (global-min ts − 1 day) with an
    impossible user_id: it joins nothing and regresses no watermark
    (watermarks are monotone); its only job is to force one final
    micro-batch AFTER the last real file, because eviction-driven
    output for batch N's watermark advance is emitted in batch N+1 and
    ``availableNow`` otherwise stops at N. A real deployment needs
    neither trick — an unbounded stream always has a next batch.

    Built in a process-unique dir and atomically renamed into place
    (``_publish_stage_dir``), so concurrent cold-start processes can
    never expose a mis-ordered or partial file set (ADVICE r4): the
    sentinel, mtime pinning, and marker all happen pre-publish, and
    ``rename`` preserves the pinned mtimes."""
    base_stage = _staged_stream_dir(spark, sf_dir, "events")
    stage = base_stage + "_timeordered"
    if not os.path.exists(os.path.join(stage, "_SENTINEL_OK")):
        import datetime

        build = f"{stage}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        base = spark.read.parquet(base_stage)
        base.repartitionByRange(STREAM_SPLIT_FILES, "ts").sortWithinPartitions(
            "ts"
        ).write.mode("overwrite").parquet(build)

        min_ts = base.agg(F.min("ts")).collect()[0][0]
        if min_ts is None:
            # EMPTY events table: there is nothing to finalize, so no
            # sentinel (and no part files to mtime-pin) — publish the
            # empty stage as-is; the streaming read produces zero
            # batches and the append queries' oracles are empty too
            open(os.path.join(build, "_SENTINEL_OK"), "w").close()
            _publish_stage_dir(build, stage, "_SENTINEL_OK")
            return stage
        # sentinel values keyed by FIELD NAME, rendered in the staged
        # schema's order — a positional tuple would silently swap
        # columns if a testdata round added or reordered fields
        # (BACKLOG r6 #3); an unknown field fails loudly here instead
        sentinel_vals = {
            "event_id": -1,
            "ts": min_ts - datetime.timedelta(days=1),
            "user_id": -999999,
            "event_type": "click",
            "value": 0.0,
            "props": None,
        }
        unknown = [f.name for f in base.schema.fields if f.name not in sentinel_vals]
        if unknown:
            raise KeyError(
                f"sentinel has no value for new events column(s) {unknown}; "
                "extend sentinel_vals for the new testdata layout"
            )
        sentinel = spark.createDataFrame(
            [tuple(sentinel_vals[f.name] for f in base.schema.fields)],
            base.schema,
        )
        tmp = os.path.join(build, "_sentinel_build")
        sentinel.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(os.path.join(tmp, part), os.path.join(build, "zz_sentinel.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)
        # pin mtimes: part files ascending by name (= ascending time
        # range), sentinel strictly last
        parts = sorted(
            f
            for f in os.listdir(build)
            if f.endswith(".parquet") and f != "zz_sentinel.parquet"
        )
        t0 = os.path.getmtime(os.path.join(build, parts[-1]))
        for i, f in enumerate(parts):
            os.utime(os.path.join(build, f), (t0 + 10 * i, t0 + 10 * i))
        os.utime(
            os.path.join(build, "zz_sentinel.parquet"),
            (t0 + 10 * len(parts), t0 + 10 * len(parts)),
        )
        open(os.path.join(build, "_SENTINEL_OK"), "w").close()
        _publish_stage_dir(build, stage, "_SENTINEL_OK")
    return stage


def _events_stream_time_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    stage = _time_ordered_sentinel_stage(spark, sf_dir)
    file_schema = spark.read.parquet(_staged_stream_dir(spark, sf_dir, "events")).schema
    return (
        spark.readStream.format("parquet")
        .schema(file_schema)
        .option("maxFilesPerTrigger", 1)
        .load(stage)
    )


@query(
    "stream_leftouter_interval_join",
    oracle="""
    WITH bounds AS (
        SELECT least(
            max(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END),
            max(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END)
        ) - INTERVAL 2 MINUTE AS cutoff
        FROM events
    ),
    p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events, bounds
          WHERE event_type = 'purchase' AND CAST(ts AS TIMESTAMP) <= bounds.cutoff),
    c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'click')
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL '10 minutes'
     AND c.ts <= p.ts
    """,
    tags=("streaming", "join", "interval", "outer"),
)
def stream_leftouter_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: purchases with no click
    in the preceding 10 minutes must still be emitted (null click_id) —
    the shape Spark can only produce once the watermark proves no
    matching click can still arrive, at which point the unmatched left
    state evicts as a null-padded row. Unlike the inner form
    (``stream_interval_join``, wide watermark, nothing ever finalizes),
    this query NEEDS real watermark progression, so it runs over the
    time-ordered staged split (``_time_ordered_sentinel_stage``: file i
    = i-th time slice, so the 1-minute watermark advances like a real
    stream's and drops nothing as late; a final sentinel batch flushes
    the last evictions).

    Determinism: the left side is pre-filtered to purchases ≥ 2 minutes
    older than the last event of the slower stream (one bounded
    aggregate collected at plan time), and the watermark policy is
    pinned to ``max`` for this query — under the default ``min`` policy
    the global watermark is capped by the PURCHASE column's own maximum
    minus its delay, so the last retained purchase could never prove
    itself unmatched (a self-referential deadlock the 2-minute cutoff
    cannot fix); under ``max`` the denser click stream drives the
    watermark past every retained purchase, and the emitted set equals
    the batch LEFT JOIN the oracle runs."""
    batch = load_table(spark, sf_dir, "events")
    cutoff_row = (
        batch.groupBy()
        .agg(
            F.least(
                F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
                F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
            ).alias("m")
        )
        .collect()[0]
    )
    import datetime

    if cutoff_row["m"] is None:
        # no purchases or no clicks at all: the LEAST() aggregate is
        # NULL and the timedelta would TypeError (BACKLOG r6 #4); the
        # oracle's cutoff is NULL too, so its p CTE — and the join — is
        # empty. Return the empty result with the query's exact schema.
        return spark.createDataFrame(
            [], "purchase_id long, click_id long, user_id long"
        )
    cutoff = cutoff_row["m"] - datetime.timedelta(minutes=2)

    purchases = (
        _events_stream_time_ordered(spark, sf_dir)
        .filter((F.col("event_type") == "purchase") & (F.col("ts") <= F.lit(cutoff)))
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 minute")
    )
    clicks = (
        _events_stream_time_ordered(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 minute")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    ).select("purchase_id", "click_id", F.col("p_user").alias("user_id"))
    policy_key = "spark.sql.streaming.multipleWatermarkPolicy"
    prev_policy = spark.conf.get(policy_key, "min")
    spark.conf.set(policy_key, "max")
    try:
        return _run_to_memory(joined, spark, mode="append")
    finally:
        spark.conf.set(policy_key, prev_policy)


@query(
    "stream_tumbling_append_finalized",
    oracle="""
    WITH wm AS (
        -- Spark tracks event-time stats in MILLISECONDS: the watermark
        -- is floor_ms(max event time) - delay, so the oracle truncates
        -- identically before subtracting
        SELECT make_timestamp((epoch_us(max(CAST(ts AS TIMESTAMP))) // 1000) * 1000)
               - INTERVAL 1 MINUTE AS w
        FROM events
    )
    SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events, wm
    WHERE time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP))
          + INTERVAL '10 minutes' <= wm.w
    GROUP BY 1, 2
    """,
    tags=("streaming", "window", "tumbling", "append", "watermark"),
)
def stream_tumbling_append_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling windows in APPEND mode: a window row is emitted exactly
    once, when the watermark proves it complete — the production
    contract for a downstream sink that must never see a partial
    aggregate (the complete-mode family re-emits everything every
    trigger). Runs over the time-ordered staged split with a 1-minute
    watermark, so the watermark advances like a real stream's; the
    sentinel final batch flushes the last finalizable windows.

    Determinism: final watermark = global max ts − 1 minute (single
    event-time column), so the emitted set is every window whose end ≤
    that watermark — the oracle computes the same cutoff from the same
    data. Windows overlapping the last minute stay un-emitted, exactly
    as a live pipeline would leave them open. Spark's eviction
    predicate is ``window.end <= watermark`` — a window whose end
    EQUALS the watermark exactly IS emitted (pinned empirically by
    tests/test_streaming.py::test_append_finalization_tie_*, which
    engineer the exact-tie micro-stream; the oracle's cutoff is
    aligned to the same ``<=``). The sentinel's ancient click is
    dropped as late by construction so it never contributes. Exact
    integer cents keep the sums engine-portable."""
    ev = _events_stream_time_ordered(spark, sf_dir)
    from ..functions.exact import cents

    agg = (
        ev.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents(F.col("value"))).alias("sum_cents"),
        )
    )
    out = agg.select(
        F.col("window.start").alias("window_start"), "event_type", "n", "sum_cents"
    )
    return _run_to_memory(out, spark, mode="append")


@query(
    "stream_session_append_finalized",
    oracle="""
    WITH wm AS (
        -- ms-truncated like Spark's event-time stats (see tumbling twin);
        -- session ends are ARBITRARY timestamps (last event + gap), so
        -- without this a session ending in the sub-millisecond band
        -- [floor_ms(max)-1min, max-1min) would flip between engines
        SELECT make_timestamp((epoch_us(max(CAST(ts AS TIMESTAMP))) // 1000) * 1000)
               - INTERVAL 1 MINUTE AS w
        FROM events
    ),
    ordered AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER win IS NULL THEN 1
                    WHEN CAST(ts AS TIMESTAMP) >= lag(CAST(ts AS TIMESTAMP)) OVER win
                         + INTERVAL '30 minutes' THEN 1
                    ELSE 0 END AS is_new
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts)
    ),
    islands AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    ),
    sessions AS (
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL '30 minutes' AS session_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM islands
        GROUP BY user_id, session_id
    )
    SELECT s.user_id, s.session_start, s.session_end, s.n_events
    FROM sessions s, wm
    WHERE s.session_end <= wm.w
    """,
    tags=("streaming", "window", "session", "append", "watermark"),
)
def stream_session_append_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows in APPEND mode: a session row is emitted exactly
    once, when the watermark proves no further event can extend or
    merge it (wm past session end = last event + 30 min gap). The
    complete-mode twin (``stream_session_windows``) re-emits all state
    every trigger; this is the form a downstream sink consumes.
    Session-window state is the hardest eviction case — windows MERGE
    as events arrive, so the store must re-derive closure per batch —
    and append mode is the only proof merging+finalization interact
    correctly. Same determinism recipe as the tumbling append query:
    time-ordered staged split, 1-minute watermark, sentinel flush
    batch, oracle recomputing the identical cutoff with the same
    ``session_end <= watermark`` tie direction Spark uses (pinned by
    tests/test_streaming.py::test_append_finalization_tie_session);
    sessions overlapping the last minute stay open, exactly as live."""
    ev = _events_stream_time_ordered(spark, sf_dir)
    out = session_windowed(
        ev,
        "ts",
        gap="30 minutes",
        keys=("user_id",),
        aggs=(F.count("*").alias("n_events"),),
        watermark="1 minute",
    )
    result = _run_to_memory(out, spark, mode="append")
    return result.select(
        "user_id",
        F.col("window.start").alias("session_start"),
        F.col("window.end").alias("session_end"),
        "n_events",
    )


def _stream_inference_oracle() -> str:
    from .text import _MODEL_INFERENCE_ORACLE

    return _MODEL_INFERENCE_ORACLE


@query(
    "stream_model_inference",
    oracle=_stream_inference_oracle(),
    tags=("streaming", "inference", "llm"),
)
def stream_model_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model scoring AT INGEST: the linear quality classifier
    (``text_model_inference``) applied to the documents STREAM — the
    curation-pipeline shape where every arriving document gets its
    keep/drop verdict inside the ingest micro-batch instead of a later
    batch sweep. Stateless per-row projection → no watermark, no state
    store; the scoring expression is the same inlined-literal codegen
    the batch twin runs, so per-batch cost is scan + projection and the
    emitted set over all batches equals the batch run (the oracle is
    literally the batch query's oracle)."""
    from .text import score_documents

    scored = score_documents(_documents_stream(spark, sf_dir))
    return _run_to_memory(scored, spark, mode="append")
