"""Dev/test Kinesis consumer: a bounded boto3 snapshot read.

The production path is the Spark Kinesis connector
(``streaming_source(kind="kinesis")``, streaming/source.py) — but the
connector jar cannot be assumed in every environment, and the reference
itself validates end-to-end against a live stream (README.md:33-36).
This module is the jar-free twin: it drains each shard of a (real or
kinesalite/LocalStack/fake) Kinesis endpoint once via the public
GetShardIterator/GetRecords API and returns a **batch** DataFrame, so
produce→consume semantics — shard fan-in, ordering per shard, gzip
payload decode (SURVEY §2.3.3), record metadata — are testable anywhere
boto3 can reach an endpoint.

Scale note: this is a DRIVER-SIDE poll, deliberately — it exists for
dev loops, integration tests, and small backfills (the same role the
reference's generator+console pairing plays). A 100 TB ingest goes
through the connector path, where each executor owns shards; the two
paths share the decode step and output schema, so tests of this path
cover the downstream plumbing of both.

Consumer tuning mirrors StreamingJob.java:84-95: ``GetRecords`` asks
for up to 10000 records per call (SHARD_GETRECORDS_MAX).
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .source import decode_payload

SNAPSHOT_SCHEMA = (
    "value string, partition_key string, sequence_number string, "
    "shard_id string, arrival_ts timestamp"
)

# Reference consumer tuning (StreamingJob.java:84-95): non-adaptive poll
# interval and max records per GetRecords call.
SHARD_GETRECORDS_INTERVAL_MILLIS = 1000  # StreamingJob.java:90-91
SHARD_GETRECORDS_MAX = 10000  # StreamingJob.java:93-94

# Adaptive-reads mode (SHARD_USE_ADAPTIVE_READS, StreamingJob.java:84-89):
# instead of a fixed Limit, size the NEXT GetRecords request so one
# fetch per poll interval fills — but does not exceed — the service's
# per-shard read-throughput ceiling of 2 MiB/s (the documented Kinesis
# GetRecords limit the Flink connector's adaptive mode targets):
#   next_limit = ceiling_bytes_per_sec * (interval_ms / 1000) / avg_record_bytes
# clamped to [1, SHARD_GETRECORDS_MAX]. Recomputed from every non-empty
# batch's average record size, so shrinking records raise the limit and
# growing records lower it.
KINESIS_SHARD_BYTES_PER_SEC_LIMIT = 2 * 1024 * 1024


def _adapt_limit(
    batch_bytes: int, n_records: int, interval_millis: int, current: int
) -> int:
    """Next GetRecords Limit under adaptive reads; ``current`` is kept
    when the batch was empty (no size signal) OR when there is no poll
    interval to budget against — interval 0 means unpaced draining
    (dev/test mode), where sizing ``target`` from a 0-second byte
    budget would collapse the Limit to 1 and turn a drain into one RPC
    per record."""
    if n_records <= 0 or batch_bytes <= 0 or interval_millis <= 0:
        return current
    avg = batch_bytes / n_records
    target = KINESIS_SHARD_BYTES_PER_SEC_LIMIT * (interval_millis / 1000.0) / avg
    return max(1, min(int(target), SHARD_GETRECORDS_MAX))


# Pacing floor for one-shot backlog drains: the GetRecords API allows
# 5 calls/s/shard, so 200 ms between pages is the fastest sustained
# rate that never trips ProvisionedThroughputExceededException. The
# CONTINUOUS poller paces at the reference's 1000 ms instead
# (SHARD_GETRECORDS_INTERVAL_MILLIS).
SNAPSHOT_PAGE_INTERVAL_MILLIS = 200


def kinesis_snapshot_read(
    spark: SparkSession,
    stream_name: str,
    *,
    region: str = "us-east-1",
    endpoint_url: str | None = None,
    decode: str = "none",
    max_records_per_get: int = 10000,
    interval_millis: int = SNAPSHOT_PAGE_INTERVAL_MILLIS,
    boto3_client: Any | None = None,
    client_kwargs: dict[str, Any] | None = None,
) -> DataFrame:
    """Drain every shard of ``stream_name`` from TRIM_HORIZON to its
    current tip and return the records as a batch DataFrame with schema
    ``SNAPSHOT_SCHEMA``. ``decode="gzip"`` gunzips payloads (the
    reference's producer gzips, its consumer forgot — SURVEY §2.3.3;
    here the decode is explicit). Pass ``boto3_client`` to reuse a
    preconfigured client (tests), else one is built from
    ``region``/``endpoint_url``/``client_kwargs``.

    Shares ``_drain_shard`` with the continuous poller (one stall
    guard, one pacing knob, one decode path): pages are paced at
    ``interval_millis`` so a deep multi-page drain respects the
    5-GetRecords/s/shard API limit instead of hot-looping into
    ProvisionedThroughputExceededException; pass 0 to disable (in-
    process fake endpoints).
    """
    client = _build_client(boto3_client, region, endpoint_url, client_kwargs)

    rows: list[tuple] = []
    for sh in _list_shards_all(client, stream_name):
        shard_rows, _, _, _ = _drain_shard(
            client,
            stream_name,
            sh["ShardId"],
            None,
            decode=decode,
            interval_millis=interval_millis,
            max_records_per_get=max_records_per_get,
        )
        rows += shard_rows

    df = spark.createDataFrame(rows, SNAPSHOT_SCHEMA)
    if decode != "none":
        df = df.withColumn("value", decode_payload(F.col("value"), codec=decode))
    return df


def _list_shards_all(client: Any, stream_name: str) -> list[dict]:
    """Full paginated ListShards for a stream (shared by the snapshot
    read and the poller's shard discovery)."""
    shards: list[dict] = []
    token = None
    while True:
        kwargs = {"StreamName": stream_name} if not token else {"NextToken": token}
        resp = client.list_shards(**kwargs)
        shards += resp["Shards"]
        token = resp.get("NextToken")
        if not token:
            return shards


def _build_client(
    boto3_client: Any | None,
    region: str,
    endpoint_url: str | None,
    client_kwargs: dict[str, Any] | None,
):
    if boto3_client is not None:
        return boto3_client
    try:
        import boto3
    except ImportError as ex:  # pragma: no cover - boto3 is baked in here
        raise RuntimeError("needs boto3 (or pass boto3_client)") from ex
    return boto3.client(
        "kinesis",
        region_name=region,
        endpoint_url=endpoint_url,
        **(client_kwargs or {}),
    )


def _decode_record(rec: dict, decode: str) -> tuple:
    data = rec["Data"]
    if isinstance(data, (bytes, bytearray)):
        if decode == "none":
            value = bytes(data).decode("utf-8", errors="replace")
        else:
            # byte-preserving: the gzip UDF re-encodes latin-1
            value = bytes(data).decode("latin-1")
    else:
        value = str(data)
    ts = rec.get("ApproximateArrivalTimestamp")
    if isinstance(ts, (int, float)):
        ts = _dt.datetime.fromtimestamp(ts, tz=_dt.timezone.utc)
    if ts is not None and ts.tzinfo is not None:
        ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return (value, rec.get("PartitionKey"), rec["SequenceNumber"], ts)


def _drain_shard(
    client: Any,
    stream: str,
    shard_id: str,
    after_seq: str | None,
    *,
    end_seq: str | None = None,
    decode: str = "none",
    interval_millis: int = SHARD_GETRECORDS_INTERVAL_MILLIS,
    max_records_per_get: int = SHARD_GETRECORDS_MAX,
    use_adaptive_reads: bool = False,
    start_limit: int | None = None,
) -> tuple[list[tuple], str | None, bool, int]:
    """Drain one shard from ``after_seq`` (exclusive; None =
    TRIM_HORIZON) to the current tip, or to ``end_seq`` inclusive on a
    replay. Pure function of the client — runs identically on the
    driver (``KinesisMicroBatchPoller._read_shard``) and inside an
    executor task (``read_shards_distributed``). Returns
    ``(rows, last_seq, retired, next_limit)``; retired means the shard
    is closed AND fully drained (the null-NextShardIterator retire
    signal), next_limit is the adaptive GetRecords Limit to carry into
    the next fetch of this shard.
    """
    if after_seq is None:
        it = client.get_shard_iterator(
            StreamName=stream,
            ShardId=shard_id,
            ShardIteratorType="TRIM_HORIZON",
        )["ShardIterator"]
    else:
        it = client.get_shard_iterator(
            StreamName=stream,
            ShardId=shard_id,
            ShardIteratorType="AFTER_SEQUENCE_NUMBER",
            StartingSequenceNumber=after_seq,
        )["ShardIterator"]
    interval_s = interval_millis / 1000.0
    limit = start_limit if start_limit is not None else max_records_per_get
    if not use_adaptive_reads:
        limit = max_records_per_get
    rows: list[tuple] = []
    last_seq, retired, first = after_seq, False, True
    stalled, prev_behind = 0, None
    while it:
        if not first and interval_s > 0:
            # SHARD_GETRECORDS_INTERVAL_MILLIS pacing between repeat
            # GetRecords calls on a still-behind shard
            time.sleep(interval_s)
        first = False
        resp = client.get_records(ShardIterator=it, Limit=limit)
        if use_adaptive_reads and resp["Records"]:
            batch_bytes = sum(
                len(r["Data"]) if isinstance(r["Data"], (bytes, bytearray))
                else len(str(r["Data"]).encode())
                for r in resp["Records"]
            )
            limit = _adapt_limit(
                batch_bytes, len(resp["Records"]), interval_millis, limit
            )
        # stall guard: empty pages are normal mid-drain, but consecutive
        # empties with no MillisBehindLatest progress mean a
        # throttled/stuck endpoint — fail LOUDLY rather than spin
        # forever (the checkpoint was not advanced, so the next poll
        # retries this batch cleanly)
        behind = resp.get("MillisBehindLatest", 0)
        if resp["Records"]:
            stalled = 0
        elif behind != 0:
            stalled = (
                stalled + 1
                if prev_behind is not None and behind >= prev_behind
                else 0
            )
            if stalled > 100:
                raise RuntimeError(
                    f"kinesis shard reader stalled on shard {shard_id}: "
                    f"{stalled} consecutive empty GetRecords pages with no "
                    f"MillisBehindLatest progress (still {behind} ms behind)"
                )
        prev_behind = behind
        done = False
        for rec in resp["Records"]:
            if end_seq is not None and int(rec["SequenceNumber"]) > int(end_seq):
                done = True  # replay bound: newer arrivals belong to N+1
                break
            value, pk, seq, ts = _decode_record(rec, decode)
            rows.append((value, pk, seq, shard_id, ts))
            last_seq = seq
        it = resp.get("NextShardIterator")
        if it is None:
            retired = True  # closed shard fully drained
            break
        if done or (end_seq is not None and last_seq == end_seq):
            break
        if behind == 0:
            # caught up to the tip — break immediately (records or
            # not): another GetRecords would only burn one
            # interval-sleep + one empty RPC per shard per poll
            break
    return rows, last_seq, retired, limit


# extra columns over SNAPSHOT_SCHEMA: each shard task emits its data
# rows plus ONE ledger row (is_meta=true) carrying the shard's new
# position (sequence_number = last consumed seq, or the starting
# after_seq when nothing arrived), its retire flag, and — under
# adaptive reads — the shard's adapted GetRecords Limit to seed the
# next poll's fetches (the executor-side twin of the driver poller's
# ``_shard_limits`` carry). The driver learns the offsets from a
# #shards-sized collect, never from the data.
PARALLEL_READ_SCHEMA = (
    SNAPSHOT_SCHEMA + ", is_meta boolean, retired boolean, next_limit int"
)


def read_shards_distributed(
    spark: SparkSession,
    stream_name: str,
    tasks: list[tuple[str, str | None, str | None, int | None]],
    *,
    region: str = "us-east-1",
    endpoint_url: str | None = None,
    decode: str = "none",
    interval_millis: int = SHARD_GETRECORDS_INTERVAL_MILLIS,
    max_records_per_get: int = SHARD_GETRECORDS_MAX,
    use_adaptive_reads: bool = False,
    client_kwargs: dict[str, Any] | None = None,
) -> DataFrame:
    """EXECUTOR-PARALLEL jar-free shard consumption: fan the shard
    drain loop (``_drain_shard``) out over the cluster via
    ``mapInPandas`` — each task owns its shard's iterator and boto3
    client, the driver owns only the shard list and (in the poller) the
    offsets ledger. This is the scale shape of the reference's
    production consumer, where shards are distributed across parallel
    subtasks (StreamingJob.java:98-106 via the connector's consumer
    fan-out): adding executors adds read throughput, and no record ever
    passes through the driver.

    ``tasks`` is ``[(shard_id, after_seq | None, end_seq | None,
    start_limit | None)]`` — ``start_limit`` seeds the shard's first
    GetRecords Limit under adaptive reads (carried between polls by the
    poller's ledger). The returned DataFrame has
    ``PARALLEL_READ_SCHEMA`` — data rows (``is_meta = false``) in
    per-shard arrival order plus exactly one ledger row per shard
    (``is_meta = true``) carrying its new position, retire flag, and
    adapted next Limit. Values are RAW (byte-preserving latin-1 for
    ``decode="gzip"``); the consumer applies ``decode_payload`` after
    splitting off the meta rows, exactly like the driver-side path.

    The client is built INSIDE each task from picklable config (region,
    endpoint, extra kwargs) — pass credentials via ``client_kwargs`` or
    the executors' ambient AWS env, never a live client object.
    """
    import pandas as pd

    conf = {
        "region": region,
        "endpoint_url": endpoint_url,
        "client_kwargs": dict(client_kwargs or {}),
    }
    data_cols = ["value", "partition_key", "sequence_number", "shard_id", "arrival_ts"]

    def run(batches):
        client = None
        for pdf in batches:
            for task_row in pdf.itertuples(index=False):
                if client is None:
                    import boto3

                    client = boto3.client(
                        "kinesis",
                        region_name=conf["region"],
                        endpoint_url=conf["endpoint_url"],
                        **conf["client_kwargs"],
                    )
                after = task_row.after_seq if task_row.after_seq is not None else None
                end = task_row.end_seq if task_row.end_seq is not None else None
                # nullable ints cross the Arrow boundary as NaN floats
                sl = task_row.start_limit
                start_limit = None if pd.isna(sl) else int(sl)
                rows, last_seq, retired, next_limit = _drain_shard(
                    client,
                    stream_name,
                    task_row.shard_id,
                    after,
                    end_seq=end,
                    decode=decode,
                    interval_millis=interval_millis,
                    max_records_per_get=max_records_per_get,
                    use_adaptive_reads=use_adaptive_reads,
                    start_limit=start_limit,
                )
                data = pd.DataFrame(rows, columns=data_cols)
                data["arrival_ts"] = pd.to_datetime(data["arrival_ts"])
                data["is_meta"] = False
                data["retired"] = False
                data["next_limit"] = None
                meta = pd.DataFrame(
                    [
                        {
                            "value": None,
                            "partition_key": None,
                            "sequence_number": last_seq,
                            "shard_id": task_row.shard_id,
                            "arrival_ts": None,
                            "is_meta": True,
                            "retired": retired,
                            "next_limit": next_limit if use_adaptive_reads else None,
                        }
                    ]
                )
                meta["arrival_ts"] = pd.to_datetime(meta["arrival_ts"])
                yield pd.concat([data, meta], ignore_index=True)

    # EXACTLY one shard per partition: parallelize slices n items into n
    # partitions deterministically, so every shard's network drain runs
    # concurrently. (repartition(n)'s RoundRobinPartitioning starts each
    # input partition at a random offset and can collide two shards onto
    # one slot while another stays empty — two paced drains then run
    # sequentially in one task.)
    n = max(1, len(tasks))
    tasks_df = spark.createDataFrame(
        spark.sparkContext.parallelize(tasks, n),
        "shard_id string, after_seq string, end_seq string, start_limit int",
    )
    return tasks_df.mapInPandas(run, schema=PARALLEL_READ_SCHEMA)


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


class KinesisMicroBatchPoller:
    """CONTINUOUS jar-free Kinesis consumption: an incremental poll
    loop with persisted shard positions and reshard handling — the
    micro-batch twin of the reference's connector consumption
    (StreamingJob.java:74-110), runnable against any endpoint boto3 can
    reach (real, kinesalite/LocalStack, or the in-process
    ``kinesis_fake`` double).

    Where ``kinesis_snapshot_read`` drains once and forgets, each
    ``poll()`` here returns ONLY the records that arrived since the
    last committed batch, exactly like a Structured Streaming trigger:

    - **Persisted positions**: per-shard last-consumed sequence numbers
      live in a checkpoint directory shaped like Spark's own
      (``offsets/<N>.json`` written BEFORE the batch is handed out,
      ``commits/<N>`` marker written by ``commit()`` after the caller
      durably processed it).
    - **Exactly-once batch boundaries**: a crash between offsets and
      commit makes the next ``poll()`` REPLAY batch N with byte-identical
      membership — the offsets file pins each shard's (start, end]
      sequence range, so records that arrived after the original read
      are excluded from the replay and delivered in N+1. (Replay assumes
      the ranges are still inside the stream's retention window —
      the same contract every Kinesis consumer has.)
    - **Resharding**: shards discovered via ``ListShards`` that carry a
      ``ParentShardId``/``AdjacentParentShardId`` are admitted only
      once every parent is fully drained and retired (``GetRecords``
      returning a null ``NextShardIterator``), preserving per-key
      ordering across SplitShard/MergeShards transitions — the same
      parent-before-child rule the KCL and the Flink connector follow.
    - **Reference tuning**: ``interval_millis`` /
      ``max_records_per_get`` default to the reference's consumer
      config (SHARD_GETRECORDS_INTERVAL_MILLIS / SHARD_GETRECORDS_MAX,
      StreamingJob.java:84-95); the interval paces repeat GetRecords
      calls against a shard that is still behind the tip.

    Scale note: the default mode polls DRIVER-side — the dev-loop /
    integration-test / small-backfill surface (and the proof harness
    for reshard semantics). ``executor_parallel=True`` removes the
    driver ceiling: shards fan out across executor tasks via
    ``read_shards_distributed`` (mapInPandas — each task owns its
    shard iterator and boto3 client, mirroring the reference's
    parallel subtask consumption, StreamingJob.java:98-106), batches
    stage to parquet under the checkpoint so offsets derive from a
    #shards-sized ledger collect and uncommitted batches replay
    byte-identically without re-polling. Both modes share
    ``_drain_shard``, the decode step, the offsets/commits protocol,
    and the output schema; a 100 TB ingest can also use the connector
    jar where available (streaming/source.py).
    """

    def __init__(
        self,
        spark: SparkSession,
        stream_name: str,
        *,
        checkpoint_dir: str,
        region: str = "us-east-1",
        endpoint_url: str | None = None,
        decode: str = "none",
        interval_millis: int = SHARD_GETRECORDS_INTERVAL_MILLIS,
        max_records_per_get: int = SHARD_GETRECORDS_MAX,
        use_adaptive_reads: bool = False,
        executor_parallel: bool = False,
        boto3_client: Any | None = None,
        client_kwargs: dict[str, Any] | None = None,
    ) -> None:
        if executor_parallel and boto3_client is not None:
            raise ValueError(
                "executor_parallel mode builds boto3 clients INSIDE each "
                "executor task from (region, endpoint_url, client_kwargs) "
                "— a live client object is not picklable; pass the config "
                "instead"
            )
        self._spark = spark
        self._stream = stream_name
        self._decode = decode
        self._region = region
        self._endpoint_url = endpoint_url
        self._client_kwargs = dict(client_kwargs or {})
        # executor-parallel consumption (the scale shape: shards fan out
        # across tasks like the reference's parallel subtask consumption,
        # StreamingJob.java:98-106); batches stage to parquet under the
        # checkpoint dir so offsets are derived AFTER the read and
        # replays are byte-identical without re-polling the stream
        self._parallel = executor_parallel
        self._staging_dir = os.path.join(checkpoint_dir, "staging")
        if executor_parallel:
            os.makedirs(self._staging_dir, exist_ok=True)
        self._interval_millis = interval_millis
        self._interval_s = interval_millis / 1000.0
        self._max_per_get = max_records_per_get
        # SHARD_USE_ADAPTIVE_READS (StreamingJob.java:84-89): when true,
        # each shard's GetRecords Limit is re-sized per fetch from the
        # observed average record size against the 2 MiB/s/shard read
        # ceiling; when false the fixed interval/max tuning applies
        # (the reference's else-branch, :90-94)
        self._adaptive = use_adaptive_reads
        self._shard_limits: dict[str, int] = {}
        self._client = _build_client(boto3_client, region, endpoint_url, client_kwargs)
        self._offsets_dir = os.path.join(checkpoint_dir, "offsets")
        self._commits_dir = os.path.join(checkpoint_dir, "commits")
        os.makedirs(self._offsets_dir, exist_ok=True)
        os.makedirs(self._commits_dir, exist_ok=True)

    # --- checkpoint bookkeeping -----------------------------------------

    def _batch_ids(self) -> list[int]:
        return sorted(
            int(f[:-5])
            for f in os.listdir(self._offsets_dir)
            if f.endswith(".json")
        )

    def _read_offsets(self, batch_id: int) -> dict:
        with open(os.path.join(self._offsets_dir, f"{batch_id}.json")) as f:
            return json.load(f)

    def _is_committed(self, batch_id: int) -> bool:
        return os.path.exists(os.path.join(self._commits_dir, str(batch_id)))

    def commit(self, batch_id: int) -> None:
        """Mark batch ``batch_id`` durably processed: the next poll
        advances instead of replaying it. Committing also prunes
        checkpoint files older than this batch — a continuous poller
        (the class's purpose) would otherwise accumulate one offsets
        file + one commit marker per poll forever, and every
        ``_batch_ids()`` listdir would slow linearly with age. Replay
        only ever needs the LATEST offsets (the uncommitted batch) and
        its predecessor's positions, both ≥ ``batch_id`` after this
        commit; staging has its own GC (``_gc_staging``)."""
        marker = os.path.join(self._commits_dir, str(batch_id))
        with open(marker + ".tmp", "w") as f:
            f.write("ok")
        os.replace(marker + ".tmp", marker)
        for d, suffix in ((self._offsets_dir, ".json"), (self._commits_dir, "")):
            for name in os.listdir(d):
                stem = name[: -len(suffix)] if suffix else name
                try:
                    bid = int(stem)
                except ValueError:
                    continue
                if bid < batch_id:
                    try:
                        os.remove(os.path.join(d, name))
                    except OSError:
                        pass

    # --- shard discovery ------------------------------------------------

    def _list_shards(self) -> list[dict]:
        return _list_shards_all(self._client, self._stream)

    @staticmethod
    def _admit_shards(positions: dict[str, dict], discovered: list[dict]) -> None:
        """Admit newly-discovered shards whose parents are retired (or
        genuinely absent from the stream — pre-trim ancestors); defer
        children of still-draining parents to a later poll.

        Admission is iterated to a FIXPOINT over the discovery list
        rather than a single pass (ADVICE r5): ``ListShards`` order is
        unspecified, so a single pass over an already-resharded stream
        could evaluate a child before its (discovered but not yet
        tracked) parent and admit both in the same batch — weakening
        parent-before-child ordering. With the fixpoint loop a child is
        admitted only once its discovered parents are IN ``positions``
        and retired; a parent absent from the discovery list entirely
        (expired past the retention window) never blocks its child.
        Multi-level reshard chains (grandchildren) resolve across polls,
        one generation per poll — the same pacing the KCL exhibits.
        """
        discovered_ids = {sh["ShardId"] for sh in discovered}
        changed = True
        while changed:
            changed = False
            for sh in discovered:
                sid = sh["ShardId"]
                if sid in positions:
                    continue
                parents = [
                    p
                    for p in (sh.get("ParentShardId"), sh.get("AdjacentParentShardId"))
                    if p is not None and p in discovered_ids
                ]
                blocked = any(
                    p not in positions or not positions[p].get("retired")
                    for p in parents
                )
                if not blocked:
                    positions[sid] = {"after_seq": None, "retired": False}
                    changed = True

    # --- the poll loop ---------------------------------------------------

    def _read_shard(
        self,
        shard_id: str,
        after_seq: str | None,
        *,
        end_seq: str | None = None,
    ) -> tuple[list[tuple], str | None, bool]:
        """Read one shard from its persisted position to the current tip
        (or to ``end_seq`` inclusive on replay). Returns (rows, new
        after_seq, retired) where retired means closed AND drained."""
        rows, last_seq, retired, next_limit = _drain_shard(
            self._client,
            self._stream,
            shard_id,
            after_seq,
            end_seq=end_seq,
            decode=self._decode,
            interval_millis=self._interval_millis,
            max_records_per_get=self._max_per_get,
            use_adaptive_reads=self._adaptive,
            start_limit=self._shard_limits.get(shard_id),
        )
        if self._adaptive:
            self._shard_limits[shard_id] = next_limit
        return rows, last_seq, retired

    def poll(self) -> tuple[int, DataFrame]:
        """One incremental micro-batch. Returns ``(batch_id, df)`` with
        the snapshot schema plus nothing extra — call ``commit(batch_id)``
        after durably processing the result."""
        ids = self._batch_ids()
        if self._adaptive and ids and not self._shard_limits:
            # adapted limits survive a RESTART, not just the next poll:
            # a fresh poller re-seeds from the last offsets file so its
            # first fetch honors the 2 MiB/s/shard sizing instead of
            # overshooting from the API max (the same hazard the
            # cross-poll carry closes, at process granularity)
            for sid, lim in self._read_offsets(ids[-1]).get("limits", {}).items():
                self._shard_limits[sid] = int(lim)
        if ids and not self._is_committed(ids[-1]):
            return self._replay(ids[-1], ids)
        batch_id = (ids[-1] + 1) if ids else 0
        positions: dict[str, dict] = (
            dict(self._read_offsets(ids[-1])["shards"]) if ids else {}
        )

        self._admit_shards(positions, self._list_shards())

        if self._parallel:
            return self._poll_parallel(batch_id, positions)

        rows: list[tuple] = []
        for sid, pos in positions.items():
            if pos.get("retired"):
                continue
            shard_rows, last_seq, retired = self._read_shard(sid, pos["after_seq"])
            rows += shard_rows
            positions[sid] = {"after_seq": last_seq, "retired": retired}

        _atomic_write_json(
            os.path.join(self._offsets_dir, f"{batch_id}.json"),
            {"batch_id": batch_id, "shards": positions,
             "limits": dict(self._shard_limits)},
        )
        return batch_id, self._to_df(rows)

    # --- executor-parallel poll ------------------------------------------

    def _staging_path(self, batch_id: int) -> str:
        return os.path.join(self._staging_dir, f"batch={batch_id}")

    def _poll_parallel(
        self, batch_id: int, positions: dict[str, dict]
    ) -> tuple[int, DataFrame]:
        """Distributed micro-batch: executors drain shards in parallel
        (``read_shards_distributed``) and the job lands the raw rows +
        per-shard ledger rows in a parquet STAGING dir under the
        checkpoint; the driver then derives the new offsets from the
        #shards-sized ledger collect and writes them. Ordering of the
        write matters: staging is durable BEFORE offsets, so an
        uncommitted batch always replays byte-identically from staging
        (no second network read), and a crash mid-stage leaves no
        offsets file — the next poll simply overwrites the partial
        staging. Data rows never pass through the driver."""
        # stagings from batches before the previous one are committed
        # AND consumed by now (poll N only starts after N-1 commits);
        # drop them so the checkpoint dir doesn't grow per poll
        self._gc_staging(keep_from=batch_id - 1)
        tasks = [
            (
                sid,
                pos["after_seq"],
                None,
                self._shard_limits.get(sid) if self._adaptive else None,
            )
            for sid, pos in positions.items()
            if not pos.get("retired")
        ]
        staging = self._staging_path(batch_id)
        if not tasks:
            _atomic_write_json(
                os.path.join(self._offsets_dir, f"{batch_id}.json"),
                {"batch_id": batch_id, "shards": positions, "staged": False,
                 "limits": dict(self._shard_limits)},
            )
            return batch_id, self._to_df([])
        raw = read_shards_distributed(
            self._spark,
            self._stream,
            tasks,
            region=self._region,
            endpoint_url=self._endpoint_url,
            decode=self._decode,
            interval_millis=self._interval_millis,
            max_records_per_get=self._max_per_get,
            use_adaptive_reads=self._adaptive,
            client_kwargs=self._client_kwargs,
        )
        raw.write.mode("overwrite").parquet(staging)
        staged = self._spark.read.parquet(staging)
        for m in staged.filter(F.col("is_meta")).collect():
            prev = positions[m["shard_id"]]
            positions[m["shard_id"]] = {
                # a shard with no new records reports its unchanged
                # starting position (None stays None)
                "after_seq": m["sequence_number"]
                if m["sequence_number"] is not None
                else prev["after_seq"],
                "retired": bool(m["retired"]),
            }
            if self._adaptive and m["next_limit"] is not None:
                # executor-side twin of the driver poll's limit carry:
                # the adapted Limit seeds this shard's next-poll fetches
                self._shard_limits[m["shard_id"]] = int(m["next_limit"])
        _atomic_write_json(
            os.path.join(self._offsets_dir, f"{batch_id}.json"),
            {"batch_id": batch_id, "shards": positions, "staged": True,
             "limits": dict(self._shard_limits)},
        )
        return batch_id, self._from_staging(staged)

    def _from_staging(self, staged: DataFrame) -> DataFrame:
        df = staged.filter(~F.col("is_meta")).drop("is_meta", "retired", "next_limit")
        if self._decode != "none":
            df = df.withColumn(
                "value", decode_payload(F.col("value"), codec=self._decode)
            )
        return df

    def _gc_staging(self, keep_from: int) -> None:
        """Remove staging dirs for batches older than ``keep_from`` —
        those are committed and their returned frames consumed (the
        poller's contract: a batch is processed before the next poll).
        The most recent batch's staging always survives so an
        uncommitted batch can replay."""
        if not os.path.isdir(self._staging_dir):
            return
        import shutil

        for name in os.listdir(self._staging_dir):
            if not name.startswith("batch="):
                continue
            try:
                bid = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if bid < keep_from:
                shutil.rmtree(os.path.join(self._staging_dir, name), ignore_errors=True)

    def _replay(self, batch_id: int, ids: list[int]) -> tuple[int, DataFrame]:
        """Re-deliver an uncommitted batch with its original membership:
        a STAGED batch (executor-parallel mode) re-reads its parquet
        staging byte-identically with no network; otherwise each shard
        replays (previous after_seq, recorded after_seq] from the
        stream."""
        offsets = self._read_offsets(batch_id)
        if offsets.get("staged"):
            return batch_id, self._from_staging(
                self._spark.read.parquet(self._staging_path(batch_id))
            )
        if offsets.get("staged") is False:  # parallel-mode empty batch
            return batch_id, self._to_df([])
        end = offsets["shards"]
        prev = (
            self._read_offsets(ids[ids.index(batch_id) - 1])["shards"]
            if ids.index(batch_id) > 0
            else {}
        )
        rows: list[tuple] = []
        for sid, pos in end.items():
            start_after = prev.get(sid, {}).get("after_seq")
            if pos["after_seq"] is None or pos["after_seq"] == start_after:
                continue  # no records for this shard in the batch
            shard_rows, _, _ = self._read_shard(
                sid, start_after, end_seq=pos["after_seq"]
            )
            rows += shard_rows
        return batch_id, self._to_df(rows)

    def _to_df(self, rows: list[tuple]) -> DataFrame:
        # partition count sized to the batch (~1000 rows/partition, the
        # driver-side poll is small by design): the default
        # parallelize() would cut a 500-row batch into 32 near-empty
        # partitions whose per-task overhead dominates every downstream
        # stage (measured 4.7 s -> sub-second for the 3-batch parse)
        n_parts = max(
            1,
            min(
                self._spark.sparkContext.defaultParallelism,
                (len(rows) + 999) // 1000,
            ),
        )
        rdd = self._spark.sparkContext.parallelize(rows, n_parts)
        df = self._spark.createDataFrame(rdd, SNAPSHOT_SCHEMA)
        if self._decode != "none":
            df = df.withColumn(
                "value", decode_payload(F.col("value"), codec=self._decode)
            )
        return df
