"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.9/§2.10 — the arbitrary-state API the brief names for operators
the built-in streaming aggregations can't express).

``streaming_dedupe``: cross-batch exact deduplication WITHOUT a side store.
Per content-digest GroupState remembers whether a digest has already been
emitted; only the first occurrence ever passes through. This complements
``incremental.py``'s store-anti-join pattern: here the "seen" set lives in
the streaming state store (RocksDB/HDFS-backed at scale), co-partitioned by
key with the shuffle the groupBy already performs — no read-back join
against the warehouse, no growing broadcast. At 100 TB the state is
sharded across executors by digest and survives restarts through the
checkpoint, which is exactly the semantics a continuous ingest dedupe needs
(the batch dedup operators in operators/dedup.py answer the same question
retrospectively; this answers it in flight).

Retention: exact forever-dedupe needs the full seen-set (``ttl_ms=None``),
but a continuous 100 TB ingest typically wants BOUNDED state — "suppress
re-occurrences seen within the last T". ``ttl_ms`` stores a per-digest
expiry (processing time) and checks it on the data path: a digest
re-arriving after its TTL re-emits; within it, it is suppressed and the TTL
refreshed (sliding retention). State EVICTION of idle digests needs
per-key ProcessingTimeTimeout timers, which are incompatible with
``availableNow`` drains — measured on this Spark: a stateful query whose
timeoutConf is ProcessingTimeTimeout never terminates under
Trigger.AvailableNow (MultiBatchExecutor keeps scheduling no-data batches
indefinitely, even with zero state rows left). So eviction is a separate
CONTINUOUS mode (``continuous=True`` + processingTime trigger, the shape a
real always-on ingest runs anyway): timers fire for idle expired digests
and remove their state rows, bounding the store.

Reference analog: dedupe-before-encode (index_encode.py:15) applied to an
unbounded stream instead of a frame.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "repo string, path string, commit string, lang string, content string"
OUT_SCHEMA = DOCS_SCHEMA + ", digest string"
# expires_at: epoch millis after which the digest may re-emit; -1 = never
STATE_SCHEMA = "expires_at long"

_OUT_COLS = [f.split()[0] for f in OUT_SCHEMA.split(", ")]


def _make_dedupe_group(ttl_ms: int | None, arm_timers: bool = False):
    """Build the per-digest group function. With a TTL, state carries the
    digest's expiry (processing time); without, a -1 sentinel (seen forever).
    ``arm_timers`` additionally registers a per-key ProcessingTimeTimeout so
    idle expired digests are EVICTED (continuous mode only — see module
    docstring for why timers cannot run under availableNow).

    Clock caveat (ADVICE r4): "now" is the EXECUTOR's wall clock
    (``time.time()`` inside the group fn), so TTL expiry is processing-time
    semantics as seen by whichever executor drains the group — clock skew
    between executors (or between micro-batches of one drain) can shift
    re-emission near the TTL boundary by the skew amount. That is the
    standard contract for processing-time state TTL (Spark's own
    ProcessingTimeTimeout uses the batch-start clock); if exactness at the
    boundary matters, derive expiry from an event-time watermark column
    instead (the windowed module shows the watermark pattern)."""

    def fn(key, pdf_iter, state):
        import time

        empty = pd.DataFrame(columns=_OUT_COLS)
        if state.hasTimedOut:
            # idle digest past its TTL: evict — the state-size bound
            state.remove()
            yield empty
            return
        now_ms = int(time.time() * 1000)
        if state.exists:
            (expires_at,) = state.get
            if expires_at < 0 or now_ms <= expires_at:
                # within retention — drop every occurrence, refresh the TTL
                for _ in pdf_iter:
                    pass
                if ttl_ms is not None:
                    state.update((now_ms + ttl_ms,))
                    if arm_timers:
                        state.setTimeoutDuration(ttl_ms)
                yield empty
                return
            # expired but not yet evicted (data arrived before any timer):
            # fall through and treat as first-seen again
        first = None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(["repo", "path", "commit"]).iloc[:1]
            if first is None or tuple(
                cand.iloc[0][["repo", "path", "commit"]]
            ) < tuple(first.iloc[0][["repo", "path", "commit"]]):
                first = cand
        state.update((-1 if ttl_ms is None else now_ms + ttl_ms,))
        if arm_timers and ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield first if first is not None else empty

    return fn


def _dedupe_writer(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema: str | None,
    ttl_ms: int | None,
    arm_timers: bool,
):
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(schema or DOCS_SCHEMA).parquet(input_dir)
    docs = stream.withColumn("digest", F.sha2(F.col("content"), 256))
    deduped = docs.groupBy("digest").applyInPandasWithState(
        _make_dedupe_group(ttl_ms, arm_timers=arm_timers),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if arm_timers
            else GroupStateTimeout.NoTimeout
        ),
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "deduped"))
        .option("checkpointLocation", os.path.join(out_dir, "_state_checkpoint"))
    )


def streaming_dedupe(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema: str | None = None,
    ttl_ms: int | None = None,
) -> None:
    """Drain available files, emitting each distinct content digest once
    across ALL batches and restarts (state checkpointed under out_dir).

    ``ttl_ms=None`` (default): exact forever-dedupe, unbounded seen-set.
    ``ttl_ms=T``: bounded retention — a digest re-emits once its last
    occurrence is more than T processing-time millis old (sliding). Idle
    state is NOT evicted in drain mode (availableNow cannot run per-key
    timers — measured non-termination, module docstring); use
    ``streaming_dedupe_continuous`` for timer-based eviction."""
    _dedupe_writer(spark, input_dir, out_dir, schema, ttl_ms, arm_timers=False) \
        .trigger(availableNow=True).start().awaitTermination()


def streaming_dedupe_continuous(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema: str | None = None,
    ttl_ms: int | None = None,
    processing_time: str = "1 second",
):
    """Always-on variant (processingTime trigger): same dedupe semantics,
    plus per-key ProcessingTimeTimeout timers that EVICT idle expired
    digests from the state store — the state-size bound a continuous 100 TB
    ingest needs. Returns the running StreamingQuery; the caller owns its
    lifecycle (monitor lastProgress stateOperators numRowsTotal, stop())."""
    arm = ttl_ms is not None
    return (
        _dedupe_writer(spark, input_dir, out_dir, schema, ttl_ms, arm_timers=arm)
        .trigger(processingTime=processing_time)
        .start()
    )


def deduped_view(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "deduped"))
