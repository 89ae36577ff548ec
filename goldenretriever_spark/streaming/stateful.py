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
STATE_SCHEMA = "seen boolean"


def _dedupe_group(key, pdf_iter, state) -> "pd.DataFrame":
    """Emit the first-ever row for this digest (deterministically the min
    (repo, path, commit) within the first batch that carries it); afterwards
    the state short-circuits every later occurrence, batch or restart."""
    if state.exists:
        # digest already emitted in an earlier batch — drain and drop
        for _ in pdf_iter:
            pass
        yield pd.DataFrame(columns=[f.split()[0] for f in OUT_SCHEMA.split(", ")])
        return
    first = None
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        cand = pdf.sort_values(["repo", "path", "commit"]).iloc[:1]
        if first is None or tuple(cand.iloc[0][["repo", "path", "commit"]]) < tuple(
            first.iloc[0][["repo", "path", "commit"]]
        ):
            first = cand
    state.update((True,))
    yield first if first is not None else pd.DataFrame(
        columns=[f.split()[0] for f in OUT_SCHEMA.split(", ")]
    )


def streaming_dedupe(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema: str | None = None,
) -> None:
    """Drain available files, emitting each distinct content digest once
    across ALL batches and restarts (state checkpointed under out_dir)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(schema or DOCS_SCHEMA).parquet(input_dir)
    docs = stream.withColumn("digest", F.sha2(F.col("content"), 256))
    deduped = docs.groupBy("digest").applyInPandasWithState(
        _dedupe_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    (
        deduped.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "deduped"))
        .option("checkpointLocation", os.path.join(out_dir, "_state_checkpoint"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def deduped_view(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "deduped"))
