"""Resumable index build: per-partition checkpoints + lineage/metrics tables.

The reference gets stage-level resumability from DVC content-addressed stage
files (/root/reference/dvc_pipelines.sh:3-21). The Spark engine checkpoints at
term-bucket granularity instead:

    _checkpoints(bucket_id, status, rows, sha, ts)
    _lineage(job_id, stage, rows_in, rows_out, wall_ms, files_per_sec, ts)

``build_resumable`` splits the bucket space into groups; each group is one
Spark job writing only its buckets' posting_blocks partitions (dynamic
partition overwrite), then atomically appends that group's checkpoint rows.
A re-run after a crash reads _checkpoints, skips done buckets, and rebuilds
only the remainder — the resume-equivalence test asserts the final index is
bit-identical to a clean build.

At 1000-executor scale the same structure holds: groups bound the blast
radius of a failure, and the checkpoint table is tiny (one row per bucket).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goldenretriever_spark.index import blocks
from goldenretriever_spark.index.build import InvertedIndex, build_index
from goldenretriever_spark.index.storage import write_index

STAGED_MARKER = -1  # checkpoint bucket_id for the "enriched postings staged" stage
CHECKPOINT_SCHEMA = "bucket_id int, status string, rows long, sha string, ts timestamp"
LINEAGE_SCHEMA = (
    "job_id string, stage string, rows_in long, rows_out long, wall_ms long, "
    "files_per_sec double, ts timestamp"
)


def _checkpoint_path(path: str) -> str:
    return os.path.join(path, "_checkpoints")


def _lineage_path(path: str) -> str:
    return os.path.join(path, "_lineage")


def done_buckets(spark: SparkSession, path: str) -> set[int]:
    cp = _checkpoint_path(path)
    try:
        rows = spark.read.parquet(cp).filter(F.col("status") == "done").collect()
    except Exception:
        return set()
    return {r["bucket_id"] for r in rows}


def _append_rows(spark: SparkSession, path: str, rows: list[tuple], schema: str) -> None:
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def log_lineage(
    spark: SparkSession,
    path: str,
    job_id: str,
    stage: str,
    rows_in: int,
    rows_out: int,
    wall_ms: int,
    files_per_sec: float,
) -> None:
    import datetime

    _append_rows(
        spark,
        _lineage_path(path),
        [(job_id, stage, rows_in, rows_out, wall_ms, files_per_sec,
          datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None))],
        LINEAGE_SCHEMA,
    )


def build_resumable(
    spark: SparkSession,
    documents: DataFrame,
    path: str,
    tokenizer: str = "simple",
    n_term_buckets: int = 64,
    n_groups: int = 4,
    block_size: int = 128,
    target_docs_per_group: int = 250_000,
    fail_after_group: int | None = None,
) -> InvertedIndex:
    """Build + persist the full index, checkpointed per term-bucket group.

    ``fail_after_group`` injects a crash after N groups (for the
    resume-equivalence test).
    Returns the logical index handle (also persisted at ``path``).
    """
    import datetime

    job_id = uuid.uuid4().hex[:12]
    t0 = time.time()
    n_files = documents.count()

    done = done_buckets(spark, path)
    staging = os.path.join(path, "_staging_enriched")
    index = build_index(documents, tokenizer)

    if STAGED_MARKER not in done:
        # one pass over the corpus: stats tables + staged enriched postings.
        # Tokenization happens exactly once; resumes never redo it.
        write_index(index, path, blocks=None, n_term_buckets=n_term_buckets)
        enriched = blocks.enriched_postings(
            index, target_docs_per_group=target_docs_per_group, n_term_buckets=n_term_buckets
        )
        enriched.write.mode("overwrite").partitionBy("term_bucket").parquet(staging)
        now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        _append_rows(
            spark, _checkpoint_path(path),
            [(STAGED_MARKER, "done", n_files, job_id, now)], CHECKPOINT_SCHEMA,
        )
        log_lineage(
            spark, path, job_id, "stage_enriched", n_files, n_files,
            int((time.time() - t0) * 1000), n_files / max(time.time() - t0, 1e-9),
        )
        done = done_buckets(spark, path)

    avgdl = float(spark.read.parquet(os.path.join(path, "corpus_stats")).collect()[0]["avgdl"])
    staged = spark.read.parquet(staging)

    todo = [b for b in range(n_term_buckets) if b not in done]
    groups = [todo[i::n_groups] for i in range(n_groups)]
    groups = [g for g in groups if g]

    out_path = os.path.join(path, "posting_blocks")
    for gi, group in enumerate(groups):
        tg = time.time()
        # partition-pruned read of just this group's buckets, then pack
        part = blocks.pack_enriched(
            staged.filter(F.col("term_bucket").isin(group)), avgdl, block_size,
            n_term_buckets=n_term_buckets,
        )
        # dynamic overwrite scoped to THIS writer (not the shared session
        # conf): only this group's term_bucket partitions are replaced, and
        # later full overwrites elsewhere in the session keep static mode
        part.repartition("term_bucket").write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("term_bucket").parquet(out_path)
        n_rows = spark.read.parquet(out_path).filter(
            F.col("term_bucket").isin(group)
        ).count()
        now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        _append_rows(
            spark,
            _checkpoint_path(path),
            [(b, "done", n_rows, job_id, now) for b in group],
            CHECKPOINT_SCHEMA,
        )
        log_lineage(
            spark, path, job_id, f"pack_group_{gi}", n_files, n_rows,
            int((time.time() - tg) * 1000), 0.0,
        )
        if fail_after_group is not None and gi + 1 >= fail_after_group:
            raise RuntimeError(f"injected failure after group {gi}")

    wall = time.time() - t0
    log_lineage(
        spark, path, job_id, "build_total", n_files, n_files,
        int(wall * 1000), n_files / max(wall, 1e-9),
    )
    return index
