"""Serving-side sinks: query log (append) and feedback (update-by-key).

Reference:
- log_request appends a querylog row per query with uuid + timestamp
  (/root/reference/app/api/qa_service_es.py:47-59, S10)
- upload_feedback finds the querylog row by query_id and updates is_correct
  (padded to length 5) + feedback_timestamp
  (/root/reference/app/api/feedback_service_es.py:23-43, S11)

On an append-only Parquet warehouse the update becomes append + latest-wins
view (row_number over feedback_timestamp desc); with Iceberg the same call
site is a MERGE INTO — isolated here so a real catalog flips one branch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERYLOG_SCHEMA = (
    "query_id string, query_text string, responses array<string>, "
    "is_correct array<boolean>, created_at timestamp, feedback_timestamp timestamp"
)


def log_queries(spark: SparkSession, path: str, rows: DataFrame) -> None:
    """Append query-log rows: adds uuid query_id + created_at if missing."""
    out = rows
    if "query_id" not in rows.columns:
        out = out.withColumn("query_id", F.expr("uuid()"))
    out = out.withColumn("created_at", F.current_timestamp())
    for c, t in (("is_correct", "array<boolean>"), ("feedback_timestamp", "timestamp")):
        if c not in out.columns:
            out = out.withColumn(c, F.lit(None).cast(t))
    out.select(
        "query_id", "query_text", "responses", "is_correct", "created_at", "feedback_timestamp"
    ).write.mode("append").parquet(os.path.join(path, "querylog"))


def pad_is_correct(col, n: int = 5):
    """Pad the feedback boolean list to length n with False
    (feedback_service_es.py:29)."""
    pad = F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(n) - F.size(col), F.lit(0))),
        lambda _: F.lit(False),
    )
    return F.slice(F.concat(col, pad), 1, n)


def upload_feedback(spark: SparkSession, path: str, feedback: DataFrame) -> None:
    """Append feedback rows keyed by query_id: (query_id,
    is_correct:array<boolean>) -> padded + stamped."""
    ts = (
        F.col("feedback_timestamp")
        if "feedback_timestamp" in feedback.columns
        else F.current_timestamp()
    )
    out = feedback.select(
        "query_id",
        pad_is_correct(F.col("is_correct")).alias("is_correct"),
        ts.alias("feedback_timestamp"),
    )
    out.write.mode("append").parquet(os.path.join(path, "feedback"))


def querylog_view(spark: SparkSession, path: str) -> DataFrame:
    """Latest-wins merged view: each querylog row joined with its most recent
    feedback (the Iceberg MERGE equivalent on plain Parquet)."""
    ql = spark.read.parquet(os.path.join(path, "querylog"))
    try:
        fb = spark.read.parquet(os.path.join(path, "feedback"))
    except Exception:
        return ql
    w = Window.partitionBy("query_id").orderBy(F.desc("feedback_timestamp"))
    latest = (
        fb.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("is_correct").alias("fb_is_correct"),
            F.col("feedback_timestamp").alias("fb_ts"),
        )
    )
    return (
        ql.join(latest, "query_id", "left")
        .withColumn("is_correct", F.coalesce("fb_is_correct", "is_correct"))
        .withColumn("feedback_timestamp", F.coalesce("fb_ts", "feedback_timestamp"))
        .drop("fb_is_correct", "fb_ts")
    )


def export_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Table -> CSV export (SURVEY S7; reference index_extract.py:9-30 pulls
    an ES index into pandas and .to_csv's it). Distributed writer with a
    header per part-file; ``single_file`` coalesces first — only for small
    exports (the reference's use case), a 100 TB table stays multi-part."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)
