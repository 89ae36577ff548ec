"""Deterministic train/test split (SURVEY U4).

Reference: finetune/main.py:109-110 splits each kb's QA pairs with
sklearn ``train_test_split(test_size=0.4, random_state=100)`` — a seeded
random 40/60 partition. A distributed engine can't replay sklearn's RNG, so
the engine-native equivalent is a seeded HASH split (SURVEY's prescription):

    bucket(row) = int(md5(key || '|' || seed)[:4 hex]) % denom
    test        = bucket < test_num        (test_num/denom = test_size)

Properties the reference split has that this keeps: deterministic under the
seed, stable under re-runs, per-row independent (any subset splits the same
way), exact expected proportions. Properties gained: no driver-side
materialization (sklearn needs the whole array in memory), no shuffle at all
— the split is a map-side column expression, so it works unchanged on 10^12
rows and is exactly expressible in the DuckDB oracle (md5 is portable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from goldenretriever_spark.operators.dedup import _hex4_to_int

DEFAULT_SEED = 100  # the reference's random_state (finetune/main.py:110)


def split_bucket_col(key: Column, seed: int = DEFAULT_SEED, denom: int = 5) -> Column:
    """Seeded hash bucket in [0, denom) from a key column."""
    digest = F.md5(F.concat(key.cast("string"), F.lit(f"|{seed}")))
    return (_hex4_to_int(F.substring(digest, 1, 4)) % denom).cast("int")


def train_test_split(
    df: DataFrame,
    key_col: str,
    test_size: float = 0.4,
    seed: int = DEFAULT_SEED,
    denom: int = 5,
) -> DataFrame:
    """Add a ``split`` column ('train' | 'test') — test fraction = test_size
    (quantized to 1/denom). Pure map-side projection; no shuffle."""
    test_num = round(test_size * denom)
    bucket = split_bucket_col(F.col(key_col), seed, denom)
    return df.withColumn(
        "split", F.when(bucket < test_num, F.lit("test")).otherwise(F.lit("train"))
    )


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract query: 40/60 split of the documents corpus keyed on doc_id,
    with the bucket exposed so the oracle checks the hash itself, not just
    the label."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = train_test_split(d.select("doc_id"), "doc_id")
    return out.select(
        "doc_id",
        split_bucket_col(F.col("doc_id")).cast("long").alias("bucket"),
        "split",
    )
