"""spark-submit entry point: checkpointed index build over a corpus table.

Usage (via tools/submit_build.sh):
    spark-submit --py-files goldenretriever_spark.zip \
        tools/submit_build_main.py <corpus_parquet> <out_index_dir>
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    corpus_path, out_dir = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("gr-index-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from goldenretriever_spark.index.checkpoint import build_resumable

    docs = spark.read.parquet(corpus_path)
    build_resumable(spark, docs, out_dir, tokenizer="simple", n_term_buckets=64, n_groups=4)
    print(f"index built at {out_dir}")


if __name__ == "__main__":
    main()
