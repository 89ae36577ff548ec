"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exactness baseline. Dot products are pure
  Catalyst higher-order functions (zip_with + aggregate), JVM-side; ranking
  is the same Window top-k discipline as BM25 (desc score, asc id).
- LSH-bucketed variant (the scale path): random-hyperplane signatures with
  DETERMINISTIC seeded hyperplanes shipped as literal arrays, so the bucket
  assignment is reproducible and the oracle can compute identical buckets.
  Probing only the query's bucket makes cost ~n/2^bits per query; recall is
  traded for that factor (classic SimHash-LSH, Charikar 2002).

Reference analog: SimpleNNIndex / Annoy angular top-k
(/root/reference/src/prebuilt_index.py:5-42) — Annoy is also an approximate
angular index; the brute-force path is the reference's own correctness
oracle (models.py:128-133).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_PLANES = 4  # 16 buckets
EMB_DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def dot_col(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(x: Column, y: Column) -> Column:
    return dot_col(x, y) / (F.sqrt(dot_col(x, x)) * F.sqrt(dot_col(y, y)))


def hyperplanes(n_planes: int = N_PLANES, dim: int = EMB_DIM, seed: int = 42) -> list[list[float]]:
    """Deterministic seeded random hyperplanes (rounded so the SQL literal
    and the Spark literal are the same doubles)."""
    rng = np.random.default_rng([seed, 777])
    return [[round(float(v), 6) for v in rng.standard_normal(dim)] for _ in range(n_planes)]


def probe_masks(n_planes: int, radius: int) -> list[int]:
    """All bucket-id XOR masks within Hamming distance <= radius: the probe
    fan-out for multi-probe LSH (sum of C(n_planes, r) for r <= radius)."""
    from itertools import combinations

    masks = [0]
    for r in range(1, min(radius, n_planes) + 1):
        for bits in combinations(range(n_planes), r):
            masks.append(sum(2**b for b in bits))
    return masks


def bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit p set iff dot(vec, plane_p) > 0."""
    out = F.lit(0)
    for p, plane in enumerate(planes):
        d = dot_col(vec, F.array(*[F.lit(v) for v in plane]))
        out = out + F.when(d > 0, F.lit(2**p)).otherwise(F.lit(0))
    return out


def _query_vectors(spark: SparkSession, sf_dir: str, n_queries: int = 5) -> DataFrame:
    """Fixed query set: the first n embeddings by vec_id (deterministic)."""
    e = _emb(spark, sf_dir)
    return (
        e.orderBy("vec_id")
        .limit(n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )


def q_ann_brute_topk(spark: SparkSession, sf_dir: str, k: int = 5, n_queries: int = 5) -> DataFrame:
    """Exact cosine top-k per query vector (self-queries rank first with
    cosine=1 — kept, as the reference's Annoy index also returns the item
    itself)."""
    e = _emb(spark, sf_dir)
    q = _query_vectors(spark, sf_dir, n_queries)
    scored = q.crossJoin(e).select(
        "query_id",
        "vec_id",
        F.round(cosine_col(F.col("qvec"), F.col("embedding")) * 10000).cast("long").alias(
            "cosine_q"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_q"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cosine_q", "rnk")
    )


def q_ann_lsh_multiprobe(
    spark: SparkSession, sf_dir: str, k: int = 5, radius: int = 1, n_queries: int = 5
) -> DataFrame:
    """Multi-probe LSH top-k (the recall knob single-probe lacks): each query
    also probes every bucket within Hamming distance <= radius of its own —
    vectors on the wrong side of `radius` hyperplanes are still candidates
    (Lv et al., VLDB 2007). radius=1 probes 1 + n_planes of the 2^n_planes
    buckets, so cost is (1+P)/2^P of brute force while recovering most
    boundary misses. The probe fan-out is an explode on the TINY query side;
    the corpus is still hashed once and equi-joined."""
    planes = hyperplanes()
    n_planes = len(planes)
    probe_ids = probe_masks(n_planes, radius)  # self + <=radius-bit flips
    e = _emb(spark, sf_dir).withColumn("bucket", bucket_col(F.col("embedding"), planes))
    q = (
        _query_vectors(spark, sf_dir, n_queries)
        .withColumn("bucket0", bucket_col(F.col("qvec"), planes))
        .withColumn("mask", F.explode(F.array(*[F.lit(m) for m in probe_ids])))
        .withColumn("bucket", F.col("bucket0").bitwiseXOR(F.col("mask")))
    )
    scored = q.join(e, "bucket").select(
        "query_id",
        "vec_id",
        F.round(cosine_col(F.col("qvec"), F.col("embedding")) * 10000).cast("long").alias(
            "cosine_q"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_q"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cosine_q", "rnk")
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str, k: int = 5, n_queries: int = 5) -> DataFrame:
    """LSH-bucketed cosine top-k: both sides bucket by hyperplane sign bits;
    candidates = same-bucket vectors only (equi-join, prunes ~15/16 of the
    corpus at 4 planes), then exact cosine re-rank inside the bucket."""
    planes = hyperplanes()
    e = _emb(spark, sf_dir).withColumn("bucket", bucket_col(F.col("embedding"), planes))
    q = _query_vectors(spark, sf_dir, n_queries).withColumn("bucket", bucket_col(F.col("qvec"), planes))
    scored = q.join(e, "bucket").select(
        "query_id",
        "vec_id",
        F.round(cosine_col(F.col("qvec"), F.col("embedding")) * 10000).cast("long").alias(
            "cosine_q"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_q"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cosine_q", "rnk")
    )


def q_ann_lsh_multitable(
    spark: SparkSession, sf_dir: str, k: int = 5, n_tables: int = 4, n_queries: int = 5
) -> DataFrame:
    """Multi-TABLE LSH top-k: L independent seeded hyperplane tables,
    candidates = union over tables of same-bucket matches, exact cosine
    re-rank (the classic LSH structure; recall ≈ 1-(1-p^P)^L vs multi-probe's
    single-table fan-out). At 100 TB this is the preferred recall knob: the
    corpus is hashed L times ONCE at ingest (a map-side column per table,
    storable/partition-prunable), while multi-probe multiplies per-query
    bucket reads. Here each table is a bucket equi-join on its own seeded
    planes; probe-hit dedup aggregates the (query_id, vec_id, long) frame,
    never the vectors."""
    scored = None
    for t in range(n_tables):
        planes = hyperplanes(seed=42 + 1000 * t)
        e = _emb(spark, sf_dir).withColumn("bucket", bucket_col(F.col("embedding"), planes))
        q = _query_vectors(spark, sf_dir, n_queries).withColumn(
            "bucket", bucket_col(F.col("qvec"), planes)
        )
        s = q.join(e, "bucket").select(
            "query_id",
            "vec_id",
            F.round(cosine_col(F.col("qvec"), F.col("embedding")) * 10000)
            .cast("long")
            .alias("cosine_q"),
        )
        scored = s if scored is None else scored.unionByName(s)
    dedup = scored.groupBy("query_id", "vec_id").agg(F.max("cosine_q").alias("cosine_q"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_q"), F.asc("vec_id"))
    return (
        dedup.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cosine_q", "rnk")
    )


def q_ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    n_queries: int = 5,
) -> DataFrame:
    """IVF-flat cosine top-k (the other classic ANN scale path next to LSH):
    a small coarse-quantizer centroid set partitions the corpus into inverted
    lists; a query probes only its n_probe nearest lists and re-ranks exactly
    inside them — cost ≈ n_probe/n_centroids of brute force.

    Centroids are the first n_centroids vectors by vec_id — a deterministic
    stand-in for a k-means codebook (training is out of scope; the LIST
    structure and probe math are what distributes). Assignment is a
    broadcast cross-join + window argmax (centroids are tiny by design —
    ~2^10..2^18 rows even at 10^9 vectors, always broadcastable); ties break
    on ascending centroid id in both engines.
    """
    e = _emb(spark, sf_dir)
    cent = (
        e.orderBy("vec_id")
        .limit(n_centroids)
        .select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("centroid_id"))
    assign = (
        e.crossJoin(F.broadcast(cent))
        .withColumn(
            "csim", F.round(cosine_col(F.col("embedding"), F.col("cvec")) * 10000).cast("long")
        )
        .withColumn("arnk", F.row_number().over(w_assign))
        .filter(F.col("arnk") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )
    q = _query_vectors(spark, sf_dir, n_queries)
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("centroid_id"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn(
            "csim", F.round(cosine_col(F.col("qvec"), F.col("cvec")) * 10000).cast("long")
        )
        .withColumn("prnk", F.row_number().over(w_probe))
        .filter(F.col("prnk") <= n_probe)
        .select("query_id", "qvec", "centroid_id")
    )
    scored = probes.join(assign, "centroid_id").select(
        "query_id",
        "vec_id",
        F.round(cosine_col(F.col("qvec"), F.col("embedding")) * 10000)
        .cast("long")
        .alias("cosine_q"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_q"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cosine_q", "rnk")
    )
