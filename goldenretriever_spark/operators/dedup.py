"""Deduplication operators for training-data pipelines (first-class, per the
build brief): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Design for 100 TB:
- exact dedup is one hash-shuffle on the content digest (map-side partial agg)
- candidate generation never goes O(n^2): MinHash bands / LSH buckets /
  shingle-inverted-index joins produce candidate pairs; only candidates are
  verified
- all hashing is md5-based (lexicographic min over salted shingle digests) so
  every stage is portable column SQL — the DuckDB oracle computes identical
  signatures, making even the LSH pipelines value-hash checkable

Reference analogs: dedupe-before-encode (index_encode.py:15, eval.py:83) is
exact dedup; the rest generalize it to near-duplicate detection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_MINHASH_BANDS = 8
SHINGLE_K = 3


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _toks(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def _shingles(text: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-token shingles as strings."""
    toks = _toks(text)
    n = F.size(toks)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: md5(text) -> canonical doc (min doc_id) + group
    size, keeping only real duplicate groups. The driver corpus has no exact
    dups, so the query first injects deterministic duplicates (every 10th doc
    re-appended under doc_id+100000) — the dedup then provably finds exactly
    those."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    dups = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = d.union(dups)
    return (
        corpus.groupBy(F.md5("text").alias("digest"))
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature matrix: per band b, sig_b = min over shingles of
    md5(b || shingle). Salting the digest with the band id gives independent
    permutations; lexicographic min over hex digests is a valid min-hash."""
    d = _docs(spark, sf_dir)
    # explode + aggregate (NOT N array_min(transform(...)) columns: embedding
    # the shingle expression tree once per band makes Catalyst codegen blow
    # up; the agg form is also the shape that scales — one shuffle keyed on
    # doc_id with partial min aggregation)
    ex = d.select("doc_id", F.explode(_shingles(F.col("text"))).alias("shingle"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{b}|"), F.col("shingle")))).alias(f"sig{b}")
        for b in range(N_MINHASH_BANDS)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing any band signature.
    shingle -> minhash -> band -> bucket-join (SURVEY training-data ops).

    The bucket join is an equi-join on (band, signature) — at scale the
    signature table shuffles once and hot buckets (boilerplate docs) are the
    skew case, handled by AQE skew-join plus an optional bucket-size cap.
    """
    sigs = q_minhash_signatures(spark, sf_dir)
    long = sigs.selectExpr(
        "doc_id",
        "stack({n}, {args}) as (band, sig)".format(
            n=N_MINHASH_BANDS,
            args=", ".join(f"{b}, sig{b}" for b in range(N_MINHASH_BANDS)),
        ),
    )
    a = long.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = long.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str, threshold: float = 0.2) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via a shingle inverted index:
    explode distinct shingles -> self-join on shingle (candidate generation)
    -> count common -> |J| = common / (|A|+|B|-common) >= threshold.

    Never materializes non-overlapping pairs — the join only produces pairs
    sharing >=1 shingle (this is the scalable pattern; the O(n^2) loop is
    what it replaces)."""
    d = _docs(spark, sf_dir).select("doc_id", _shingles(F.col("text")).alias("sh"))
    sized = d.select("doc_id", "sh", F.size("sh").alias("n_sh"))
    ex = sized.select("doc_id", "n_sh", F.explode("sh").alias("shingle"))
    a = ex.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"), "shingle")
    b = ex.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jacc = common.withColumn(
        "jaccard_q",
        F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")) * 10000).cast(
            "long"
        ),
    )
    return jacc.filter(F.col("jaccard_q") >= int(threshold * 10000)).select(
        "doc_a", "doc_b", "common", "jaccard_q"
    )


def _hex4_to_int(hexpr: Column) -> Column:
    """Portable hex-nibble parse (conv() exists in Spark but not DuckDB; this
    strpos form is generated identically for the oracle SQL)."""
    alphabet = "0123456789abcdef"
    out = F.lit(0)
    for i in range(4):
        out = out * 16 + (F.instr(F.lit(alphabet), F.substring(hexpr, i + 1, 1)) - 1)
    return out


def q_simhash(spark: SparkSession, sf_dir: str, bits: int = 16) -> DataFrame:
    """SimHash document signatures (bits from md5-derived 16-bit token
    hashes, weighted by token tf). Near-dups differ in few bits; pairs within
    Hamming distance r are found by pigeonhole band-joins at scale.

    Pure column arithmetic (portable to the oracle): token hash h(t) = int of
    md5(t)[1:4]; bit_k(v) = floor(v / 2^k) % 2; simhash bit k set iff
    sum_t tf * (2*bit_k - 1) > 0.
    """
    d = _docs(spark, sf_dir)
    tok = d.select("doc_id", F.explode(_toks(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    h = tf.withColumn("h16", _hex4_to_int(F.substring(F.md5("term"), 1, 4)).cast("int"))
    # bit k via shiftright (NOT double-divide + cast: Spark truncates casts,
    # DuckDB rounds them — >> is portable)
    acc = [
        F.sum(F.col("tf") * (2 * (F.shiftright(F.col("h16"), k) % 2) - 1)).alias(f"s{k}")
        for k in range(bits)
    ]
    sums = h.groupBy("doc_id").agg(*acc)
    sim = sums.select(
        "doc_id",
        sum(
            (F.when(F.col(f"s{k}") > 0, F.lit(2**k)).otherwise(F.lit(0)) for k in range(bits)),
            F.lit(0),
        ).cast("long").alias("simhash"),
    )
    return sim


def q_embedding_neardup_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label (the blocking
    key stands in for an LSH bucket — candidate pairs only form within a
    block, never across the full corpus)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda x: F.sqrt(dot(x, x))  # noqa: E731
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "label")
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "label")
    pairs = a.join(b, "label").filter(F.col("id_a") < F.col("id_b"))
    cos = pairs.select(
        "id_a",
        "id_b",
        F.round(dot(F.col("va"), F.col("vb")) / (norm(F.col("va")) * norm(F.col("vb"))) * 10000)
        .cast("long")
        .alias("cosine_q"),
    )
    return cos.filter(F.col("cosine_q") >= int(threshold * 10000))
