"""Dedup-family scale artifact (VERDICT r6 #5): the LLM-pipeline headliner
(MinHash-LSH candidates -> verified near-dup pairs -> connected components ->
keep-canonical anti-join, `operators/dedup.py:108,139,430,552`) measured at
>= 1M docs with a planted near-duplicate rate.

Corpus: `corpus.synth_corpus(n)` (the same deterministic generator as every
other scale artifact) + a planted twin for every 10th doc (one token
appended — near-identical shingle sets, Jaccard ~0.97; the planted rate is
the ground truth the recall numbers are checked against).

Pipeline shape (the scale lesson this artifact exists to record):

1. MinHash-LSH banding (the graded q_minhash_lsh_pairs shape) generates
   CANDIDATES. With 8 bands x 1 row/band, per-band collision prob = J, so on
   a corpus with real background similarity the candidate count explodes
   superlinearly — the bucket census quantifies it, and the full pair set is
   only materialized when the census-derived exact pair count is affordable
   (<= --max-pairs). This is the "candidates are not duplicates" lesson.
2. VERIFY: exact Jaccard >= --threshold over a df-capped shingle inverted
   index (the graded q_ngram_jaccard_pairs shape, cap --verify-cap). The cap
   drops non-discriminative shingles; J is computed over the SURVIVING
   shingle sets, so near-identical docs keep J ~= 1 while background pairs
   (which share only hot shingles) produce no join row at all. Probed at
   55k docs: cap=50, tau=0.8 returned exactly the 5,000 planted twins —
   100% recall, zero background false positives.
3. Connected components (star variant — BENCH/CC_SKEW.json's winner) over
   the VERIFIED pairs only.
4. Keep-canonical anti-join (keep min doc_id per component).

Per stage: wall seconds, output row counts, stage-level shuffle write
records (Spark UI REST totals diffed around the stage, same instrument as
BENCH/CC_SKEW.json), the hot-bucket cap's hit counts, and planted-twin
recall at the candidate, verified-pair, and component levels.

Writes BENCH/DEDUP_SCALE.json.

Usage: python tools/dedup_scale.py [n_docs] [--cap C] [--verify-cap V]
                                   [--threshold T] [--max-pairs M]
       (defaults 1000000, 1000, 50, 0.8, 200e6)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TWIN_OFFSET = 100_000_000
PLANT_EVERY = 10


def shuffle_records(ui_base: str) -> int:
    try:
        apps = json.load(urllib.request.urlopen(f"{ui_base}/api/v1/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{ui_base}/api/v1/applications/{app_id}/stages?status=complete", timeout=10
            )
        )
        return sum(s.get("shuffleWriteRecords", 0) for s in stages)
    except Exception:
        return -1


def _opt(flag: str, default):
    for i, a in enumerate(sys.argv):
        if a.startswith(flag):
            v = a.split("=", 1)[1] if "=" in a else sys.argv[i + 1]
            return type(default)(v)
    return default


def main() -> None:
    from pyspark.sql import functions as F

    from goldenretriever_spark import corpus
    from goldenretriever_spark.operators.dedup import (
        MAX_BUCKET_SIZE,
        N_MINHASH_BANDS,
        _drop_hot_buckets,
        _shingles,
        connected_components_star,
    )
    from goldenretriever_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if args else 1_000_000
    cap = _opt("--cap", MAX_BUCKET_SIZE)
    verify_cap = _opt("--verify-cap", 50)
    threshold = _opt("--threshold", 0.8)
    max_pairs = int(_opt("--max-pairs", 200e6))

    spark = get_spark(
        "gr-dedup-scale", cores=32, shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui_base = spark.sparkContext.uiWebUrl or "http://localhost:4040"
    sc = spark.sparkContext

    stages: dict[str, dict] = {}

    def timed(name, fn):
        sc.setJobDescription(f"dedup_scale:{name}")
        s0 = shuffle_records(ui_base)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        s1 = shuffle_records(ui_base)
        stages[name] = {
            "wall_sec": round(dt, 2),
            "shuffle_write_records": (s1 - s0) if s0 >= 0 and s1 >= 0 else None,
        }
        return out

    # ---- stage 0: corpus + planted twins ----
    cache = f"/tmp/gr_dedup_corpus_{n_docs}.parquet"

    def build_corpus():
        if not os.path.exists(os.path.join(cache, "_SUCCESS")):
            base = corpus.synth_corpus(spark, n_docs, seed=42, partitions=256).select(
                F.regexp_extract("path", r"mod(\d+)\.", 1).cast("long").alias("doc_id"),
                F.col("content").alias("text"),
            )
            twins = base.filter(F.col("doc_id") % PLANT_EVERY == 0).select(
                (F.col("doc_id") + TWIN_OFFSET).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" planted_twin_marker")).alias("text"),
            )
            base.unionByName(twins).write.mode("overwrite").parquet(cache)
        df = spark.read.parquet(cache)
        return df, df.count()

    docs, n_total = timed("corpus_gen", build_corpus)
    n_planted = n_docs // PLANT_EVERY

    # ---- stage 1: MinHash-LSH banding + bucket census (graded
    # q_minhash_lsh_pairs shape) ----
    ex0 = docs.select("doc_id", F.explode(_shingles(F.col("text"))).alias("shingle"))
    sig_aggs = [
        F.min(F.md5(F.concat(F.lit(f"{b}|"), F.col("shingle")))).alias(f"sig{b}")
        for b in range(N_MINHASH_BANDS)
    ]
    sigs = ex0.groupBy("doc_id").agg(*sig_aggs)
    long = sigs.selectExpr(
        "doc_id",
        "stack({n}, {args}) as (band, sig)".format(
            n=N_MINHASH_BANDS,
            args=", ".join(f"{b}, sig{b}" for b in range(N_MINHASH_BANDS)),
        ),
    )
    long = long.localCheckpoint()

    def bucket_census():
        row = (
            long.groupBy("band", "sig")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.count(F.lit(1)).alias("n_buckets"),
                F.max("n").alias("max_bucket"),
                F.sum(F.when(F.col("n") > cap, 1).otherwise(0)).alias("hot_buckets"),
                F.sum(F.when(F.col("n") > cap, F.col("n")).otherwise(0)).alias("hot_rows"),
                # exact candidate-pair count the capped self-join would emit
                # (before pair-level distinct), sum C(b,2) over kept buckets
                F.sum(
                    F.when(F.col("n") <= cap, F.col("n") * (F.col("n") - 1) / 2).otherwise(0)
                )
                .cast("long")
                .alias("capped_pair_rows"),
            )
            .collect()[0]
        )
        return row.asDict()

    census = timed("lsh_bucket_census", bucket_census)

    # candidate-level twin recall: twin + source share >= 1 surviving bucket
    capped = _drop_hot_buckets(long, ["band", "sig"], cap)

    def lsh_twin_recall():
        t = capped.filter(F.col("doc_id") >= TWIN_OFFSET).select(
            (F.col("doc_id") - TWIN_OFFSET).alias("src"), "band", "sig"
        )
        s = capped.filter(F.col("doc_id") < TWIN_OFFSET).select(
            F.col("doc_id").alias("src"), "band", "sig"
        )
        return t.join(s, ["src", "band", "sig"]).select("src").distinct().count()

    twin_cand = timed("lsh_twin_recall", lsh_twin_recall)

    # full candidate pair set only when affordable (the census says exactly
    # how many self-join rows the capped buckets yield)
    n_pairs = None
    if census["capped_pair_rows"] <= max_pairs:

        def pair_stage():
            a = capped.select(F.col("doc_id").alias("doc_a"), "band", "sig")
            b = capped.select(F.col("doc_id").alias("doc_b"), "band", "sig")
            p = (
                a.join(b, ["band", "sig"])
                .filter(F.col("doc_a") < F.col("doc_b"))
                .select("doc_a", "doc_b")
                .distinct()
            )
            return p.count()

        n_pairs = timed("lsh_pairs_distinct", pair_stage)
    else:
        stages["lsh_pairs_distinct"] = {
            "skipped": True,
            "reason": (
                f"census-exact capped self-join rows {census['capped_pair_rows']:,} "
                f"> --max-pairs {max_pairs:,}; candidates at this scale are "
                "consumed via the verify stage, never materialized distinct"
            ),
        }

    # ---- stage 2: VERIFY — exact Jaccard over df-capped shingle index ----
    tau_q = int(threshold * 10000)

    def verify():
        ex = _drop_hot_buckets(ex0, ["shingle"], verify_cap)
        sized = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        exj = ex.join(sized, "doc_id")
        a = exj.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"), "shingle")
        b = exj.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"), "shingle")
        common = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b", "na", "nb")
            .agg(F.count(F.lit(1)).alias("common"))
        )
        ver = (
            common.withColumn(
                "jq",
                F.round(
                    F.col("common") / (F.col("na") + F.col("nb") - F.col("common")) * 10000
                ).cast("long"),
            )
            .filter(F.col("jq") >= tau_q)
            .select("doc_a", "doc_b")
            .localCheckpoint()
        )
        return ver, ver.count()

    verified, n_verified = timed("verify_jaccard", verify)

    def verified_twin_recall():
        return verified.filter(
            (F.col("doc_b") - F.col("doc_a") == TWIN_OFFSET)
            & (F.col("doc_a") % PLANT_EVERY == 0)
        ).count()

    twin_ver = timed("verified_twin_recall", verified_twin_recall)

    # ---- stage 3: connected components (star) over verified pairs ----
    def components():
        c = connected_components_star(verified).localCheckpoint()
        return c, c.count()

    comp, n_comp_rows = timed("components_star", components)
    n_components = comp.select("component").distinct().count()

    def comp_recall():
        t = comp.filter(F.col("id") >= TWIN_OFFSET).select(
            (F.col("id") - TWIN_OFFSET).alias("src"), "component"
        )
        s = comp.select(F.col("id").alias("src"), "component")
        return t.join(s, ["src", "component"]).count()

    twin_comp = timed("component_twin_recall", comp_recall)

    # ---- stage 4: keep-canonical anti-join ----
    def keep_canonical():
        losers = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        )
        kept = docs.join(losers, "doc_id", "left_anti").select("doc_id")
        return kept.count()

    n_kept = timed("keep_canonical", keep_canonical)

    out = {
        "metric": "gr_spark_dedup_scale",
        "unit": "sec",
        "n_docs_base": n_docs,
        "n_planted_twins": n_planted,
        "planted_rate": round(n_planted / n_docs, 3),
        "n_docs_total": n_total,
        "lsh_bands": N_MINHASH_BANDS,
        "hot_bucket_cap": cap,
        "lsh_bucket_census": census,
        "n_lsh_candidate_pairs_distinct": n_pairs,
        "lsh_twin_recall": round(twin_cand / n_planted, 4),
        "verify_shingle_df_cap": verify_cap,
        "verify_threshold": threshold,
        "n_verified_pairs": n_verified,
        "verified_twin_recall": round(twin_ver / n_planted, 4),
        "verified_background_pairs": n_verified - twin_ver,
        "n_component_rows": n_comp_rows,
        "n_components": n_components,
        "component_twin_recall": round(twin_comp / n_planted, 4),
        "n_docs_kept": n_kept,
        "n_docs_dropped": n_total - n_kept,
        "stages": stages,
        "loadavg": open("/proc/loadavg").read().split()[:3],
        "note": (
            "Candidates (8x1-row MinHash banding) are recall-oriented by "
            "construction (per-band collision prob = J) and explode on a "
            "corpus with background similarity — the census records the "
            "exact capped self-join row count whether or not the distinct "
            "pair set was affordable to materialize. The verify stage "
            "(df-capped shingle inverted index, exact Jaccard over the "
            "surviving shingle sets) is what feeds components: hot shingles "
            "are non-discriminative, so background pairs produce no join "
            "row while one-token-edit twins keep J~=1. "
            "shuffle_write_records are UI REST stage totals diffed around "
            "each stage."
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "DEDUP_SCALE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
