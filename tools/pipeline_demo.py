"""End-to-end training-data pipeline demo (VERDICT r6 #8): the LLM-pipeline
operators composed once, at >= 1M docs, per-stage wall time and row counts —
the "100 TB pipeline" story told end to end instead of per-operator.

    raw corpus (+10% planted near-dup twins)
      -> quality-filter gate (Gopher structural rules)
      -> exact dedup (digest keep-min)
      -> near-dup keep-canonical (MinHash-LSH pairs -> star-CC -> anti-join)
      -> BM25 index build + compressed block pack + persist
      -> serve: auto-dispatch top-k / boolean / filtered top-k

The corpus is the same deterministic generator + planted-twin recipe as
tools/dedup_scale.py (shared cache). The hybrid vector leg is not re-run
here — both hybrid legs have their own 3.84M-doc artifact
(BENCH/HYBRID_SCALE.json); this demo serves the three lexical paths the
r6 verdict asked to see composed (#3/#5 integration check).

Gate note: of the four Gopher rules in q_quality_filter, the stopword rule
is an English-corpus rule (QF_STOPWORDS = the/a/and/of); on this synthetic
CODE corpus it would veto ~every doc, so the pipeline gates on the three
structural rules and records all four rules' hit counts honestly.

Writes BENCH/PIPELINE.json.

Usage: python tools/pipeline_demo.py [n_docs]   (default 1000000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TWIN_OFFSET = 100_000_000
PLANT_EVERY = 10
N_BUCKETS = 64


def main() -> None:
    from pyspark.sql import functions as F

    from goldenretriever_spark import corpus
    from goldenretriever_spark.index.blocks import pack_blocks
    from goldenretriever_spark.index.build import build_index
    from goldenretriever_spark.index.storage import StoredIndex, write_index
    from goldenretriever_spark.operators.dedup import (
        _drop_hot_buckets,
        _shingles,
        connected_components_star,
    )
    from goldenretriever_spark.operators.textstats import (
        QF_MAX_AVG_TOK,
        QF_MAX_SYMBOL_RATIO,
        QF_MAX_TOKENS,
        QF_MIN_AVG_TOK,
        QF_MIN_TOKENS,
        QF_STOPWORDS,
    )
    from goldenretriever_spark.session import get_spark
    from goldenretriever_spark.tokenizer import SIMPLE_SPLIT_RE

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if args else 1_000_000

    spark = get_spark("gr-pipeline-demo", cores=32, shuffle_partitions=32)
    sc = spark.sparkContext

    stages: dict[str, dict] = {}

    def timed(name, fn):
        sc.setJobDescription(f"pipeline:{name}")
        t0 = time.time()
        out = fn()
        stages[name] = {"wall_sec": round(time.time() - t0, 2)}
        return out

    # ---- stage 0: raw corpus (shared cache with tools/dedup_scale.py) ----
    cache = f"/tmp/gr_dedup_corpus_{n_docs}.parquet"

    def ingest():
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

    docs, n_raw = timed("ingest", ingest)
    stages["ingest"]["rows_out"] = n_raw

    # ---- stage 1: quality gate (Gopher structural rules, one codegen pass) ----
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), SIMPLE_SPLIT_RE),
        lambda x: x != F.lit(""),
    )
    n_tokens = F.size(toks).cast("double")
    n_chars = F.length("text").cast("double")
    n_space = F.length(F.regexp_replace("text", r"[^ ]", "")).cast("double")
    n_sym = F.length(F.regexp_replace("text", r"[A-Za-z0-9 \t\n]", "")).cast("double")
    avg_tok = F.when(n_tokens > 0, (n_chars - n_space) / n_tokens).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in QF_STOPWORDS]),
            lambda m: F.array_contains(toks, m),
        )
    )
    flagged = docs.select(
        "doc_id",
        "text",
        ((n_tokens >= QF_MIN_TOKENS) & (n_tokens <= QF_MAX_TOKENS)).alias("f_len"),
        ((avg_tok >= QF_MIN_AVG_TOK) & (avg_tok <= QF_MAX_AVG_TOK)).alias("f_avg"),
        F.when(n_chars > 0, n_sym / n_chars <= QF_MAX_SYMBOL_RATIO)
        .otherwise(F.lit(False))
        .alias("f_sym"),
        (stop_hits >= 1).alias("f_stop"),
    )

    def gate():
        sc.setJobDescription("pipeline:quality_gate")
        rule_counts = flagged.agg(
            F.sum(F.when(~F.col("f_len"), 1).otherwise(0)).alias("drop_len"),
            F.sum(F.when(~F.col("f_avg"), 1).otherwise(0)).alias("drop_avg"),
            F.sum(F.when(~F.col("f_sym"), 1).otherwise(0)).alias("drop_sym"),
            F.sum(F.when(~F.col("f_stop"), 1).otherwise(0)).alias("drop_stop"),
        ).collect()[0]
        kept = (
            flagged.filter(F.col("f_len") & F.col("f_avg") & F.col("f_sym"))
            .select("doc_id", "text")
            .localCheckpoint()
        )
        return kept, kept.count(), rule_counts.asDict()

    gated, n_gated, rules = timed("quality_gate", gate)
    stages["quality_gate"]["rows_out"] = n_gated
    stages["quality_gate"]["rule_drop_counts"] = rules

    # ---- stage 2: exact dedup (digest keep-min anti-join) ----
    def exact():
        losers = (
            gated.groupBy(F.md5("text").alias("digest"))
            .agg(F.min("doc_id").alias("keep"), F.collect_list("doc_id").alias("ids"))
            .select(F.explode("ids").alias("doc_id"), "keep")
            .filter(F.col("doc_id") != F.col("keep"))
            .select("doc_id")
        )
        kept = gated.join(losers, "doc_id", "left_anti").localCheckpoint()
        return kept, kept.count()

    exact_kept, n_exact = timed("exact_dedup", exact)
    stages["exact_dedup"]["rows_out"] = n_exact

    # ---- stage 3: near-dup keep-canonical (verified pairs -> star-CC ->
    # anti-join). Verification = exact Jaccard >= 0.8 over a df-capped
    # shingle inverted index (the q_ngram_jaccard_pairs shape); the raw
    # MinHash-LSH candidate level is measured separately in
    # BENCH/DEDUP_SCALE.json — candidates are recall-oriented and at this
    # corpus's background similarity must be verified before clustering. ----
    VERIFY_CAP, TAU_Q = 50, 8000

    def near_dup():
        ex = exact_kept.select(
            "doc_id", F.explode(_shingles(F.col("text"))).alias("shingle")
        )
        ex = _drop_hot_buckets(ex, ["shingle"], VERIFY_CAP)
        sized = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        exj = ex.join(sized, "doc_id")
        a = exj.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"), "shingle")
        b = exj.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"), "shingle")
        pairs = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b", "na", "nb")
            .agg(F.count(F.lit(1)).alias("common"))
            .withColumn(
                "jq",
                F.round(
                    F.col("common") / (F.col("na") + F.col("nb") - F.col("common")) * 10000
                ).cast("long"),
            )
            .filter(F.col("jq") >= TAU_Q)
            .select("doc_a", "doc_b")
            .localCheckpoint()
        )
        n_pairs = pairs.count()
        comp = connected_components_star(pairs).localCheckpoint()
        losers = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        )
        kept = exact_kept.join(losers, "doc_id", "left_anti").localCheckpoint()
        return kept, kept.count(), n_pairs

    canon, n_canon, n_pairs = timed("neardup_keep_canonical", near_dup)
    stages["neardup_keep_canonical"]["rows_out"] = n_canon
    stages["neardup_keep_canonical"]["verified_pairs"] = n_pairs
    stages["neardup_keep_canonical"]["verify_shingle_df_cap"] = VERIFY_CAP
    stages["neardup_keep_canonical"]["verify_threshold"] = 0.8

    # ---- stage 4: index build + pack + persist ----
    idx_path = f"/tmp/gr_pipeline_idx_{n_docs}"

    def build():
        clean = canon.select("doc_id", F.col("text").alias("content"))
        idx = build_index(clean, tokenizer="simple")
        blocks = pack_blocks(
            idx, block_size=128, target_docs_per_group=250_000, n_term_buckets=N_BUCKETS
        )
        write_index(idx, idx_path, blocks=blocks, n_term_buckets=N_BUCKETS)
        return idx

    idx = timed("index_build_pack_persist", build)
    stored = StoredIndex(spark, idx_path)
    n_blocks = stored.posting_blocks.count()
    stages["index_build_pack_persist"]["posting_blocks"] = n_blocks
    stages["index_build_pack_persist"]["docs_per_sec"] = round(
        n_canon / stages["index_build_pack_persist"]["wall_sec"], 1
    )

    # deterministic mid-frequency filter term: df closest to 0.5% of docs
    t_row = (
        idx.term_stats.withColumn(
            "dist", F.abs(F.col("df") - F.lit(int(n_canon * 0.005)))
        )
        .orderBy("dist", "term")
        .select("term", "df")
        .first()
    )
    filter_term, filter_df = t_row["term"], int(t_row["df"])

    # ---- stage 5: serve (reference 50-query batch, k=10) ----
    qset = corpus.reference_queries(50, seed=42)
    qlist = [(int(r.query_id), r.query_str) for r in qset.itertuples()]

    def serve_auto():
        return stored.search(qlist, k=10).collect()

    rows_auto = timed("serve_auto_topk", serve_auto)
    stages["serve_auto_topk"]["rows_out"] = len(rows_auto)

    def serve_boolean():
        return stored.boolean(must=["def", "return"], must_not=["todo"]).count()

    n_bool = timed("serve_boolean", serve_boolean)
    stages["serve_boolean"]["rows_out"] = n_bool

    def serve_filtered():
        return stored.search_filtered(qlist, k=10, must=[filter_term]).collect()

    rows_filt = timed("serve_filtered_topk", serve_filtered)
    stages["serve_filtered_topk"]["rows_out"] = len(rows_filt)
    stages["serve_filtered_topk"]["filter_term_df"] = filter_df
    stages["serve_filtered_topk"]["filter_selectivity"] = round(filter_df / n_canon, 4)

    out = {
        "metric": "gr_spark_pipeline_demo",
        "unit": "sec",
        "n_docs_raw": n_raw,
        "n_docs_final": n_canon,
        "total_pipeline_sec": round(
            sum(s["wall_sec"] for n, s in stages.items() if n != "ingest"), 2
        ),
        "stages": stages,
        "loadavg": open("/proc/loadavg").read().split()[:3],
        "note": (
            "One composed run: gate -> exact dedup -> MinHash keep-canonical "
            "-> index build -> three lexical serve paths on the deduped "
            "index. Serve batch = reference_queries(50). The hybrid vector "
            "leg is covered by BENCH/HYBRID_SCALE.json at 3.84M docs and is "
            "not re-run here."
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "PIPELINE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
