"""Measure ANN recall@k vs brute-force ground truth on the driver embeddings
table — the quality half of the similarity-search component (speed is the
bucket-pruning factor; this records what that pruning costs in recall and
what multi-probe buys back).

recall@k(variant) = mean over queries of
    |top-k(variant) ∩ top-k(brute)| / k
computed over the first --n-queries vec_ids (deterministic query set, same
as the driver contract queries). Writes BENCH/ANN_RECALL.json.

Usage: python tools/ann_recall.py [sf_dir] [--k K] [--n-queries N]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _topk_sets(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def _clustered_section(spark, ann, k: int, n_queries: int, n: int = 2000) -> dict:
    """Stand-in vs trained IVF codebook on clustered embeddings (10 Gaussian
    blobs on the unit sphere), equal nominal budget (8 centroids, 2 probes):
    recall@k + measured candidate fraction for each."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = ann.synth_clustered_embeddings(spark, n).cache()
    e.count()
    q = (
        e.orderBy("vec_id").limit(n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_q"), F.asc("vec_id"))
    brute = (
        q.crossJoin(e)
        .select(
            "query_id", "vec_id",
            F.round(ann.cosine_col(F.col("qvec"), F.col("embedding")) * 10000)
            .cast("long").alias("cosine_q"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
    truth = _topk_sets(brute.collect())

    standin = (
        e.orderBy("vec_id").limit(8)
        .select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec"))
    )
    cb = ann.train_centroids_kmeans(e, n_centroids=8, iters=3)
    trained = spark.createDataFrame(
        [(i, row) for i, row in enumerate(cb)], "centroid_id int, cvec array<double>"
    )
    section: dict = {"n": n, "n_clusters": 10, "k": k, "n_queries": n_queries}
    for name, cent, n_probe in (
        ("ivf_standin_p1", standin, 1),
        ("ivf_trained_p1", trained, 1),
        ("ivf_standin_p2", standin, 2),
        ("ivf_trained_p2", trained, 2),
    ):
        got = _topk_sets(ann.ivf_topk(e, q, cent, k=k, n_probe=n_probe).collect())
        recalls = [len(got.get(qq, set()) & t) / k for qq, t in truth.items()]
        # measured candidate fraction via the operator's OWN assignment/probe
        # expressions (shared helper — ADVICE r4: no inline re-implementation
        # that could drift from the query)
        probed = ann.ivf_probed_candidates(e, q, cent, n_probe=n_probe)
        section[name] = {
            "recall_at_k": round(sum(recalls) / len(recalls), 4),
            "measured_candidate_fraction": round(float(probed) / (n_queries * n), 4),
        }
        print(json.dumps({f"clustered_{name}": section[name]}), flush=True)
    e.unpersist()
    return section


def main() -> None:
    from goldenretriever_spark.operators import ann
    from goldenretriever_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    k, n_queries = 10, 50
    for i, a in enumerate(sys.argv):
        if a.startswith("--k"):
            k = int(a.split("=", 1)[1] if "=" in a else sys.argv[i + 1])
        if a.startswith("--n-queries"):
            n_queries = int(a.split("=", 1)[1] if "=" in a else sys.argv[i + 1])

    spark = get_spark("gr-ann-recall", shuffle_partitions=16)
    truth = _topk_sets(ann.q_ann_brute_topk(spark, sf_dir, k=k, n_queries=n_queries).collect())

    variants = {
        "lsh_single_probe": lambda: ann.q_ann_lsh_topk(spark, sf_dir, k=k, n_queries=n_queries),
        "lsh_multiprobe_r1": lambda: ann.q_ann_lsh_multiprobe(
            spark, sf_dir, k=k, radius=1, n_queries=n_queries
        ),
        "lsh_multiprobe_r2": lambda: ann.q_ann_lsh_multiprobe(
            spark, sf_dir, k=k, radius=2, n_queries=n_queries
        ),
        "lsh_multitable_L4": lambda: ann.q_ann_lsh_multitable(
            spark, sf_dir, k=k, n_tables=4, n_queries=n_queries
        ),
        "ivf_c8_probe2": lambda: ann.q_ann_ivf_topk(
            spark, sf_dir, k=k, n_centroids=8, n_probe=2, n_queries=n_queries
        ),
        # trained coarse quantizer (seeded spherical k-means||) at the SAME
        # candidate budget as the stand-in codebook — VERDICT r3 #4
        "ivf_trained_c8_probe2": lambda: ann.q_ann_ivf_trained_topk(
            spark, sf_dir, k=k, n_centroids=8, n_probe=2, n_queries=n_queries
        ),
    }
    n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    n_planes = ann.N_PLANES
    cost = {
        "lsh_single_probe": 1 / 2**n_planes,
        "lsh_multiprobe_r1": len(ann.probe_masks(n_planes, 1)) / 2**n_planes,
        "lsh_multiprobe_r2": len(ann.probe_masks(n_planes, 2)) / 2**n_planes,
        "lsh_multitable_L4": 1 - (1 - 1 / 2**n_planes) ** 4,
        # nominal n_probe/n_centroids; the MEASURED fraction (actual probed
        # list sizes — skewed stand-in lists vs balanced trained lists) is
        # recorded separately below
        "ivf_c8_probe2": 2 / 8,
        "ivf_trained_c8_probe2": 2 / 8,
    }

    def _ivf_measured_fraction(cent_df) -> float:
        """Actual candidate fraction = Σ probed-list sizes / (n_queries·N),
        computed by the operator's shared ivf_assign/ivf_probes helper."""
        from goldenretriever_spark.operators.ann import _emb, _query_vectors

        probed = ann.ivf_probed_candidates(
            _emb(spark, sf_dir),
            _query_vectors(spark, sf_dir, n_queries),
            cent_df,
            n_probe=2,
        )
        return float(probed) / (n_queries * n_emb)
    out = {"sf_dir": sf_dir, "k": k, "n_queries": n_queries, "n_embeddings": n_emb,
           "n_planes": n_planes, "variants": {}}
    for name, fn in variants.items():
        got = _topk_sets(fn().collect())
        recalls = [len(got.get(q, set()) & t) / k for q, t in truth.items()]
        out["variants"][name] = {
            "recall_at_k": round(sum(recalls) / len(recalls), 4),
            "expected_candidate_fraction": round(cost[name], 4),
        }
        print(json.dumps({name: out["variants"][name]}), flush=True)

    # measured IVF candidate fractions (actual probed-list mass)
    from pyspark.sql import functions as F  # noqa: F401  (used in helper)

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    standin = (
        e.orderBy("vec_id").limit(8)
        .selectExpr("vec_id as centroid_id", "embedding as cvec")
    )
    out["variants"]["ivf_c8_probe2"]["measured_candidate_fraction"] = round(
        _ivf_measured_fraction(standin), 4
    )
    cb = ann.train_centroids_kmeans(e, n_centroids=8, iters=3)
    trained = spark.createDataFrame(
        [(i, row) for i, row in enumerate(cb)], "centroid_id int, cvec array<double>"
    )
    out["variants"]["ivf_trained_c8_probe2"]["measured_candidate_fraction"] = round(
        _ivf_measured_fraction(trained), 4
    )

    # --- clustered-geometry section (where a trained quantizer matters) ---
    # The driver embeddings are uniform on the sphere (measured: within-label
    # cosine ~ across-label ~ 0), so k-means has no structure to learn and
    # trained ~ stand-in there. Real corpora are clustered; this section
    # measures both codebooks on a deterministic clustered table.
    out["clustered"] = _clustered_section(spark, ann, k, n_queries)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ANN_RECALL.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"out": "BENCH/ANN_RECALL.json", **{kk: v["recall_at_k"] for kk, v in out["variants"].items()}}))


if __name__ == "__main__":
    main()
