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
    }
    n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    n_planes = ann.N_PLANES
    cost = {
        "lsh_single_probe": 1 / 2**n_planes,
        "lsh_multiprobe_r1": len(ann.probe_masks(n_planes, 1)) / 2**n_planes,
        "lsh_multiprobe_r2": len(ann.probe_masks(n_planes, 2)) / 2**n_planes,
        "lsh_multitable_L4": 1 - (1 - 1 / 2**n_planes) ** 4,
        "ivf_c8_probe2": 2 / 8,
    }
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

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ANN_RECALL.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"out": "BENCH/ANN_RECALL.json", **{kk: v["recall_at_k"] for kk, v in out["variants"].items()}}))


if __name__ == "__main__":
    main()
