"""Interleaved r6-code vs r7-code attribution for the stored BM25 cells at
the 3.84M-doc scale point (the r6 VERDICT's drift-attribution discipline:
alternate code versions on the same host so ambient noise hits both).

Both versions read the SAME persisted index (/tmp/gr_idx_3840000 — the r7
block format is byte-identical to r6's), each cell in a FRESH JVM via a
subprocess whose sys.path[0] selects the code tree. Writes
BENCH/R7_VS_R6.json.

Usage: python tools/r7_vs_r6_wand.py [rounds]   (default 3)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R6_TREE = "/tmp/r6code"
OUT = os.path.join(REPO, "BENCH", "R7_VS_R6.json")

CELL_SCRIPT = r"""
import sys, time, json
sys.path.insert(0, sys.argv[1])
from goldenretriever_spark import corpus
from goldenretriever_spark.index.storage import StoredIndex
from goldenretriever_spark.query.wand import brute_top_k_stored, wand_top_k
from goldenretriever_spark.session import get_spark

spark = get_spark("gr-ab", cores=32, shuffle_partitions=32)
stored = StoredIndex(spark, "/tmp/gr_idx_3840000")
nb = stored.n_term_buckets
blocks, cstats = stored.posting_blocks, stored.corpus_stats
out = {}
for qlen, fn_name in [(5, "wand"), (1, "brute")]:
    qset = corpus.fixed_length_queries(50, n_terms=qlen, seed=42)
    qlist = [(int(r.query_id), r.query_str) for r in qset.itertuples()]
    fn = wand_top_k if fn_name == "wand" else brute_top_k_stored
    best = None
    for _ in range(2):
        t0 = time.time()
        fn(spark, blocks, cstats, qlist, k=10, n_term_buckets=nb).collect()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    out[f"{fn_name}_qlen{qlen}"] = round(best, 2)
out["loadavg"] = float(open("/proc/loadavg").read().split()[0])
print("CELL_RESULT " + json.dumps(out))
"""


def run_cell(tree: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", CELL_SCRIPT, tree],
        capture_output=True, text=True, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("CELL_RESULT "):
            return json.loads(line[len("CELL_RESULT "):])
    raise RuntimeError(f"cell failed for {tree}: {p.stderr[-2000:]}")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = {"metric": "gr_spark_r7_vs_r6_interleaved", "n_docs": 3840000,
           "pairs": []}
    for i in range(rounds):
        r7 = run_cell(REPO)
        r6 = run_cell(R6_TREE)
        out["pairs"].append({"round": i, "r7": r7, "r6": r6})
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out["pairs"][-1]), flush=True)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
