"""Single-query serve-latency breakdown at the scale point (VERDICT r5 #7).

BENCH/SERVE_DEMO.json put one query -> content at ~2s on the 3.84M-doc
index; this tool decomposes where that goes and measures what the r6
StoredIndex metadata memoization removed:

  scheduler_floor_sec   — empty-ish job round-trip (range().count()): the
                          irreducible local-mode job cost
  handle_open_sec       — StoredIndex() + _meta read + corpus_stats collect
                          + posting_blocks partition discovery; paid ONCE
                          per handle after r6 memoization (was per query)
  per_query_meta_sec    — what the pre-memo path re-paid per query
                          (_meta + corpus_stats), measured directly
  ranked_sec            — warm handle, one query, ranked ids only
  content_sec           — same plus documents join-back
  batch50_ranked_sec    — the amortization comparison: 50 queries batched

All timings best of --runs on a warm JVM. Writes BENCH/SERVE_LATENCY.json.

Usage: python tools/serve_latency.py [n_docs] [--runs R]  (default 3840000, 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from goldenretriever_spark import corpus
    from goldenretriever_spark.index.build import with_doc_ids
    from goldenretriever_spark.index.storage import StoredIndex
    from goldenretriever_spark.session import get_spark
    from tools.wand_crossover import ensure_index

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if args else 3_840_000
    runs = 3
    for i, a in enumerate(sys.argv):
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1] if "=" in a else sys.argv[i + 1])

    spark = get_spark("gr-serve-latency", cores=32, shuffle_partitions=32)
    idx_path = ensure_index(spark, n_docs)
    docs = with_doc_ids(
        spark.read.parquet(f"/tmp/gr_bench_corpus_{n_docs}.parquet")
    ).select("doc_id", "content")

    qset = corpus.reference_queries(50, seed=42)
    qlist = [(int(r.query_id), r.query_str) for r in qset.itertuples()]

    def best(fn):
        b = None
        for _ in range(runs):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            b = dt if b is None or dt < b else b
        return b

    # warm the JVM + python workers before any timing
    warm = StoredIndex(spark, idx_path)
    warm.search(qlist[:2], k=10).collect()

    t_floor = best(lambda: spark.range(1 << 20).count())

    def open_handle():
        h = StoredIndex(spark, idx_path)
        h.n_term_buckets
        h.stats
        h.posting_blocks
        return h

    t_open = best(open_handle)

    # what the pre-memo path re-paid on EVERY query
    def per_query_meta():
        spark.read.parquet(os.path.join(idx_path, "_meta")).collect()
        spark.read.parquet(os.path.join(idx_path, "corpus_stats")).collect()
        spark.read.parquet(os.path.join(idx_path, "posting_blocks"))

    t_meta = best(per_query_meta)

    stored = open_handle()  # warm memoized handle for the serve rows
    t_ranked = best(lambda: stored.search(qlist[:1], k=10).collect())
    t_content = best(
        lambda: stored.search(qlist[:1], k=10, documents=docs).collect()
    )
    t_content_pd = best(
        lambda: stored.search(
            qlist[:1], k=10, documents=docs, content_pushdown=True
        ).collect()
    )
    t_batch = best(lambda: stored.search(qlist, k=10).collect())

    out = {
        "metric": "gr_spark_serve_latency",
        "unit": "sec",
        "n_docs": n_docs,
        "runs": runs,
        "scheduler_floor_sec": round(t_floor, 3),
        "handle_open_sec": round(t_open, 3),
        "per_query_meta_sec_pre_memo": round(t_meta, 3),
        "single_query_ranked_sec": round(t_ranked, 3),
        "single_query_content_sec": round(t_content, 3),
        "content_joinback_sec": round(t_content - t_ranked, 3),
        "single_query_content_pushdown_sec": round(t_content_pd, 3),
        "batch50_ranked_sec": round(t_batch, 3),
        "per_query_amortized_sec": round(t_batch / 50, 3),
        "note": (
            "warm JVM, best of runs. handle_open is paid once per "
            "StoredIndex after the r6 memoization; pre-r6 every search "
            "re-paid per_query_meta (2 driver jobs + partition discovery). "
            "single_query_ranked - scheduler_floor is the real query work; "
            "batch50/50 shows what batching amortizes."
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SERVE_LATENCY.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
