"""Capture formatted physical plans of the headline operators into
BENCH/PLANS.md — the `.explain("formatted")` audit trail: pushed filters,
broadcast choices, codegen spans, and the absence of cartesian products are
visible in one artifact instead of only in plan-shape tests.

Usage: python tools/capture_plans.py [sf_dir]   (default sf0.001 — plans,
not timings; data size is irrelevant)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _formatted(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    from pyspark.sql import functions as F

    from goldenretriever_spark.corpus import driver_documents
    from goldenretriever_spark.index.build import build_index
    from goldenretriever_spark.operators import ann, dedup
    from goldenretriever_spark.query import bm25
    from goldenretriever_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("gr-plan-capture", cores=4, shuffle_partitions=4)

    docs = driver_documents(spark, sf_dir)
    idx = build_index(docs, tokenizer="simple", persist=False)
    terms = bm25.query_terms_df(spark, [(0, "fast merge sort"), (1, "window scan")])

    sections: list[tuple[str, str, object]] = [
        (
            "Index build: postings (tokenize -> explode -> 2-phase agg)",
            "doc_len rides in the grouping key (no doc_stats join anywhere); "
            "HashAggregate appears twice (partial map-side, final after one "
            "Exchange on term/doc_id/doc_len); tokenize+explode are inside "
            "WholeStageCodegen — no Python in the plan.",
            idx.postings,
        ),
        (
            "BM25 brute top-k (batch of queries)",
            "Query terms and matched term_stats broadcast (BroadcastHashJoin, "
            "never SortMergeJoin); the scoring expression is a single codegen'd "
            "project; top-k is WindowGroupLimit (distributed partial top-k) "
            "before the final rank filter.",
            bm25.top_k(idx, terms, k=10),
        ),
        (
            "As-of join (clicks <- latest prior purchase)",
            "Union + single window over the key: ONE Exchange on user_id, no "
            "pair materialization, no nested loop.",
            None,  # built below to avoid import cycles
        ),
        (
            "Embedding near-dup (LSH-bucket blocked, radius-1 probe)",
            "Bucket equi-join (hash join) after the hot-bucket anti-join; no "
            "CartesianProduct / BroadcastNestedLoopJoin anywhere; the pair "
            "dedup aggregates (id_a, id_b, long) — vectors never shuffle "
            "after scoring.",
            dedup.q_embedding_neardup_pairs(spark, sf_dir),
        ),
        (
            "Hybrid RRF fusion (BM25 leg + cosine leg)",
            "Union of the two already-ranked legs -> partial HashAggregate "
            "(map-side combine of the reciprocal sums) -> ONE Exchange on "
            "(query_id, doc_id) -> final agg -> Partial WindowGroupLimit "
            "prunes to top-k BEFORE the per-query Exchange -> final limit + "
            "Window. Two shuffles total, both over candidate lists "
            "(queries x k rows), never the corpus.",
            None,  # built below: needs both legs constructed first
        ),
        (
            "Phrase match (positional start-vote, index path)",
            "The arrays-contain conjunction prunes non-candidate docs BEFORE "
            "posexplode (PushedFilters stay on the scan for parquet sources); "
            "phrase offsets are a BroadcastHashJoin (2-row frame); both "
            "groupBys are 2-phase HashAggregate with map-side combine over "
            "(doc_id, start) — high-cardinality keys, no reducer hot-spot; "
            "no Python anywhere in the plan.",
            None,  # built below from the loaded docs frame
        ),
        (
            "ANN IVF (broadcast centroids, probe 2 lists)",
            "Centroid cross-joins are BroadcastNestedLoopJoin over a "
            "broadcast-hinted 8-row table (intended: assignment needs every "
            "(vector, centroid) distance); the probe->list join is a hash "
            "equi-join on centroid_id.",
            ann.q_ann_ivf_topk(spark, sf_dir),
        ),
    ]

    from goldenretriever_spark.operators.temporal import as_of_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("pid"), "value"
    )
    sections[2] = (sections[2][0], sections[2][1], as_of_join(clicks, purch, on=["user_id"]))

    from goldenretriever_spark.query.hybrid import rrf_fuse

    lex = bm25.top_k(idx, terms, k=10).select("query_id", "doc_id", "rank")
    vec = ann.q_ann_brute_topk(spark, sf_dir, k=10, n_queries=2).select(
        "query_id", F.col("vec_id").alias("doc_id"), F.col("rnk").alias("rank")
    )
    sections[4] = (sections[4][0], sections[4][1], rrf_fuse([lex, vec], k=10))

    from goldenretriever_spark.query.phrase import phrase_match

    sections[5] = (
        sections[5][0],
        sections[5][1],
        phrase_match(docs, ["hash", "join"], text_col="content"),
    )

    out = ["# BENCH/PLANS.md — formatted physical plans (captured by tools/capture_plans.py)\n"]
    for title, note, df in sections:
        out.append(f"## {title}\n\n{note}\n\n```\n{_formatted(spark, df).strip()}\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote BENCH/PLANS.md")


if __name__ == "__main__":
    main()
