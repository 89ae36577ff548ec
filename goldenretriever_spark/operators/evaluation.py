"""Retrieval evaluation harness: MRR + recall@k with per-kb rollup.

Reference: /root/reference/src/finetune/eval.py —
- MRR = mean(1/rank) (eval.py:12-21, SURVEY A1)
- recall@N = fraction of gold answers ranked <= N (eval.py:23-48, A2)
- the per-kb loop + 'Across_all_kb' grand total (eval.py:66-129, A4) is
  rollup() in one pass instead of a Python loop over kb names.

Inputs: ranked results (query_id, doc_id, rank[, kb_name]) and qrels
(query_id, doc_id). Gold rank per query = rank of the gold doc among the
ranked results (missing -> excluded from recall numerators, like the
reference's rank matrix treats absent answers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gold_ranks(ranked: DataFrame, qrels: DataFrame) -> DataFrame:
    """(query_id, rank of the gold doc). Multiple golds per query -> best
    (minimum) rank, matching eval.py's min over gold positions."""
    j = ranked.join(qrels, ["query_id", "doc_id"])
    return j.groupBy("query_id").agg(F.min("rank").alias("gold_rank"))


def metrics(ranked: DataFrame, qrels: DataFrame, ks: tuple[int, ...] = (1, 2, 3)) -> DataFrame:
    """Corpus-level MRR + recall@k over all queries in qrels (queries whose
    gold never appears in `ranked` count as rank=inf: contribute 0)."""
    n_queries = qrels.select("query_id").distinct().count()
    g = gold_ranks(ranked, qrels)
    aggs = [
        F.round(F.sum(1.0 / F.col("gold_rank")) / n_queries * 10000).cast("long").alias("mrr_q")
    ]
    for k in ks:
        aggs.append(
            F.round(
                F.sum(F.when(F.col("gold_rank") <= k, 1.0).otherwise(0.0)) / n_queries * 10000
            )
            .cast("long")
            .alias(f"recall_at_{k}_q")
        )
    return g.agg(*aggs)


def accuracy_at_k(
    ranked: DataFrame, qrels: DataFrame, ks: tuple[int, ...] = (1, 2, 3)
) -> DataFrame:
    """Named accuracy@k metric (SURVEY A3; reference
    data_preprocessing.py:104-116,135-158): fraction of gold queries whose
    gold doc appears in the top k. Denominator = ALL queries in qrels —
    queries whose gold never ranked contribute 0 (the reference pads the rank
    matrix with misses the same way)."""
    n_queries = qrels.select("query_id").distinct().count()
    g = gold_ranks(ranked, qrels)
    aggs = [
        F.round(
            F.sum(F.when(F.col("gold_rank") <= k, 1.0).otherwise(0.0)) / n_queries * 10000
        )
        .cast("long")
        .alias(f"accuracy_at_{k}_q")
        for k in ks
    ]
    return g.agg(*aggs)


def hard_negatives(ranked: DataFrame, qrels: DataFrame) -> DataFrame:
    """Hard-negative mining — the reference's ``make_closewrong``
    (data_preprocessing.py:160-166, finetune/generators.py:119-125): per
    query, the highest-ranked prediction NOT in the gold set. Anti-join on
    (query_id, doc_id) removes golds; row_number over ascending rank picks
    the closest wrong answer. Both the anti-join and the per-query window
    shuffle on query_id only — no global ordering."""
    neg = ranked.join(qrels, ["query_id", "doc_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.asc("rank"), F.asc("doc_id"))
    return (
        neg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("doc_id").alias("neg_doc_id"),
            F.col("rank").alias("neg_rank"),
        )
    )


def metrics_per_kb(ranked_kb: DataFrame, qrels: DataFrame, ks: tuple[int, ...] = (1, 2, 3)) -> DataFrame:
    """Per-kb metrics + grand-total row via rollup (eval.py:66-129).

    ranked_kb must carry kb_name; the grand total appears as kb_name='ALL'.
    Denominator = queries evaluated in that kb (as in the reference, which
    iterates per-kb query sets)."""
    g = (
        ranked_kb.join(qrels, ["query_id", "doc_id"])
        .groupBy("kb_name", "query_id")
        .agg(F.min("rank").alias("gold_rank"))
    )
    aggs = [
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg(1.0 / F.col("gold_rank")) * 10000).cast("long").alias("mrr_q"),
    ]
    for k in ks:
        aggs.append(
            F.round(F.avg(F.when(F.col("gold_rank") <= k, 1.0).otherwise(0.0)) * 10000)
            .cast("long")
            .alias(f"recall_at_{k}_q")
        )
    return (
        g.rollup("kb_name")
        .agg(*aggs)
        .withColumn("kb_name", F.coalesce("kb_name", F.lit("ALL")))
    )
