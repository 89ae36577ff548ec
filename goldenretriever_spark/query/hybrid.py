"""Hybrid retrieval: reciprocal-rank fusion of lexical and vector rankings.

Beyond-parity addition (no reference analog — goldenretriever serves BM25 and
Annoy-cosine results as SEPARATE endpoints, `/root/reference/src/models.py`
`make_query`; a production retrieval stack fuses them). Reciprocal-rank
fusion (Cormack, Clarke & Buettcher, SIGIR 2009): each input ranking
contributes 1/(k0 + rank) per item and the fused score is the sum, so an
item ranked well by EITHER leg surfaces without any score-scale calibration
between BM25 log-weights and cosine similarities — the reason RRF beats
score-interpolation when the legs' score distributions are incomparable.

Scale shape: each leg is already a top-k frame (tiny — n_queries × k rows),
so the fusion is a union + one hash aggregation on (query_id, doc_id) + one
per-query window top-k. No join against the corpus, no shuffle wider than
the candidate lists themselves; at 100 TB the legs' own plans (stored-index
WAND, IVF-probed ANN) bound the cost and the fusion stays O(queries × k).

Determinism: ranks are integers and each (query_id, doc_id) appears at most
once per leg, so the fused double is a sum of at most `len(rankings)`
exactly-representable reciprocals added in a fixed commutative pattern —
quantizing to int64 (×1e7) gives the same value in Spark and DuckDB, and
ties break on doc_id ascending like every other ranking in this engine.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K0 = 60  # the SIGIR'09 paper's constant; small k0 overweights rank 1
RRF_QUANT = 10_000_000  # 1/(60+1000) ≈ 9.4e-4 — 1e7 keeps 4 sig. digits


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k0: int = RRF_K0,
    item_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse per-query rankings into one top-k by reciprocal-rank score.

    Each input frame must carry (query_id, `item_col`, `rank_col`) with
    `rank_col` a 1-based dense per-query position (row_number output). Items
    missing from a leg simply contribute nothing for that leg — no outer
    join gymnastics needed because the union + groupBy sums whatever legs
    the item appeared in.

    Returns (query_id, item_col, rrf_q, rank): rrf_q is the fused score
    quantized to int64 (×``RRF_QUANT``), rank the 1-based fused position.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    legs = [df.select("query_id", item_col, rank_col) for df in rankings]
    unioned = reduce(lambda a, b: a.unionByName(b), legs)
    fused = (
        unioned.groupBy("query_id", item_col)
        .agg(F.sum(F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col))).alias("rrf"))
        .select(
            "query_id",
            item_col,
            F.round(F.col("rrf") * RRF_QUANT).cast("long").alias("rrf_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_q"), F.asc(item_col))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", item_col, "rrf_q", "rank")
    )
