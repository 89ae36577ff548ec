"""Boolean retrieval over the stored posting blocks — must / should /
must_not term filters, Lucene BooleanQuery semantics.

The reference engine has no boolean surface at all (retrieval is pure
similarity top-k, /root/reference/src/models.py:114-149); every production
full-text index pairs ranked retrieval with boolean filtering. Served the
same way as every stored-path operator in this engine: term_bucket
partition pruning restricts the scan to the query terms' bucket
directories, a lightweight decode materializes only (term, doc_id) — the
tf/doc_len blobs are never touched, parquet column pruning keeps them
unread — and the set algebra is three map-side-combinable aggregations:

    must:      docs with count_distinct(term) == |must|   (conjunction)
    should:    docs with count_distinct(term) >= min_should_match
    must_not:  left_anti join on the union of the excluded terms' docs

At 100 TB each leg's cost is the posting volume of ITS terms only; no
corpus scan, no full-index pass, no Python beyond the Arrow-batched varint
decode shared with every other stored reader.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _term_docs(
    posting_blocks: DataFrame, terms: list[str], n_term_buckets: int | None
) -> DataFrame:
    """(term, doc_id) rows for the given terms from the compressed blocks:
    bucket-prune + term filter + doc-id-only varint decode. The blob
    columns for tf/doc_len stay unread (ReadSchema carries only the doc-id
    blob)."""
    from goldenretriever_spark.index.codec import (
        delta_decode_grouped,
        varint_decode_many,
    )

    if not terms:
        raise ValueError("terms must be non-empty")
    tset = sorted(set(terms))
    if n_term_buckets and "term_bucket" in posting_blocks.columns:
        spark = posting_blocks.sparkSession
        buckets = [
            r["b"]
            for r in spark.createDataFrame([(t,) for t in tset], "term string")
            .select(
                F.pmod(F.xxhash64("term"), F.lit(n_term_buckets)).cast("int").alias("b")
            )
            .distinct()
            .collect()
        ]
        posting_blocks = posting_blocks.filter(F.col("term_bucket").isin(buckets))
    pruned = posting_blocks.filter(F.col("term").isin(tset)).select(
        "term", "doc_ids_delta_varint"
    )

    def unpack(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            deltas, counts = varint_decode_many(
                [bytes(x) for x in pdf["doc_ids_delta_varint"]]
            )
            ids = delta_decode_grouped(deltas, counts)
            if ids.size == 0:
                continue
            yield pd.DataFrame(
                {"term": np.repeat(pdf["term"].to_numpy(), counts), "doc_id": ids}
            )

    return pruned.mapInPandas(unpack, schema="term string, doc_id long")


def boolean_match_stored(
    posting_blocks: DataFrame,
    must: list[str] | None = None,
    should: list[str] | None = None,
    must_not: list[str] | None = None,
    min_should_match: int | None = None,
    n_term_buckets: int | None = None,
) -> DataFrame:
    """Docs satisfying the boolean query, as ``(doc_id, n_should_hit)``.

    Semantics (Lucene BooleanQuery): a doc qualifies iff it contains ALL
    ``must`` terms, at least ``min_should_match`` distinct ``should`` terms
    (default 1 when there are no must clauses — pure disjunction — else 0,
    where should only contributes the returned hit count), and NONE of the
    ``must_not`` terms. ``n_should_hit`` is the distinct should-term count
    (0 when no should clauses), usable as a coordination signal downstream.
    At least one positive clause (must or should) is required — a pure
    negation over an index is unbounded by construction.
    """
    must = sorted(set(must or []))
    should = sorted(set(should or []))
    must_not = sorted(set(must_not or []))
    if not must and not should:
        raise ValueError("boolean query needs at least one must or should term")
    if min_should_match is None:
        min_should_match = 1 if not must else 0
    if min_should_match > len(should):
        raise ValueError("min_should_match exceeds the number of should terms")

    if must:
        cand = (
            _term_docs(posting_blocks, must, n_term_buckets)
            .groupBy("doc_id")
            .agg(F.count_distinct("term").alias("_nm"))
            .filter(F.col("_nm") == len(must))
            .select("doc_id")
        )
    else:
        cand = None

    if should:
        sh = (
            _term_docs(posting_blocks, should, n_term_buckets)
            .groupBy("doc_id")
            .agg(F.count_distinct("term").cast("long").alias("n_should_hit"))
        )
        if cand is None:
            out = sh.filter(F.col("n_should_hit") >= min_should_match)
        else:
            out = cand.join(sh, "doc_id", "left").select(
                "doc_id", F.coalesce("n_should_hit", F.lit(0)).alias("n_should_hit")
            )
            if min_should_match > 0:
                out = out.filter(F.col("n_should_hit") >= min_should_match)
    else:
        out = cand.select("doc_id", F.lit(0).cast("long").alias("n_should_hit"))

    if must_not:
        excl = _term_docs(posting_blocks, must_not, n_term_buckets).select(
            "doc_id"
        ).distinct()
        out = out.join(excl, "doc_id", "left_anti")
    return out


def filtered_top_k(
    spark,
    posting_blocks: DataFrame,
    corpus_stats: DataFrame,
    queries,
    k: int = 10,
    must: list[str] | None = None,
    should: list[str] | None = None,
    must_not: list[str] | None = None,
    min_should_match: int | None = None,
    tokenizer: str = "simple",
    n_term_buckets: int | None = None,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Ranked retrieval under a boolean filter — Elasticsearch's
    ``bool{filter, must_not} + match`` shape, the most common production
    query form the reference's pure-similarity path cannot express.

    Semantics: the filter restricts the CANDIDATE SET BEFORE ranking (a doc
    failing the filter can never appear, and the returned top-k are the k
    best among qualifying docs — not a post-filter of an unfiltered top-k,
    which can return fewer than k). Scores are unchanged by the filter
    (ES filter-context: no score contribution).

    Plan: BM25 candidate scores from the compressed blocks
    (wand.stored_score_candidates) LEFT-SEMI joined to the boolean doc set
    (:func:`boolean_match_stored`) on doc_id, then the per-query window
    top-k. Both legs are bucket-pruned to their own terms; the semi-join
    keys on doc_id over candidate-sized frames only.

    Returns (query_id, doc_id, score, rank).
    """
    from pyspark.sql import Window

    from goldenretriever_spark.query.wand import stored_score_candidates

    scored = stored_score_candidates(
        spark,
        posting_blocks,
        corpus_stats,
        queries,
        tokenizer=tokenizer,
        n_term_buckets=n_term_buckets,
        stats=stats,
    )
    allowed = boolean_match_stored(
        posting_blocks,
        must=must,
        should=should,
        must_not=must_not,
        min_should_match=min_should_match,
        n_term_buckets=n_term_buckets,
    ).select("doc_id")
    kept = scored.join(allowed, "doc_id", "left_semi")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        kept.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
