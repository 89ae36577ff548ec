"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship BM25 top-k over the sf0.001 documents corpus.
queries()     -> one entry per implemented operator (SURVEY.md §2).
oracle_sql()  -> DuckDB twins over the pre-registered parquet views.

Float discipline for oracle comparison: BM25 scores are quantized to
score_q = CAST(round(score * 10000) AS BIGINT) in BOTH engines and ranking
uses the quantized score with asc(doc_id) tie-break, so the value-hash
compares integers, never raw doubles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"

# the flagship query batch run against the driver documents corpus
FLAGSHIP_QUERIES: list[tuple[int, str]] = [
    (0, "fast merge sort"),
    (1, "window scan"),
    (2, "spark stream batch join"),
    (3, "the"),
    (4, "vector customer value"),
    (5, "zzzmissing fast"),
]

K = 10


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goldenretriever_spark.corpus import driver_documents

    return driver_documents(spark, sf_dir)


def _bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 per query over documents, quantized scores (SURVEY §2 J5,
    A7-A8, W1-W3, F8 in one plan)."""
    from goldenretriever_spark.index.build import build_index
    from goldenretriever_spark.query import bm25

    docs = _documents(spark, sf_dir)
    idx = build_index(docs, tokenizer="simple")
    terms = bm25.query_terms_df(spark, FLAGSHIP_QUERIES, tokenizer="simple")
    scores = bm25.score_candidates(idx, terms)
    scored = scores.withColumn("score_q", F.round(F.col("score") * 10000).cast("long"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score_q"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "doc_id", "score_q", "rank")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _bm25_topk(spark, SF_SMOKE)


# ---------------------------------------------------------------------------
# DuckDB oracle SQL building blocks (documents view: doc_id, text, lang,
# source, n_chars — the simple tokenizer is lower + whitespace split).
# ---------------------------------------------------------------------------

_TOKS_CTE = r"""
toks AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t(term)
  WHERE t.term <> ''
),
postings AS (
  SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY term, doc_id
),
doc_stats AS (
  SELECT doc_id, count(*)::BIGINT AS doc_len FROM toks GROUP BY doc_id
),
corpus AS (
  SELECT count(*)::BIGINT AS n_docs, avg(doc_len) AS avgdl FROM doc_stats
),
term_stats AS (
  SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY term
)
"""


def _queries_values_sql() -> str:
    """FLAGSHIP_QUERIES tokenized to unique (query_id, term) VALUES rows —
    mirrors bm25.query_terms_df exactly."""
    from goldenretriever_spark.oracle import simple_tokenize_text

    rows = []
    for qid, qstr in FLAGSHIP_QUERIES:
        for term in sorted(set(simple_tokenize_text(qstr))):
            rows.append(f"({qid}, '{term}')")
    return ", ".join(rows)


def _bm25_topk_sql() -> str:
    return f"""
WITH {_TOKS_CTE},
qterms(query_id, term) AS (VALUES {_queries_values_sql()}),
scored AS (
  SELECT q.query_id, p.doc_id,
         sum( ln(1 + (c.n_docs - t.df + 0.5) / (t.df + 0.5))
            * (p.tf / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.doc_len / c.avgdl))) ) AS score
  FROM qterms q
  JOIN postings p USING (term)
  JOIN term_stats t ON p.term = t.term
  JOIN doc_stats d ON p.doc_id = d.doc_id
  CROSS JOIN corpus c
  GROUP BY q.query_id, p.doc_id
),
ranked AS (
  SELECT query_id, doc_id,
         CAST(round(score * 10000) AS BIGINT) AS score_q,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(round(score * 10000) AS BIGINT) DESC, doc_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, doc_id, score_q, rank FROM ranked WHERE rank <= {K}
"""


# --- simpler IR stage queries (SURVEY §2.1 S*, §2.4 A7-A9, F12) -------------

def _postings_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goldenretriever_spark.index.build import build_index

    return build_index(_documents(spark, sf_dir), tokenizer="simple").postings


def _doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goldenretriever_spark.index.build import build_index

    return build_index(_documents(spark, sf_dir), tokenizer="simple").doc_stats


def _corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goldenretriever_spark.index.build import build_index

    idx = build_index(_documents(spark, sf_dir), tokenizer="simple")
    return idx.corpus_stats.select(
        "n_docs", F.round(F.col("avgdl") * 10000).cast("long").alias("avgdl_q")
    )


def _term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goldenretriever_spark.index.build import build_index

    return build_index(_documents(spark, sf_dir), tokenizer="simple").term_stats


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from goldenretriever_spark.operators import ann, dedup, relational, textstats

    return {
        # --- IR / BM25 core (SURVEY §2.1, §2.3 J5, §2.4 A7-A8, §2.5-2.6) ---
        "bm25_topk": _bm25_topk,
        "ir_postings_tf": _postings_tf,
        "ir_doc_stats_sha256": _doc_stats,
        "ir_corpus_stats": _corpus_stats,
        "ir_term_df": _term_df,
        # --- relational surface (SURVEY §2.2-2.8) ---
        "rel_pricing_summary": relational.q_pricing_summary,
        "rel_join_topk": relational.q_join_topk,
        "rel_rollup_metrics": relational.q_rollup_metrics,
        "rel_window_rank": relational.q_window_rank,
        "rel_window_running": relational.q_window_running,
        "rel_semi_join": relational.q_semi_join,
        "rel_anti_join": relational.q_anti_join,
        "rel_dense_rank_ids": relational.q_dense_rank_ids,
        "rel_union_distinct": relational.q_union_distinct,
        "rel_filter_project_fill": relational.q_filter_project_fill,
        "rel_grouping_sets_region": relational.q_grouping_sets_region,
        # --- text analysis (training-data ops) ---
        "txt_token_count": textstats.q_token_count,
        "txt_quality_score": textstats.q_quality_score,
        "txt_lang_id": textstats.q_lang_id,
        "txt_fingerprint": textstats.q_fingerprint,
        # --- deduplication (training-data ops) ---
        "dedup_exact": dedup.q_exact_dedup,
        "dedup_minhash_signatures": dedup.q_minhash_signatures,
        "dedup_minhash_lsh_pairs": dedup.q_minhash_lsh_pairs,
        "dedup_ngram_jaccard": dedup.q_ngram_jaccard_pairs,
        "dedup_simhash": dedup.q_simhash,
        "dedup_embedding_neardup": dedup.q_embedding_neardup_pairs,
        # --- similarity search ---
        "ann_brute_topk": ann.q_ann_brute_topk,
        "ann_lsh_topk": ann.q_ann_lsh_topk,
    }


def oracle_sql() -> dict[str, str]:
    from goldenretriever_spark.plans.oracles import all_oracles

    out = all_oracles()
    out.update(_ir_oracles())
    return out


def _ir_oracles() -> dict[str, str]:
    return {
        "bm25_topk": _bm25_topk_sql(),
        "ir_postings_tf": f"""
WITH {_TOKS_CTE}
SELECT p.term, p.doc_id, p.tf, s.doc_len
FROM postings p JOIN doc_stats s USING (doc_id)
""",
        "ir_doc_stats_sha256": f"""
WITH {_TOKS_CTE}
SELECT d.doc_id, s.doc_len, sha256(d.text) AS sha256
FROM documents d JOIN doc_stats s USING (doc_id)
""",
        "ir_corpus_stats": f"""
WITH {_TOKS_CTE}
SELECT n_docs, CAST(round(avgdl * 10000) AS BIGINT) AS avgdl_q FROM corpus
""",
        "ir_term_df": f"WITH {_TOKS_CTE} SELECT term, df FROM term_stats",
    }
