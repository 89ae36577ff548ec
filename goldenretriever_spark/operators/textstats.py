"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst column expressions (regexp counts, arithmetic) so they run
inside whole-stage codegen at 100 TB and are exactly expressible in the DuckDB
oracle dialect. Reference analogs: clean_txt (data_preprocessing.py:46-53),
BasicTokenizer cleaning (bert_tokenization.py:268-380), word regex parse
(app/streamlit/importance.py:56-65).

Operators:
- token_count      whitespace tokens + a code-ish subtoken count
- quality_score    length / punctuation / uppercase / digit ratios -> score
- lang_id          marker-token heuristic over {en-ish, code-ish, cjk-ish}
- fingerprint      document fingerprint = lexicographic-min md5 over 3-token
                   shingles (minhash with one permutation) + whole-doc md5
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from goldenretriever_spark.tokenizer import SIMPLE_SPLIT_RE

TOKEN_RE = r"[^ \t\n\r]+"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def token_count_col(text: Column) -> Column:
    # count of whitespace-separated tokens; empty/blank -> 0
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), SIMPLE_SPLIT_RE))
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count_col(F.col("text")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_m"),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: doc length band + punctuation/digit/whitespace
    ratios, combined into a 0-100 integer score (quantized — hash-stable)."""
    d = _docs(spark, sf_dir)
    n_chars = F.length("text").cast("double")
    n_punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", "")).cast("double")
    n_digit = F.length(F.regexp_replace("text", r"[^0-9]", "")).cast("double")
    n_space = F.length(F.regexp_replace("text", r"[^ ]", "")).cast("double")
    n_tokens = token_count_col(F.col("text")).cast("double")
    avg_tok_len = F.when(n_tokens > 0, (n_chars - n_space) / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.when((n_tokens >= 5) & (n_tokens <= 5000), F.lit(40.0)).otherwise(F.lit(0.0))
        + F.when((avg_tok_len >= 2) & (avg_tok_len <= 12), F.lit(30.0)).otherwise(F.lit(0.0))
        + F.when(n_chars > 0, 30.0 * (1.0 - F.least(F.lit(1.0), (n_punct + n_digit) / n_chars)))
        .otherwise(F.lit(0.0))
    )
    return d.select(
        "doc_id",
        F.round(score).cast("long").alias("quality"),
        F.round(avg_tok_len * 100).cast("long").alias("avg_tok_len_q"),
    )


LANG_MARKERS = {
    "en": ["the", "a", "and", "of"],
    "code": ["def", "return", "import", "class", "var", "func"],
}


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language heuristic: count hits per marker set on the
    whitespace token stream; label = argmax with 'other' fallback (ties ->
    fixed precedence en > code > other)."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.lower(F.trim(F.col("text"))), SIMPLE_SPLIT_RE)
    counts = {
        # number of marker words present in the doc (count over the fixed
        # marker list, not the token stream — identical semantics in DuckDB's
        # len(list_filter(...)) form)
        lang: F.size(
            F.filter(
                F.array(*[F.lit(m) for m in markers]),
                lambda m: F.array_contains(toks, m),
            )
        )
        for lang, markers in LANG_MARKERS.items()
    }
    label = (
        F.when((counts["en"] > 0) & (counts["en"] >= counts["code"]), F.lit("en"))
        .when(counts["code"] > 0, F.lit("code"))
        .otherwise(F.lit("other"))
    )
    return d.select(
        "doc_id",
        counts["en"].cast("long").alias("en_hits"),
        counts["code"].cast("long").alias("code_hits"),
        label.alias("pred_lang"),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of the full text (exact identity, SURVEY
    F12) + min-shingle fingerprint (lexicographic min of md5 over 3-token
    shingles — a 1-permutation minhash; robust to local edits)."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.lower(F.trim(F.col("text"))), SIMPLE_SPLIT_RE)
    n = F.size(toks)
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(n - 3, F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, 3))),
    )
    return d.select(
        "doc_id",
        F.md5("text").alias("md5"),
        F.array_min(shingles).alias("min_shingle_fp"),
    )


# Gopher-style rule thresholds (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Table A1 — adapted to
# this corpus's scale: token-count band, mean-word-length band, symbol
# ratio, stopword evidence). All pure column arithmetic.
QF_MIN_TOKENS, QF_MAX_TOKENS = 5, 5000
QF_MIN_AVG_TOK, QF_MAX_AVG_TOK = 2.0, 12.0
QF_MAX_SYMBOL_RATIO = 0.2
QF_STOPWORDS = ["the", "a", "and", "of"]
QF_MIN_STOPWORD_HITS = 1


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality FILTER (Gopher rules): per-doc boolean
    flags for each rule plus the conjunctive keep decision. Unlike
    q_quality_score (a ranking signal) this is the pipeline gate that
    decides which documents enter a training corpus; flags are kept as
    columns so drop REASONS are auditable at 100 TB (one pass, codegen)."""
    d = _docs(spark, sf_dir)
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), SIMPLE_SPLIT_RE),
        lambda x: x != F.lit(""),
    )
    n_tokens = F.size(toks).cast("double")
    n_chars = F.length("text").cast("double")
    n_space = F.length(F.regexp_replace("text", r"[^ ]", "")).cast("double")
    n_sym = F.length(F.regexp_replace("text", r"[A-Za-z0-9 \t\n]", "")).cast("double")
    avg_tok = F.when(n_tokens > 0, (n_chars - n_space) / n_tokens).otherwise(F.lit(0.0))
    # distinct stopword hits, counted over the fixed marker list (same
    # DuckDB-identical formulation as q_lang_id)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in QF_STOPWORDS]),
            lambda m: F.array_contains(toks, m),
        )
    )
    f_len = (n_tokens >= QF_MIN_TOKENS) & (n_tokens <= QF_MAX_TOKENS)
    f_avg = (avg_tok >= QF_MIN_AVG_TOK) & (avg_tok <= QF_MAX_AVG_TOK)
    f_sym = F.when(n_chars > 0, n_sym / n_chars <= QF_MAX_SYMBOL_RATIO).otherwise(
        F.lit(False)
    )
    f_stop = stop_hits >= QF_MIN_STOPWORD_HITS
    return d.select(
        "doc_id",
        f_len.cast("long").alias("pass_len"),
        f_avg.cast("long").alias("pass_avg_tok"),
        f_sym.cast("long").alias("pass_symbol"),
        f_stop.cast("long").alias("pass_stopword"),
        (f_len & f_avg & f_sym & f_stop).cast("long").alias("kept"),
    )
