"""Corpus: the engine's input table and deterministic synthetic generation.

Authoritative input shape (BASELINE.json ``input_hint``):
    documents(repo:string, path:string, commit:string, lang:string, content:string)

This replaces the reference's kb/responses pandas tables
(/root/reference/src/data_handler/kb_handler.py:56-62,146-153) and its
Elasticsearch doc index (/root/reference/src/elasticsearch/create_doc_index.py:46-69)
with a single columnar table.

Two entry points:
- ``synth_corpus(spark, n_docs, seed)``  — seeded synthetic source-code corpus
  in the exact input_hint shape; content mixes language keywords (Zipfian,
  including scorching-hot ``def``/``return``/``import`` to exercise skew
  salting), camelCase + snake_case identifiers (exercises code-aware
  sub-token splitting), string literals, comments, and some unicode.
- ``driver_documents(spark, sf_dir)``    — adapts the driver testdata table
  (doc_id, text, lang, source, n_chars) into the input_hint shape, keeping the
  driver's doc_id for oracle comparability.

doc_id assignment for input_hint corpora is ``xxhash64(repo, path, commit)``:
O(1) per row, deterministic, fully distributed (no global sort / row_number
shuffle), collision-checked at build time. At 10^12 files a 64-bit hash has
a ~2.7% birthday-collision chance per full corpus; the build detects and
deterministically rehashes collisions (see index/build.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- synthetic generation vocabulary (all deterministic, seed-controlled) ---

LANGS = ["python", "java", "scala", "go", "js"]
LANG_WEIGHTS = [0.45, 0.2, 0.15, 0.1, 0.1]
LANG_EXT = {"python": "py", "java": "java", "scala": "scala", "go": "go", "js": "js"}

# ultra-hot terms first: Zipfian sampling makes the head terms appear in a
# large fraction of documents, which is the skew the salted repartition and
# block-max WAND paths must handle.
KEYWORDS = [
    "def", "return", "import", "class", "if", "else", "for", "while", "try",
    "except", "lambda", "yield", "public", "static", "void", "final", "func",
    "var", "val", "let", "const", "interface", "struct", "package", "match",
    "case", "object", "trait", "async", "await", "raise", "with", "elif",
]

IDENT_STEMS = [
    "user", "query", "index", "token", "score", "batch", "merge", "shard",
    "block", "posting", "doc", "term", "cache", "buffer", "stream", "vector",
    "handler", "service", "client", "config", "parser", "writer", "reader",
    "graph", "node", "edge", "hash", "sketch", "filter", "window", "offset",
]

COMMENT_WORDS = [
    "todo", "fixme", "note", "returns", "the", "a", "and", "computes",
    "deprecated", "thread", "safe", "naive", "approximation", "café",  # unicode
    "résumé",
]


def _zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = 1.0 / ranks**s
    return p / p.sum()


def synth_corpus_pandas(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Generate the synthetic corpus as a pandas DataFrame (driver-side for
    tests; identical rows to the distributed Spark path)."""
    return synth_corpus_pandas_range(0, n_docs, seed)


def synth_corpus(spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Synthetic corpus as a Spark DataFrame.

    Generation is distributed: each partition seeds its own RNG from
    (seed, partition_id) so the corpus is deterministic for a given
    (n_docs, seed, partitions) regardless of cluster size — the property a
    10^12-file generator needs (no driver-side materialization).
    """
    if partitions is None:
        partitions = max(1, min(64, n_docs // 250 or 1))
    counts = [n_docs // partitions + (1 if p < n_docs % partitions else 0) for p in range(partitions)]
    offsets = np.concatenate([[0], np.cumsum(counts)]).tolist()
    meta = spark.createDataFrame(
        [(p, int(offsets[p]), int(counts[p])) for p in range(partitions)],
        "pid int, start long, cnt int",
    ).repartition(partitions, "pid")

    def gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                sub = synth_corpus_pandas_range(int(row["start"]), int(row["cnt"]), seed)
                yield sub

    return meta.mapInPandas(gen, schema="repo string, path string, commit string, lang string, content string")


def synth_corpus_pandas_range(start: int, count: int, seed: int) -> pd.DataFrame:
    """Rows [start, start+count) of the seeded corpus, each row seeded
    independently by (seed, i) so any range reproduces identically."""
    frames = []
    for i in range(start, start + count):
        frames.append(_synth_one(i, seed))
    if not frames:
        return pd.DataFrame(columns=["repo", "path", "commit", "lang", "content"])
    return pd.DataFrame(frames, columns=["repo", "path", "commit", "lang", "content"])


def _synth_one(i: int, seed: int) -> dict:
    rng = np.random.default_rng([seed, i])
    kw_p = _zipf_probs(len(KEYWORDS))
    stem_p = _zipf_probs(len(IDENT_STEMS), s=0.9)
    lang = LANGS[int(rng.choice(len(LANGS), p=LANG_WEIGHTS))]
    n_tokens = int(rng.integers(20, 200))
    parts: list[str] = []
    for _ in range(n_tokens):
        r = rng.random()
        if r < 0.45:
            parts.append(KEYWORDS[int(rng.choice(len(KEYWORDS), p=kw_p))])
        elif r < 0.75:
            a = IDENT_STEMS[int(rng.choice(len(IDENT_STEMS), p=stem_p))]
            b = IDENT_STEMS[int(rng.choice(len(IDENT_STEMS), p=stem_p))]
            parts.append(f"{a}_{b}" if rng.random() < 0.5 else a + b.capitalize())
        elif r < 0.85:
            parts.append(f'"{IDENT_STEMS[int(rng.choice(len(IDENT_STEMS)))]}"')
        elif r < 0.95:
            parts.append(f"# {COMMENT_WORDS[int(rng.choice(len(COMMENT_WORDS)))]}")
        else:
            parts.append(str(int(rng.integers(0, 10000))))
        if rng.random() < 0.12:
            parts.append("\n")
    return {
        "repo": f"org{i % 20}/proj{i % 97}",
        "path": f"src/{IDENT_STEMS[i % len(IDENT_STEMS)]}/mod{i}.{LANG_EXT[lang]}",
        "commit": "".join(rng.choice(list("0123456789abcdef"), size=40)),
        "lang": lang,
        "content": " ".join(parts),
    }


# --- seeded reference query set (FIXTURES.md §5) ---

def reference_queries(n_queries: int = 50, seed: int = 42) -> pd.DataFrame:
    """~50 seeded queries, 1-6 terms each: hot terms, rare identifiers,
    absent terms, multi-term conjunctions."""
    rng = np.random.default_rng([seed, 10_000_019])
    vocab_hot = KEYWORDS[:6]
    vocab_mid = IDENT_STEMS
    vocab_absent = ["zzzmissing", "notindex", "qqq"]
    rows = []
    for qid in range(n_queries):
        n_terms = int(rng.integers(1, 7))
        terms = []
        for _ in range(n_terms):
            r = rng.random()
            if r < 0.4:
                terms.append(vocab_hot[int(rng.integers(0, len(vocab_hot)))])
            elif r < 0.9:
                terms.append(vocab_mid[int(rng.integers(0, len(vocab_mid)))])
            else:
                terms.append(vocab_absent[int(rng.integers(0, len(vocab_absent)))])
        rows.append({"query_id": qid, "query_str": " ".join(terms)})
    return pd.DataFrame(rows, columns=["query_id", "query_str"])


def fixed_length_queries(
    n_queries: int = 50, n_terms: int = 3, seed: int = 42
) -> pd.DataFrame:
    """Seeded queries with EXACTLY n_terms terms each — the control knob for
    the WAND crossover sweep (k x query-length cells): same hot/mid/absent
    term mixture as reference_queries, length held fixed."""
    rng = np.random.default_rng([seed, 10_000_019, n_terms])
    vocab_hot = KEYWORDS[:6]
    vocab_mid = IDENT_STEMS
    vocab_absent = ["zzzmissing", "notindex", "qqq"]
    rows = []
    for qid in range(n_queries):
        terms = []
        for _ in range(n_terms):
            r = rng.random()
            if r < 0.4:
                terms.append(vocab_hot[int(rng.integers(0, len(vocab_hot)))])
            elif r < 0.9:
                terms.append(vocab_mid[int(rng.integers(0, len(vocab_mid)))])
            else:
                terms.append(vocab_absent[int(rng.integers(0, len(vocab_absent)))])
        rows.append({"query_id": qid, "query_str": " ".join(terms)})
    return pd.DataFrame(rows, columns=["query_id", "query_str"])


# --- driver testdata adapter ---

def driver_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the driver's documents.parquet and adapt to the input_hint shape,
    preserving the driver's doc_id (used by oracle_sql comparisons)."""
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return raw.select(
        F.col("doc_id"),
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.sha2(F.concat_ws("|", "source", F.col("doc_id").cast("string")), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
