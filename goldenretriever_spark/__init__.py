"""goldenretriever_spark — a PySpark-native inverted-index + BM25 retrieval engine.

A from-scratch re-expression of the retrieval semantics of
aisingapore/goldenretriever (reference: /root/reference, dense-embedding QA
lookup over pandas + Annoy + Elasticsearch) as an idiomatic Spark engine:

- corpus:      deterministic synthetic source-code corpus (input_hint shape) and
               adapters for the driver's ``documents`` parquet table
- tokenizer:   JVM-side simple tokenizer (pure Catalyst expressions) and a
               code-aware vectorized pandas-UDF tokenizer
- index:       posting-list construction (term, doc_id, tf), doc/corpus stats,
               delta-gap + varint block compression, salted skew handling,
               per-partition checkpoints with lineage + metrics
- query:       brute-force BM25 (pure column arithmetic, whole-stage codegen)
               and block-max WAND pruned top-k over the compressed index
- oracle:      single-node pure-Python BM25 oracle for rank-identity tests
- operators:   the reference's relational operator surface (joins, rollups,
               windows, set ops, dedup, text stats, ANN) as DataFrame programs

Everything here derives from public knowledge only: the Apache Spark / PySpark
API, the reference repo, and published IR literature (BM25: Robertson &
Zaragoza 2009; block-max WAND: Ding & Suel SIGIR 2011).
"""

__version__ = "0.1.0"

from goldenretriever_spark.session import get_spark  # noqa: F401
