"""PDF ingestion (SURVEY S5 + F7): binaryFile scan -> text extraction ->
paragraph split -> kb tables.

Reference semantics (kb_handler.py:273-314 ``parse_pdf``):
1. tika extracts the text of the whole PDF
2. an optional header regex is removed, "this is end of document." appended
3. the trailing ``NumOfAppendix`` "\\n\\nAPPENDIX " sections are dropped
4. page-number runs ``(\\d)+(\\-(\\d)+)+`` become paragraph boundaries
5. paragraphs are stripped, inner newlines removed, whitespace-only dropped,
   and the FIRST paragraph (title block) discarded
6. the clause list becomes a kb (responses only, no queries)

Spark-first re-expression: ``spark.read.format('binaryFile')`` scans the PDF
corpus distributed (one task per file group, content as an opaque binary
column — same pattern as operators/multimodal.py); extraction runs as an
Arrow-batched ``mapInPandas`` with a pluggable extractor; steps 2-5 are pure
Catalyst regexp/split/explode expressions — no Python in the paragraph path.

The sandbox has no tika/pypdf, so the default extractor is an HONEST STUB
(NotImplementedError). ``fake_text_extractor`` decodes ``FAKEPDF:``-prefixed
payloads so the full pipeline (scan schema, batch shape, paragraph Catalyst
ops, kb build) is exercised end-to-end in tests; a real deployment plugs
``lambda buf: tika.parser.from_buffer(buf)['content']`` into the same seam.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FAKE_MAGIC = b"FAKEPDF:"
PAGE_NUM_RE = r"[0-9]+(\-[0-9]+)+"  # the reference's (\d)+(\-(\d)+)+ boundary


def real_text_extractor(buf: bytes) -> str:
    """Placeholder for a real PDF text extractor (tika/pypdf). Neither
    library ships in this container — plug one in at deployment."""
    raise NotImplementedError(
        "no PDF codec in this environment; use fake_text_extractor for tests "
        "or inject tika.parser/pypdf at deployment"
    )


def fake_text_extractor(buf: bytes) -> str:
    """Deterministic test extractor: FAKEPDF:<utf-8 text> payloads."""
    b = bytes(buf)
    if not b.startswith(FAKE_MAGIC):
        raise ValueError("not a FAKEPDF payload")
    return b[len(FAKE_MAGIC):].decode("utf-8")


def scan_pdfs(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed binary scan: (path, modificationTime, length, content)."""
    return spark.read.format("binaryFile").load(path_glob)


def extract_text(
    pdfs: DataFrame,
    extractor: Callable[[bytes], str] = real_text_extractor,
) -> DataFrame:
    """(path, content:binary) -> (path, text) via Arrow-batched mapInPandas.
    One extractor call per document inside the batch loop — the binary codec
    is inherently per-file; the surrounding plumbing is vectorized."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "text": [extractor(b) for b in pdf["content"]],
                }
            )

    return pdfs.select("path", "content").mapInPandas(run, schema="path string, text string")


def pdf_paragraphs(
    texts: DataFrame,
    header: str = "",
    num_appendix: int = 0,
) -> DataFrame:
    """(path, text) -> (path, par_idx, clause): the reference's paragraph
    pipeline as Catalyst expressions (kb_handler.py:286-311).

    posexplode keeps the paragraph index so 'drop the first paragraph'
    (the title block) is a filter, not a window.
    """
    s = F.trim(F.col("text"))
    if header:
        s = F.regexp_replace(s, header, "")
    s = F.concat(s, F.lit("this is end of document."))
    if num_appendix > 0:
        # drop the trailing N appendix sections, rejoin with ' '
        parts = F.split(s, r"\n\nAPPENDIX ")
        kept = F.slice(parts, 1, F.greatest(F.size(parts) - num_appendix, F.lit(1)))
        s = F.concat_ws(" ", kept)
    # page-number runs are the paragraph boundaries
    paragraphs = F.split(F.regexp_replace(s, PAGE_NUM_RE, " newparagraph "), "newparagraph")
    ex = texts.select("path", F.posexplode(paragraphs).alias("par_idx", "raw_par"))
    clause = F.regexp_replace(F.trim(F.col("raw_par")), r"\n", "")
    return (
        ex.filter(F.col("par_idx") > 0)  # reference pops the first paragraph
        .select("path", "par_idx", clause.alias("clause"))
        .filter(F.length("clause") > 0)
    )


def parse_pdf(
    spark: SparkSession,
    path_glob: str,
    header: str = "",
    num_appendix: int = 0,
    kb_name: str = "pdf_kb",
    extractor: Callable[[bytes], str] = real_text_extractor,
) -> dict[str, DataFrame]:
    """PDF corpus -> kb tables (responses only; queries arrive separately,
    matching the reference's clause-df path)."""
    from goldenretriever_spark.sources.kb import build_kb

    pars = pdf_paragraphs(
        extract_text(scan_pdfs(spark, path_glob), extractor), header, num_appendix
    )
    qa = pars.select(
        F.lit(None).cast("string").alias("query_string"),
        F.col("clause").alias("raw_string"),
        F.lit("").alias("context_string"),
    )
    return build_kb(qa, kb_name)
