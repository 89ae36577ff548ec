"""Persisted positional postings: compressed (term, doc_id, positions) blocks.

Phrase and proximity search (query/phrase.py) consume ``(term, doc_id, pos)``
rows. Serving them by re-tokenizing the corpus per query is a full scan — the
one scale-killer the r5 audit named. This module persists the positional
postings ONCE at index-build time, in the same shape as the BM25 posting
blocks (index/blocks.py): fixed-size doc-aligned blocks, salted
repartition-by-term for hot-term skew, delta-gap + varint compression
(index/codec.py — positions are sorted ints exactly like doc-id runs), and
``term_bucket`` partitioning so a phrase query's scan prunes to the buckets
holding its terms.

The reference engine has no positional index at all (its retrieval is
embedding / bag-of-words, /root/reference/src/models.py:114-149); the layout
here is the classic Lucene positional-postings design re-expressed as a
columnar Spark table.

Block schema::

    positional_blocks(term, salt, block_id, n, doc_id_min, doc_id_max,
                      doc_ids_delta_varint, pos_counts_varint,
                      positions_delta_varint, term_bucket)

- one block covers up to ``block_docs`` consecutive docs of one (term, salt)
  group, doc_ids ascending (signed order, the engine-wide tie discipline)
- ``doc_ids_delta_varint``: the block's doc ids, delta-gap + varint
- ``pos_counts_varint``: positions-per-doc counts (== tf), varint
- ``positions_delta_varint``: all the block's token positions concatenated
  doc-major, delta-encoded WITH A RESET at each doc boundary, varint

Skew: the salt is the same contiguous top-16-bit doc_id-range split as
blocks.py, sized by COLLECTION frequency (total positions, not df) because a
positional group's row count is Σtf, not doc count — a scorching-hot term
("def") splits into bounded, ordered, disjoint ranges with no extra shuffle
stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from goldenretriever_spark.index.blocks import MAX_SALTS, SALT_SPACE
from goldenretriever_spark.index.codec import (
    delta_decode_grouped,
    delta_encode_grouped,
    varint_decode_many,
    varint_encode_grouped,
)

BLOCK_DOCS = 128

POS_BLOCKS_SCHEMA = (
    "term string, salt int, block_id long, n int, "
    "doc_id_min long, doc_id_max long, "
    "doc_ids_delta_varint binary, pos_counts_varint binary, "
    "positions_delta_varint binary, term_bucket int"
)


def positional_rows(
    documents: DataFrame, tokenizer: str = "simple"
) -> DataFrame:
    """input_hint corpus -> (term, doc_id, pos) rows, one per token.

    ``posexplode`` over the tokenized content emits the 0-based token index
    for free — map-side only, no shuffle, no Python."""
    from goldenretriever_spark.index.build import tokenized

    return tokenized(documents, tokenizer).select(
        "doc_id", F.posexplode("tokens").alias("pos", "term")
    ).select("term", "doc_id", "pos")


def term_cf(rows: DataFrame) -> DataFrame:
    """(term, cf) collection frequencies from positional rows. The groupBy
    partially aggregates map-side, so the shuffle is vocab-sized regardless
    of corpus size. Builders that already hold cached BM25 postings should
    pass ``index.postings.groupBy('term').agg(sum(tf))`` instead and skip
    this second pass over the tokens."""
    return rows.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("cf"))


def pack_positions(
    rows: DataFrame,
    cf: DataFrame,
    target_positions_per_group: int = 1_000_000,
    n_term_buckets: int = 64,
    block_docs: int = BLOCK_DOCS,
    pack_partitions: int | None = None,
) -> DataFrame:
    """(term, doc_id, pos) rows -> compressed positional blocks.

    Same one-shuffle pack shape as blocks.pack_enriched: join the broadcast
    vocab-sized ``cf`` frame for the adaptive salt, ``repartition(P, term,
    salt)`` + ``sortWithinPartitions(term, salt, doc_id, pos)`` so every
    (term, salt) group is one contiguous doc-major sorted run inside exactly
    one partition, then ONE mapInPandas pass packs all of a partition's
    groups with whole-array numpy (no per-block or per-doc Python loops).
    """
    spark = rows.sparkSession
    P = pack_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    # Only terms hot enough to need MORE than one salt group matter to the
    # salt computation (cf < target -> ceil(cf/target) = 1 -> salt 0), and
    # those are the vocabulary HEAD — a handful of rows. Broadcasting just
    # the hot slice instead of the full vocab-sized cf frame keeps the
    # per-row probe against a tiny map and the broadcast build O(hot terms)
    # (r7, guide §3.1; the full-cf aggregate still runs once to FIND the
    # hot terms, but never ships per-row).
    hot_cf = cf.filter(F.col("cf") >= target_positions_per_group)
    enriched = (
        rows.join(F.broadcast(hot_cf), "term", "left")
        .withColumn(
            "n_salts",
            F.least(
                F.lit(MAX_SALTS),
                F.coalesce(
                    F.ceil(F.col("cf") / F.lit(target_positions_per_group)),
                    F.lit(1),
                ),
            ).cast("int"),
        )
        .withColumn(
            "u16", (F.shiftright(F.col("doc_id"), 48) + F.lit(32768)).cast("long")
        )
        .withColumn(
            "salt",
            F.floor(F.col("u16") * F.col("n_salts") / F.lit(SALT_SPACE)).cast("int"),
        )
        # shuffle-byte discipline (r7, guide §2.3): term_bucket is a pure
        # function of term, so it is attached AFTER packing (block rows are
        # ~1/block_docs of the position rows) instead of riding the exchange
        # and the Arrow boundary on every token row
        .select("term", "salt", "doc_id", "pos")
    )

    def pack_partition(batches):
        batches = list(batches)
        if not batches:
            return
        pdf = pd.concat(batches, ignore_index=True)
        if pdf.empty:
            return
        terms = pdf["term"].to_numpy()
        salts = pdf["salt"].to_numpy(dtype=np.int64)
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        poss = pdf["pos"].to_numpy(dtype=np.int64)
        n_rows = len(pdf)

        # doc-run boundaries over the (term, salt, doc_id, pos)-sorted rows
        doc_change = np.empty(n_rows, dtype=bool)
        doc_change[0] = True
        doc_change[1:] = (
            (terms[1:] != terms[:-1])
            | (salts[1:] != salts[:-1])
            | (ids[1:] != ids[:-1])
        )
        doc_starts = np.flatnonzero(doc_change)
        doc_ends = np.append(doc_starts[1:], n_rows)
        pos_counts = (doc_ends - doc_starts).astype(np.uint64)
        d_ids = ids[doc_starts]
        d_terms = terms[doc_starts]
        d_salts = salts[doc_starts]
        nd = doc_starts.size

        # (term, salt) group boundaries at the doc level, then block split:
        # a block starts at every group start and every block_docs-th doc
        # within its group (identical split logic to blocks.pack_enriched)
        g_change = np.empty(nd, dtype=bool)
        g_change[0] = True
        g_change[1:] = (d_terms[1:] != d_terms[:-1]) | (d_salts[1:] != d_salts[:-1])
        g_starts = np.flatnonzero(g_change)
        g_sizes = np.diff(np.append(g_starts, nd))
        g_start_per_doc = np.repeat(g_starts, g_sizes)
        off = np.arange(nd, dtype=np.int64) - g_start_per_doc
        blk_d_starts = np.flatnonzero(off % block_docs == 0)
        blk_d_ends = np.append(blk_d_starts[1:], nd)
        local = off[blk_d_starts] // block_docs
        salts_b = d_salts[blk_d_starts]

        # row-level block boundaries for the positions buffer: blocks tile
        # the doc runs contiguously, so each block's rows are one slice
        blk_r_starts = doc_starts[blk_d_starts]
        blk_r_ends = np.append(blk_r_starts[1:], n_rows)
        # positions delta-encoded with a reset at EVERY doc boundary — the
        # decode rebuilds per-doc runs from pos_counts alone
        pos_deltas = delta_encode_grouped(poss, doc_starts)

        yield pd.DataFrame(
            {
                "term": d_terms[blk_d_starts],
                "salt": salts_b,
                "block_id": (salts_b << 32) | local,
                "n": (blk_d_ends - blk_d_starts).astype(np.int32),
                "doc_id_min": d_ids[blk_d_starts],
                "doc_id_max": d_ids[blk_d_ends - 1],
                "doc_ids_delta_varint": varint_encode_grouped(
                    delta_encode_grouped(d_ids, blk_d_starts),
                    blk_d_starts,
                    blk_d_ends,
                ),
                "pos_counts_varint": varint_encode_grouped(
                    pos_counts, blk_d_starts, blk_d_ends
                ),
                "positions_delta_varint": varint_encode_grouped(
                    pos_deltas, blk_r_starts, blk_r_ends
                ),
            }
        )

    pack_schema = POS_BLOCKS_SCHEMA.rsplit(", term_bucket int", 1)[0]
    return (
        enriched.repartition(P, "term", "salt")
        .sortWithinPartitions("term", "salt", "doc_id", "pos")
        .mapInPandas(pack_partition, schema=pack_schema)
        .withColumn(
            "term_bucket",
            F.pmod(F.xxhash64("term"), F.lit(n_term_buckets)).cast("int"),
        )
    )


def pack_positional_blocks(
    documents: DataFrame,
    tokenizer: str = "simple",
    postings: DataFrame | None = None,
    target_positions_per_group: int = 1_000_000,
    n_term_buckets: int = 64,
    block_docs: int = BLOCK_DOCS,
    pack_partitions: int | None = None,
) -> DataFrame:
    """Convenience: corpus -> compressed positional blocks in one plan.

    ``postings``: pass the (usually cached) BM25 postings to derive the
    salt's collection frequencies as Σtf per term — avoids a second
    tokenize pass; without it, cf comes from the rows themselves."""
    rows = positional_rows(documents, tokenizer)
    if postings is not None:
        cf = postings.groupBy("term").agg(F.sum("tf").cast("long").alias("cf"))
    else:
        cf = term_cf(rows)
    return pack_positions(
        rows,
        cf,
        target_positions_per_group=target_positions_per_group,
        n_term_buckets=n_term_buckets,
        block_docs=block_docs,
        pack_partitions=pack_partitions,
    )


def decode_positions(blocks: DataFrame) -> DataFrame:
    """positional blocks -> (term, doc_id, pos) rows via one vectorized
    mapInPandas decode (batched varint passes — codec.varint_decode_many —
    so per-block numpy call overhead never dominates)."""
    cols = [
        "term",
        "doc_ids_delta_varint",
        "pos_counts_varint",
        "positions_delta_varint",
    ]

    def unpack(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            id_deltas, docs_per_block = varint_decode_many(
                [bytes(b) for b in pdf["doc_ids_delta_varint"]]
            )
            docs_per_block = docs_per_block.astype(np.int64)
            ids = delta_decode_grouped(id_deltas, docs_per_block)
            cnts, _ = varint_decode_many(
                [bytes(b) for b in pdf["pos_counts_varint"]]
            )
            cnts_i = cnts.astype(np.int64)
            pos_deltas, _ = varint_decode_many(
                [bytes(b) for b in pdf["positions_delta_varint"]]
            )
            positions = delta_decode_grouped(pos_deltas, cnts_i)
            doc_per_pos = np.repeat(ids, cnts_i)
            # positions per block = Σ per-doc counts, segmented by block
            block_doc_starts = np.zeros(docs_per_block.size, dtype=np.int64)
            np.cumsum(docs_per_block[:-1], out=block_doc_starts[1:])
            pos_per_block = (
                np.add.reduceat(cnts_i, block_doc_starts)
                if cnts_i.size
                else np.zeros(0, dtype=np.int64)
            )
            term_per_pos = np.repeat(pdf["term"].to_numpy(), pos_per_block)
            if doc_per_pos.size == 0:
                continue
            yield pd.DataFrame(
                {
                    "term": term_per_pos,
                    "doc_id": doc_per_pos,
                    "pos": positions.astype(np.int64),
                }
            )

    return blocks.select(*cols).mapInPandas(
        unpack, schema="term string, doc_id long, pos long"
    )


def decode_phrase_votes(
    blocks: DataFrame, phrases: list[tuple[int, list[str]]]
) -> DataFrame:
    """Positional blocks -> phrase start-votes ``(query_id, doc_id, start)``
    in ONE worker pass (r7, guide §4.2).

    Fuses :func:`decode_positions` with the vote expansion that used to be a
    JVM broadcast join: each decoded position of term t emits one row per
    (query_id, offset) pair whose phrase contains t, with
    ``start = pos - offset``. Exactly the row multiset the join produced
    (same uniqueness argument: (start, offset) determines pos), but term
    strings never cross Arrow back to the JVM and the downstream plan needs
    no join — callers repartition by (query_id, doc_id) once and run both
    vote aggregations exchange-free (query/phrase.phrase_match_stored_batch).

    The expansion loop is per (term, query, offset) — bounded by the QUERY
    batch size, never by data volume; inside it everything is whole-array
    numpy over the term's decoded positions.
    """
    term2qo: dict[str, list[tuple[int, int]]] = {}
    for qid, ph in phrases:
        for off, t in enumerate(ph):
            term2qo.setdefault(t, []).append((qid, off))

    cols = [
        "term",
        "doc_ids_delta_varint",
        "pos_counts_varint",
        "positions_delta_varint",
    ]

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            id_deltas, docs_per_block = varint_decode_many(
                [bytes(b) for b in pdf["doc_ids_delta_varint"]]
            )
            docs_per_block = docs_per_block.astype(np.int64)
            ids = delta_decode_grouped(id_deltas, docs_per_block)
            cnts, _ = varint_decode_many([bytes(b) for b in pdf["pos_counts_varint"]])
            cnts_i = cnts.astype(np.int64)
            pos_deltas, _ = varint_decode_many(
                [bytes(b) for b in pdf["positions_delta_varint"]]
            )
            positions = delta_decode_grouped(pos_deltas, cnts_i)
            doc_per_pos = np.repeat(ids, cnts_i)
            if doc_per_pos.size == 0:
                continue
            # positions per block = Σ per-doc counts, segmented by block
            block_doc_starts = np.zeros(docs_per_block.size, dtype=np.int64)
            np.cumsum(docs_per_block[:-1], out=block_doc_starts[1:])
            pos_per_block = np.add.reduceat(cnts_i, block_doc_starts)
            # per-term position slices via a term-code indirection (no
            # per-position string materialization)
            term_codes, uniq_terms = pd.factorize(pdf["term"])
            code_per_pos = np.repeat(term_codes, pos_per_block)
            q_parts: list[np.ndarray] = []
            d_parts: list[np.ndarray] = []
            s_parts: list[np.ndarray] = []
            for code, term in enumerate(uniq_terms):
                pairs = term2qo.get(term)
                if not pairs:
                    continue
                mask = code_per_pos == code
                t_pos = positions[mask]
                t_doc = doc_per_pos[mask]
                if t_pos.size == 0:
                    continue
                for qid, off in pairs:
                    q_parts.append(np.full(t_pos.size, qid, dtype=np.int64))
                    d_parts.append(t_doc)
                    s_parts.append(t_pos - off)
            if not q_parts:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(q_parts),
                    "doc_id": np.concatenate(d_parts),
                    "start": np.concatenate(s_parts),
                }
            )

    return blocks.select(*cols).mapInPandas(
        gen, schema="query_id long, doc_id long, start long"
    )


def decode_position_codes(blocks: DataFrame, terms: list[str]) -> DataFrame:
    """Positional blocks -> (code, doc_id, pos) rows where ``code`` is the
    index of the block's term in ``terms`` — the stored proximity path's
    decode (query/phrase.proximity_match_stored). Same vectorized decode as
    :func:`decode_positions`, but an int term code crosses Arrow instead of
    a repeated term string (r7, guide §4.2); rows whose term is not in
    ``terms`` are dropped (the pruned scan normally contains none)."""
    code_of = {t: i for i, t in enumerate(terms)}
    cols = [
        "term",
        "doc_ids_delta_varint",
        "pos_counts_varint",
        "positions_delta_varint",
    ]

    def unpack(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            id_deltas, docs_per_block = varint_decode_many(
                [bytes(b) for b in pdf["doc_ids_delta_varint"]]
            )
            docs_per_block = docs_per_block.astype(np.int64)
            ids = delta_decode_grouped(id_deltas, docs_per_block)
            cnts, _ = varint_decode_many([bytes(b) for b in pdf["pos_counts_varint"]])
            cnts_i = cnts.astype(np.int64)
            pos_deltas, _ = varint_decode_many(
                [bytes(b) for b in pdf["positions_delta_varint"]]
            )
            positions = delta_decode_grouped(pos_deltas, cnts_i)
            doc_per_pos = np.repeat(ids, cnts_i)
            if doc_per_pos.size == 0:
                continue
            block_doc_starts = np.zeros(docs_per_block.size, dtype=np.int64)
            np.cumsum(docs_per_block[:-1], out=block_doc_starts[1:])
            pos_per_block = np.add.reduceat(cnts_i, block_doc_starts)
            codes_per_block = np.array(
                [code_of.get(t, -1) for t in pdf["term"]], dtype=np.int64
            )
            code_per_pos = np.repeat(codes_per_block, pos_per_block)
            keep = code_per_pos >= 0
            if not keep.all():
                code_per_pos = code_per_pos[keep]
                doc_per_pos = doc_per_pos[keep]
                positions = positions[keep]
            if doc_per_pos.size == 0:
                continue
            yield pd.DataFrame(
                {
                    "code": code_per_pos,
                    "doc_id": doc_per_pos,
                    "pos": positions.astype(np.int64),
                }
            )

    return blocks.select(*cols).mapInPandas(
        unpack, schema="code long, doc_id long, pos long"
    )


def prune_blocks_for_terms(
    blocks: DataFrame, terms: list[str], n_term_buckets: int | None
) -> DataFrame:
    """Restrict a positional-blocks frame to the given query terms.

    Two pruning layers, mirroring query/wand.py's stored-path scan: the
    ``term_bucket`` isin filter prunes PARTITION DIRECTORIES (only the
    buckets holding query terms are ever listed/read — the reason the layout
    partitions by term_bucket), then the term equi-filter prunes rows via
    parquet min/max. Bucket ids come from the pytest-locked driver-side
    XXH64 twin (goldenretriever_spark/xxh64.py) — zero Spark jobs; the r6
    one-row createDataFrame+collect job cost ~100 ms per call."""
    if terms and n_term_buckets and "term_bucket" in blocks.columns:
        from goldenretriever_spark.xxh64 import term_buckets

        blocks = blocks.filter(
            F.col("term_bucket").isin(term_buckets(terms, n_term_buckets))
        )
    return blocks.filter(F.col("term").isin(list(terms)))
