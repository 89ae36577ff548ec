"""Persisted positional index (index/positions.py): pack/decode roundtrip,
stored-vs-scan identity for phrase and proximity search, StoredIndex
integration with term-bucket pruning, and block invariants under forced
salting/small blocks."""

import pytest
from pyspark.sql import functions as F

from goldenretriever_spark import corpus
from goldenretriever_spark.index.positions import (
    decode_positions,
    pack_positional_blocks,
    positional_rows,
    prune_blocks_for_terms,
)
from goldenretriever_spark.query.phrase import (
    phrase_match,
    phrase_match_stored,
    proximity_match,
    proximity_match_stored,
)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """120-doc synthetic corpus + packed positional blocks, with tiny blocks
    and a tiny salt target so multi-block and multi-salt paths are real."""
    raw = spark.createDataFrame(corpus.synth_corpus_pandas(120, seed=31))
    blocks = pack_positional_blocks(
        raw,
        tokenizer="simple",
        target_positions_per_group=64,
        n_term_buckets=8,
        block_docs=16,
    ).localCheckpoint(eager=True)
    return raw, blocks


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_pack_decode_roundtrip(spark, built):
    """decode(pack(corpus)) must reproduce the posexplode positional rows
    bit-exactly — every (term, doc_id, pos) token occurrence."""
    raw, blocks = built
    from goldenretriever_spark.index.build import tokenized

    expected = _rows(positional_rows(raw, "simple"))
    got = _rows(decode_positions(blocks))
    assert got == expected
    assert len(got) > 1000  # non-trivial corpus


def test_block_invariants(built):
    _, blocks = built
    rows = blocks.collect()
    assert rows, "no blocks packed"
    multi_salt_terms = set()
    for r in rows:
        assert 1 <= r["n"] <= 16
        assert r["doc_id_min"] <= r["doc_id_max"]
        assert 0 <= r["term_bucket"] < 8
        if r["salt"] > 0:
            multi_salt_terms.add(r["term"])
    # the tiny target forces hot terms into >1 salt group
    assert multi_salt_terms, "salting never engaged at target=64"
    # block_id unique per term (salt-major ordering)
    seen = set()
    for r in rows:
        key = (r["term"], r["block_id"])
        assert key not in seen
        seen.add(key)


PHRASES = [
    ["def", "def"],            # duplicate-term phrase, overlapping counts
    ["return", "None"],
    ["for", "i", "in"],
]


def test_stored_phrase_matches_scan(spark, built):
    raw, blocks = built
    docs = raw.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
    for ph in PHRASES:
        scan = _rows(phrase_match(docs, ph, text_col="content"))
        stored = _rows(phrase_match_stored(blocks, ph, n_term_buckets=8))
        assert stored == scan, f"phrase {ph} diverged"
    # at least one of the fixed phrases must actually match something
    assert any(
        _rows(phrase_match_stored(blocks, ph, n_term_buckets=8)) for ph in PHRASES
    )


def test_stored_proximity_matches_scan(spark, built):
    raw, blocks = built
    docs = raw.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
    cases = [(["def", "return"], 6), (["for", "in", "range"], 5)]
    for terms, w in cases:
        scan = _rows(proximity_match(docs, terms, w, text_col="content"))
        stored = _rows(proximity_match_stored(blocks, terms, w, n_term_buckets=8))
        assert stored == scan, f"proximity {terms} w={w} diverged"


def test_bucket_pruning_is_lossless(spark, built):
    """Pruning to the query terms' buckets must not change results vs an
    unpruned term filter (the bucket filter is a superset restriction)."""
    _, blocks = built
    ph = ["return", "None"]
    unpruned = _rows(phrase_match_stored(blocks, ph, n_term_buckets=None))
    pruned = _rows(phrase_match_stored(blocks, ph, n_term_buckets=8))
    assert pruned == unpruned
    # and the pruned frame really is term-restricted
    terms = {
        r["term"]
        for r in prune_blocks_for_terms(blocks, sorted(set(ph)), 8)
        .select("term").distinct().collect()
    }
    assert terms <= set(ph)


def test_stored_index_phrase_end_to_end(spark, tmp_path):
    """Full persistence loop: build -> write_index(positional=...) ->
    StoredIndex.phrase/proximity from disk, pruned by the persisted
    n_term_buckets, identical to the scan twins."""
    from goldenretriever_spark.index.blocks import pack_blocks
    from goldenretriever_spark.index.build import build_index, with_doc_ids
    from goldenretriever_spark.index.storage import StoredIndex, write_index

    raw = spark.createDataFrame(corpus.synth_corpus_pandas(80, seed=7))
    idx = build_index(raw, tokenizer="simple")
    blocks = pack_blocks(idx, block_size=16, target_docs_per_group=50)
    positional = pack_positional_blocks(
        raw, tokenizer="simple", postings=idx.postings,
        target_positions_per_group=500, n_term_buckets=8, block_docs=16,
    )
    path = str(tmp_path / "idx")
    write_index(idx, path, blocks=blocks, n_term_buckets=8, positional=positional)

    stored = StoredIndex(spark, path)
    assert stored.has_positional()
    docs = with_doc_ids(raw).select("doc_id", "content")
    ph = ["return", "None"]
    assert _rows(stored.phrase(ph)) == _rows(
        phrase_match(docs, ph, text_col="content")
    )
    terms, w = ["def", "return"], 8
    assert _rows(stored.proximity(terms, w)) == _rows(
        proximity_match(docs, terms, w, text_col="content")
    )


def test_has_positional_false_without_blocks(spark, tmp_path):
    from goldenretriever_spark.index.blocks import pack_blocks
    from goldenretriever_spark.index.build import build_index
    from goldenretriever_spark.index.storage import StoredIndex, write_index

    raw = spark.createDataFrame(corpus.synth_corpus_pandas(20, seed=9))
    idx = build_index(raw, tokenizer="simple")
    path = str(tmp_path / "idx")
    write_index(idx, path, blocks=pack_blocks(idx), n_term_buckets=8)
    assert not StoredIndex(spark, path).has_positional()


def test_phrase_ranked_topk_rank_identity(spark):
    """phrase_ranked_topk == a pure-Python reference (oracle BM25 over the
    phrase terms + sliding-window exact occurrence count, boosted by
    1.0*ln(1+occ), quantized x10000, score-desc/doc_id-asc top-k) on a
    randomized corpus — full rank identity including quantized scores."""
    import math

    from goldenretriever_spark.index.build import build_index, with_doc_ids
    from goldenretriever_spark.oracle import (
        bm25_score,
        build_oracle_index,
        simple_tokenize_text,
    )
    from goldenretriever_spark.query.phrase import phrase_ranked_topk

    raw = spark.createDataFrame(corpus.synth_corpus_pandas(150, seed=13))
    idx = build_index(raw, tokenizer="simple")
    blocks = pack_positional_blocks(
        raw, tokenizer="simple", postings=idx.postings,
        target_positions_per_group=512, n_term_buckets=8, block_docs=16,
    )
    phrases = [(1, ["def", "def"]), (2, ["return", "None"]), (3, ["for", "i", "in"])]
    got = {}
    res = phrase_ranked_topk(idx, blocks, phrases, k=10, boost=1.0, n_term_buckets=8)
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score_q"]))

    docs_id = with_doc_ids(raw).select("doc_id", "content").collect()
    oidx = build_oracle_index([(r["doc_id"], r["content"]) for r in docs_id])
    toks = {r["doc_id"]: simple_tokenize_text(r["content"]) for r in docs_id}
    for qid, ph in phrases:
        n = len(ph)
        cands = set()
        for t in set(ph):
            cands.update(oidx.postings.get(t, {}).keys())
        scored = []
        for d in cands:
            tk = toks[d]
            occ = sum(1 for s in range(len(tk) - n + 1) if tk[s:s + n] == ph)
            s = bm25_score(oidx, " ".join(ph), d) + 1.0 * math.log(1 + occ)
            scored.append((d, round(s * 10000)))
        scored.sort(key=lambda x: (-x[1], x[0]))
        expected = [(i + 1, d, sq) for i, (d, sq) in enumerate(scored[:10])]
        assert sorted(got.get(qid, [])) == sorted(expected), f"phrase {ph} diverged"
