"""Round-5 coverage: pinned trained-IVF codebook (oracle drift guard),
large-star/small-star connected components vs pointer doubling, and the
non-convergence guard ADVICE r4 asked for."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# trained-IVF codebook pin (VERDICT r4 #4)
# ---------------------------------------------------------------------------

def test_trained_codebook_matches_pinned(spark):
    """The sf0.01 k-means training must reproduce the literals the DuckDB
    oracle for ann_ivf_trained_topk was generated from — if this drifts
    (data change, algorithm change, nondeterminism), the contract row would
    hash-mismatch, and this test points at why."""
    from goldenretriever_spark.operators.ann import train_centroids_kmeans
    from goldenretriever_spark.operators.ivf_codebook import CODEBOOK_SF001

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cb = train_centroids_kmeans(emb, n_centroids=8, iters=3, seed=42)
    assert cb == CODEBOOK_SF001


# ---------------------------------------------------------------------------
# connected components: star alternation vs pointer doubling (VERDICT r4 #6)
# ---------------------------------------------------------------------------

def _components(df):
    return {(r["id"], r["component"]) for r in df.collect()}


def _random_edges(spark, n_nodes=200, n_edges=300, seed=17):
    import numpy as np

    rng = np.random.default_rng(seed)
    pairs = rng.integers(0, n_nodes, size=(n_edges, 2)).tolist()
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "doc_a long, doc_b long"
    )


def _chain_edges(spark, n=400):
    """Adversarial long chain: diameter n-1, the worst case for plain
    neighbor propagation and a giant single component funneling every label
    through one value — the skew case the star variant is for."""
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )


@pytest.mark.parametrize("graph", ["random", "chain"])
def test_star_equals_pointer_doubling(spark, graph):
    from goldenretriever_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    edges = (
        _random_edges(spark) if graph == "random" else _chain_edges(spark)
    )
    pd_out = _components(connected_components(edges, max_iter=40))
    star_out = _components(connected_components_star(edges, max_iter=60))
    assert pd_out == star_out
    # every label is the component minimum: no label exceeds its node id's
    # reachable min — spot-check the chain collapses to a single 0 component
    if graph == "chain":
        assert {c for _, c in star_out} == {0}


def test_star_handles_self_loops_and_duplicates(spark):
    from goldenretriever_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(5, 5), (1, 2), (2, 1), (2, 3), (7, 8), (8, 7), (9, 9)],
        "doc_a long, doc_b long",
    )
    star_out = _components(connected_components_star(edges))
    pd_out = _components(connected_components(edges))
    # ADVICE r5: both variants cover the SAME node set — a node appearing
    # only in self-loop edges is a singleton component of itself
    assert pd_out == star_out
    assert star_out == {(1, 1), (2, 1), (3, 1), (5, 5), (7, 7), (8, 7), (9, 9)}


def test_nonconvergence_raises_and_warns(spark):
    """ADVICE r4: exhausting max_iter must not silently return wrong labels
    — strict (default) raises, strict=False warns and returns partials."""
    from goldenretriever_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    chain = _chain_edges(spark, n=60)  # needs ~log2(60) ≈ 6 doubling rounds
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1)
    with pytest.warns(RuntimeWarning, match="did not converge"):
        out = connected_components(chain, max_iter=1, strict=False)
        assert out.count() == 61  # partial labels still one row per node
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(chain, max_iter=1)


# ---------------------------------------------------------------------------
# serve loop: StoredIndex.search with content join-back (VERDICT r4 #8)
# ---------------------------------------------------------------------------

def test_stored_search_content_joinback(spark, tmp_path):
    """search(documents=...) must return the SAME ranking as ranked-only
    search plus the matching content string for every row (reference
    make_query returns answer strings, models.py:137-149)."""
    import hashlib

    from goldenretriever_spark import corpus
    from goldenretriever_spark.index.blocks import pack_blocks
    from goldenretriever_spark.index.build import build_index, with_doc_ids
    from goldenretriever_spark.index.storage import StoredIndex, write_index

    raw = spark.createDataFrame(corpus.synth_corpus_pandas(120, seed=23))
    docs = with_doc_ids(raw).select("doc_id", "content")
    idx = build_index(raw, tokenizer="simple")
    blocks = pack_blocks(idx, block_size=16, target_docs_per_group=50)
    path = str(tmp_path / "idx")
    write_index(idx, path, blocks=blocks, n_term_buckets=8)
    stored = StoredIndex(spark, path)

    qlist = [(0, "def return"), (1, "cache_buffer")]
    ranked, plan = stored.search(qlist, k=5, with_plan=True)
    ranked_rows = {(r["query_id"], r["rank"]): r["doc_id"] for r in ranked.collect()}
    with_content = stored.search(qlist, k=5, documents=docs)
    rows = with_content.collect()
    assert {(r["query_id"], r["rank"]): r["doc_id"] for r in rows} == ranked_rows
    truth = {r["doc_id"]: r["content"] for r in docs.collect()}
    for r in rows:
        assert r["content"] == truth[r["doc_id"]]
        assert hashlib.sha256(r["content"].encode()).hexdigest()  # non-empty
    assert plan["path"] in ("brute_stored", "wand")


# ---------------------------------------------------------------------------
# file-format source query (VERDICT r4 #7): deterministic expected rows
# ---------------------------------------------------------------------------

def test_src_parse_files_expected_rows(spark):
    """The fixture parse is fully deterministic — pin the exact flattened
    rows (cutoff drops the 7th CSV row, 'nan' query dropped, duplicate QA
    row dedupes, body-less TXT clause dropped)."""
    import __spark_entry__ as E

    rows = {
        (r["kb_name"], r["query_id"], r["response_id"], r["query_string"])
        for r in E._src_parse_files(spark, "unused").collect()
    }
    assert rows == {
        ("csvkb", 1, 3, "how to sort"),   # merge sort
        ("csvkb", 1, 2, "how to sort"),   # quicksort
        ("csvkb", 0, 1, "how to join"),   # hash join (deduped)
        ("csvkb", 2, 0, "what is bm25"),
        ("txtkb", 1, 0, "what is a heap"),
        ("txtkb", 0, 1, "how to hash"),
    }


# ---------------------------------------------------------------------------
# hybrid RRF fusion (beyond-parity; reference serves BM25 and Annoy cosine
# separately — /root/reference/src/models.py make_query)
# ---------------------------------------------------------------------------

def test_rrf_fuse_semantics(spark):
    """An item ranked by both legs outscores single-leg items; quantization
    matches the closed form 1/(k0+r); ties break on doc_id ascending."""
    from goldenretriever_spark.query.hybrid import RRF_K0, RRF_QUANT, rrf_fuse

    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id long, doc_id long, rank int"
    )
    vec = spark.createDataFrame(
        [(0, 11, 1), (0, 20, 2), (0, 21, 3)], "query_id long, doc_id long, rank int"
    )
    out = rrf_fuse([lex, vec], k=10)
    rows = {r.doc_id: r for r in out.collect()}
    # doc 11 appears in both legs (ranks 2 and 1) -> highest fused score
    assert rows[11].rank == 1
    assert rows[11].rrf_q == round((1 / (RRF_K0 + 2) + 1 / (RRF_K0 + 1)) * RRF_QUANT)
    # single-leg items score exactly their one reciprocal
    assert rows[10].rrf_q == round(1 / (RRF_K0 + 1) * RRF_QUANT)
    # doc 10 (lex rank 1) and doc 20 (vec rank 2): equal-score tie is
    # impossible here, but same-score doc ordering is doc_id asc — check via
    # two docs with identical contribution: lex rank 3 (12) vs vec rank 3 (21)
    assert rows[12].rrf_q == rows[21].rrf_q
    assert rows[12].rank < rows[21].rank  # doc_id 12 < 21 wins the tie


def test_rrf_fuse_respects_k(spark):
    from goldenretriever_spark.query.hybrid import rrf_fuse

    lex = spark.createDataFrame(
        [(0, d, d + 1) for d in range(8)], "query_id long, doc_id long, rank int"
    )
    out = rrf_fuse([lex], k=3)
    assert out.count() == 3
    assert [r.doc_id for r in out.orderBy("rank").collect()] == [0, 1, 2]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_rrf_fuse_matches_python_reference(spark, seed):
    """Randomized cross-check: rrf_fuse on arbitrary leg rankings equals a
    pure-Python RRF computed from the same (query, doc, rank) triples —
    scores (quantized) AND fused order, ties on doc_id ascending."""
    import random

    from goldenretriever_spark.query.hybrid import RRF_K0, RRF_QUANT, rrf_fuse

    rng = random.Random(seed)
    legs_py = []
    for _ in range(3):  # three legs, 4 queries, ragged top lists
        rows = []
        for qid in range(4):
            docs = rng.sample(range(30), rng.randint(0, 8))
            rows += [(qid, d, r + 1) for r, d in enumerate(docs)]
        legs_py.append(rows)

    expected = {}
    for rows in legs_py:
        for qid, d, r in rows:
            expected[(qid, d)] = expected.get((qid, d), 0.0) + 1.0 / (RRF_K0 + r)
    exp_topk = {}
    for qid in range(4):
        items = sorted(
            ((round(s * RRF_QUANT), d) for (q, d), s in expected.items() if q == qid),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        exp_topk[qid] = [(d, s, i + 1) for i, (s, d) in enumerate(items)]

    legs = [
        spark.createDataFrame(rows or [(99, 0, 1)], "query_id long, doc_id long, rank int")
        for rows in legs_py
    ]
    got = rrf_fuse(legs, k=5)
    got_topk = {}
    for r in got.collect():
        got_topk.setdefault(r.query_id, []).append((r.doc_id, r.rrf_q, r.rank))
    for qid in range(4):
        assert sorted(got_topk.get(qid, []), key=lambda t: t[2]) == exp_topk[qid]


# ---------------------------------------------------------------------------
# hybrid serve loop: StoredIndex.search_hybrid (lexical + vector, one call)
# ---------------------------------------------------------------------------

def test_stored_search_hybrid(spark, tmp_path):
    """search_hybrid must equal rrf_fuse of the independently computed legs
    (same stored lexical search, same brute cosine top-k), and the
    documents join-back must carry the matching content for every row."""
    import numpy as np
    import pandas as pd

    from goldenretriever_spark import corpus
    from goldenretriever_spark.index.blocks import pack_blocks
    from goldenretriever_spark.index.build import build_index, with_doc_ids
    from goldenretriever_spark.index.storage import StoredIndex, write_index
    from goldenretriever_spark.operators.ann import brute_topk
    from goldenretriever_spark.query.hybrid import rrf_fuse

    raw = spark.createDataFrame(corpus.synth_corpus_pandas(100, seed=29))
    docs = with_doc_ids(raw).select("doc_id", "content")
    idx = build_index(raw, tokenizer="simple")
    blocks = pack_blocks(idx, block_size=16, target_docs_per_group=50)
    path = str(tmp_path / "idx")
    write_index(idx, path, blocks=blocks, n_term_buckets=8)
    stored = StoredIndex(spark, path)

    # embeddings over the SAME doc_id space, deterministic
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    rng = np.random.default_rng(7)
    emb_pd = pd.DataFrame(
        {"vec_id": ids, "embedding": [rng.standard_normal(8).tolist() for _ in ids]}
    )
    emb = spark.createDataFrame(emb_pd)
    qvecs = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": [0, 1], "qvec": [emb_pd["embedding"][0], emb_pd["embedding"][1]]}
        )
    )

    qlist = [(0, "def return"), (1, "cache_buffer")]
    got = stored.search_hybrid(qlist, qvecs, emb, k=5)

    lex = stored.search(qlist, k=5).select("query_id", "doc_id", "rank")
    vec = brute_topk(emb, qvecs, k=5).selectExpr(
        "query_id", "vec_id AS doc_id", "rnk AS rank"
    )
    want = rrf_fuse([lex, vec], k=5)
    as_set = lambda df: {tuple(r) for r in df.collect()}
    assert as_set(got) == as_set(want)
    assert got.count() > 0

    # join-back carries content and preserves the ranking
    withc = stored.search_hybrid(qlist, qvecs, emb, k=5, documents=docs)
    truth = {r["doc_id"]: r["content"] for r in docs.collect()}
    rows = withc.collect()
    assert {(r["query_id"], r["rank"]): r["doc_id"] for r in rows} == {
        (r["query_id"], r["rank"]): r["doc_id"] for r in got.collect()
    }
    for r in rows:
        assert r["content"] == truth[r["doc_id"]]
