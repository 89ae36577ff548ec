"""Oracle rank-identity: Spark brute-force BM25 == single-node Python oracle
(SURVEY §5.2 item 1) + sha256 per-row invariant (item 2)."""

import math

import pytest

from goldenretriever_spark import corpus
from goldenretriever_spark.index.build import build_index, with_doc_ids
from goldenretriever_spark.oracle import build_oracle_index, top_k as oracle_top_k
from goldenretriever_spark.query import bm25

N_DOCS = 300
K = 10


@pytest.fixture(scope="module", params=["simple", "code"])
def built(request, spark):
    tok = request.param
    pdf = corpus.synth_corpus_pandas(N_DOCS, seed=42)
    docs = spark.createDataFrame(pdf)
    docs_id = with_doc_ids(docs)
    idx = build_index(docs, tokenizer=tok)
    idx.postings.cache().count()
    idx.doc_stats.cache().count()
    id_map = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in docs_id.select("repo", "path", "commit", "doc_id").collect()
    }
    oracle_docs = [
        (id_map[(row.repo, row.path, row.commit)], row.content) for row in pdf.itertuples()
    ]
    oidx = build_oracle_index(oracle_docs, tokenizer=tok)
    return tok, idx, oidx, docs_id


def test_sha256_invariant(built):
    _, idx, oidx, _ = built
    got = {r["doc_id"]: r["sha256"] for r in idx.doc_stats.collect()}
    assert got == oidx.sha256


def test_corpus_stats_match(built):
    _, idx, oidx, _ = built
    row = idx.corpus_stats.collect()[0]
    assert row["n_docs"] == oidx.n_docs
    assert math.isclose(row["avgdl"], oidx.avgdl, rel_tol=1e-12)


def test_rank_identity_topk(built, spark):
    tok, idx, oidx, _ = built
    queries = corpus.reference_queries(50, seed=42)
    qlist = [(int(r.query_id), r.query_str) for r in queries.itertuples()]
    result = bm25.search(spark, idx, qlist, k=K, tokenizer=tok).collect()
    got: dict[int, list[tuple[int, float]]] = {}
    for r in sorted(result, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, qstr in qlist:
        expected = oracle_top_k(oidx, qstr, k=K, tokenizer=tok)
        actual = got.get(qid, [])
        assert [d for d, _ in actual] == [d for d, _ in expected], (
            f"rank mismatch q{qid} ({qstr!r}): {actual} != {expected}"
        )
        for (d_a, s_a), (d_o, s_o) in zip(actual, expected):
            assert math.isclose(s_a, s_o, rel_tol=1e-9, abs_tol=1e-12), (
                f"score mismatch q{qid} doc {d_a}: {s_a} vs {s_o}"
            )


def test_no_doc_id_collisions_at_test_scale(built, spark):
    from goldenretriever_spark.index.build import check_doc_id_collisions

    pdf = corpus.synth_corpus_pandas(N_DOCS, seed=42)
    docs = spark.createDataFrame(pdf)
    assert check_doc_id_collisions(docs) == 0
