r"""DuckDB oracle SQL twins for every operator in __spark_entry__.queries().

Dialect discipline (kept identical on the Spark side):
- floats quantized: CAST(round(x * 10^k) AS BIGINT)
- integer bit work via >> and %, never double-divide+cast (cast rounding
  differs between engines)
- regexp_replace needs the 'g' flag in DuckDB (Spark is global by default)
- md5/sha256 both emit lowercase hex in both engines
- DuckDB list ops <-> Spark higher-order functions:
  list_transform/ transform, list_filter/ filter, list_min/ array_min,
  list_slice(l,a,b) (inclusive) <-> slice(l,a,b-a+1),
  array_to_string/ concat_ws, string_split_regex/ split
"""

from __future__ import annotations

from goldenretriever_spark.tokenizer import SIMPLE_SPLIT_SQL as WS

TOKS = f"string_split_regex(lower(trim(text)), '{WS}')"
NTOK = f"(CASE WHEN length(trim(text))=0 THEN 0 ELSE len(string_split_regex(trim(text),'{WS}')) END)"

SHINGLES = (
    "list_distinct(list_transform(generate_series(0, greatest(len({toks})-3, 0)), "
    "i -> array_to_string(list_slice({toks}, i+1, i+3), ' ')))"
).format(toks=TOKS)


RELATIONAL = {
    "rel_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity)*100) AS BIGINT) AS sum_qty_q,
       CAST(round(sum(l_extendedprice*(1-l_discount))*100) AS BIGINT) AS revenue_q,
       count(*)::BIGINT AS cnt
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
""",
    "rel_join_topk": """
SELECT c_mktsegment,
       CAST(round(sum(l_extendedprice*(1-l_discount))*100) AS BIGINT) AS revenue_q,
       count(DISTINCT o_orderkey)::BIGINT AS n_orders
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY revenue_q DESC LIMIT 3
""",
    "rel_rollup_metrics": """
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       count(*)::BIGINT AS n,
       CAST(round(sum(o_totalprice)*100) AS BIGINT) AS total_q
FROM orders GROUP BY ROLLUP (o_orderstatus)
""",
    "rel_window_rank": """
SELECT user_id, event_id, CAST(round(value*100) AS BIGINT) AS value_q, rnk
FROM (SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rnk
      FROM events) WHERE rnk <= 3
""",
    "rel_window_running": """
SELECT user_id, event_id,
       CAST(round(sum(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)*100) AS BIGINT) AS running_q
FROM events
""",
    "rel_semi_join": """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""",
    "rel_anti_join": """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""",
    "rel_dense_rank_ids": """
SELECT p_type, row_number() OVER (ORDER BY p_type ASC) AS type_id
FROM (SELECT DISTINCT p_type FROM part)
""",
    "rel_union_distinct": """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL SELECT s_nationkey FROM supplier)
""",
    "rel_filter_project_fill": """
SELECT event_id,
       CASE WHEN props IS NULL OR props = '' THEN event_type
            ELSE event_type || ' ' || props END AS processed_string
FROM events WHERE event_type IS NOT NULL AND value > 0
""",
    "rel_grouping_sets_region": """
SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
       count(*)::BIGINT AS n_cust,
       CAST(round(avg(c_acctbal)*100) AS BIGINT) AS avg_bal_q
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
}


TEXTSTATS = {
    "txt_token_count": f"""
SELECT doc_id, {NTOK}::BIGINT AS n_tokens, length(text)::BIGINT AS n_chars_m
FROM documents
""",
    "txt_quality_score": f"""
WITH q AS (
  SELECT doc_id,
         length(text)::DOUBLE AS n_chars,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE AS n_punct,
         length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS n_digit,
         length(regexp_replace(text, '[^ ]', '', 'g'))::DOUBLE AS n_space,
         {NTOK}::DOUBLE AS n_tokens
  FROM documents),
q2 AS (SELECT *, CASE WHEN n_tokens > 0 THEN (n_chars-n_space)/n_tokens ELSE 0.0 END AS avg_tok FROM q)
SELECT doc_id,
       CAST(round(
           (CASE WHEN n_tokens >= 5 AND n_tokens <= 5000 THEN 40.0 ELSE 0.0 END)
         + (CASE WHEN avg_tok >= 2 AND avg_tok <= 12 THEN 30.0 ELSE 0.0 END)
         + (CASE WHEN n_chars > 0 THEN 30.0*(1.0 - least(1.0, (n_punct+n_digit)/n_chars)) ELSE 0.0 END)
       ) AS BIGINT) AS quality,
       CAST(round(avg_tok*100) AS BIGINT) AS avg_tok_len_q
FROM q2
""",
    "txt_lang_id": f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
h AS (SELECT doc_id,
             len(list_filter(['the','a','and','of'], m -> list_contains(toks, m)))::BIGINT AS en_hits,
             len(list_filter(['def','return','import','class','var','func'], m -> list_contains(toks, m)))::BIGINT AS code_hits
      FROM t)
SELECT doc_id, en_hits, code_hits,
       CASE WHEN en_hits > 0 AND en_hits >= code_hits THEN 'en'
            WHEN code_hits > 0 THEN 'code' ELSE 'other' END AS pred_lang
FROM h
""",
    "txt_fingerprint": f"""
WITH t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents)
SELECT doc_id, md5(text) AS md5,
       list_min(list_transform(generate_series(0, greatest(len(toks)-3, 0)),
                i -> md5(array_to_string(list_slice(toks, i+1, i+3), ' ')))) AS min_shingle_fp
FROM t
""",
    # Gopher-rule keep/drop gate — thresholds mirror textstats.QF_* exactly
    "txt_quality_filter": f"""
WITH q AS (
  SELECT doc_id,
         length(text)::DOUBLE AS n_chars,
         length(regexp_replace(text, '[^ ]', '', 'g'))::DOUBLE AS n_space,
         length(regexp_replace(text, '[A-Za-z0-9 \\t\\n]', '', 'g'))::DOUBLE AS n_sym,
         {NTOK}::DOUBLE AS n_tokens,
         len(list_filter(['the','a','and','of'], m -> list_contains({TOKS}, m)))::BIGINT AS stop_hits
  FROM documents),
q2 AS (SELECT *, CASE WHEN n_tokens > 0 THEN (n_chars-n_space)/n_tokens ELSE 0.0 END AS avg_tok FROM q),
f AS (SELECT doc_id,
             (n_tokens >= 5 AND n_tokens <= 5000) AS f_len,
             (avg_tok >= 2.0 AND avg_tok <= 12.0) AS f_avg,
             (CASE WHEN n_chars > 0 THEN n_sym/n_chars <= 0.2 ELSE FALSE END) AS f_sym,
             (stop_hits >= 1) AS f_stop
      FROM q2)
SELECT doc_id, f_len::BIGINT AS pass_len, f_avg::BIGINT AS pass_avg_tok,
       f_sym::BIGINT AS pass_symbol, f_stop::BIGINT AS pass_stopword,
       (f_len AND f_avg AND f_sym AND f_stop)::BIGINT AS kept
FROM f
""",
}


def _minhash_sig_sql(n_bands: int) -> str:
    sig_cols = ",\n       ".join(
        f"list_min(list_transform(sh, s -> md5('{b}|' || s))) AS sig{b}" for b in range(n_bands)
    )
    return f"""
WITH t AS (SELECT doc_id, {SHINGLES} AS sh FROM documents)
SELECT doc_id, {sig_cols} FROM t
"""


def _simhash_sql(bits: int) -> str:
    hex_nibbles = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(term), {i+1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    s_cols = ",\n       ".join(
        f"sum(tf * (2 * ((h16 >> {k}) % 2) - 1)) AS s{k}" for k in range(bits)
    )
    bit_sum = " + ".join(
        f"(CASE WHEN s{k} > 0 THEN {2 ** k} ELSE 0 END)" for k in range(bits)
    )
    return f"""
WITH tok AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
h AS (SELECT doc_id, tf, CAST({hex_nibbles} AS INTEGER) AS h16 FROM tf),
sums AS (SELECT doc_id, {s_cols} FROM h GROUP BY 1)
SELECT doc_id, CAST({bit_sum} AS BIGINT) AS simhash FROM sums
"""


DEDUP = {
    "dedup_exact": """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0)
SELECT md5(text) AS digest, min(doc_id) AS canonical_doc_id, count(*)::BIGINT AS n_dups
FROM corpus GROUP BY 1 HAVING count(*) > 1
""",
    "dedup_minhash_signatures": _minhash_sig_sql(8),
    # hot-bucket cap (1000) mirrored from operators/dedup.py MAX_BUCKET_SIZE
    "dedup_minhash_lsh_pairs": f"""
WITH sigs AS ({_minhash_sig_sql(8)}),
long AS ({" UNION ALL ".join(f"SELECT doc_id, {b} AS band, sig{b} AS sig FROM sigs" for b in range(8))}),
capped AS (SELECT * FROM long QUALIFY count(*) OVER (PARTITION BY band, sig) <= 1000)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM capped a JOIN capped b USING (band, sig)
WHERE a.doc_id < b.doc_id
""",
    "dedup_ngram_jaccard": f"""
WITH t AS (SELECT doc_id, {SHINGLES} AS sh FROM documents),
raw_ex AS (SELECT doc_id, unnest(sh) AS shingle FROM t),
surv AS (SELECT * FROM raw_ex QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000),
-- |A|/|B| are the SURVIVING shingle counts (post-cap), matching the engine
ex AS (SELECT doc_id, shingle,
              count(*) OVER (PARTITION BY doc_id)::BIGINT AS n_sh
       FROM surv),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
         count(*)::BIGINT AS common
  FROM ex a JOIN ex b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT doc_a, doc_b, common,
       CAST(round(common / (na + nb - common) * 10000) AS BIGINT) AS jaccard_q
FROM common
WHERE CAST(round(common / (na + nb - common) * 10000) AS BIGINT) >= 2000
""",
    "dedup_simhash": _simhash_sql(16),
    # pigeonhole band-join: 16 bits / 4 bands, Hamming <= 3, same 1000-cap
    "dedup_simhash_pairs": f"""
WITH sims AS ({_simhash_sql(16)}),
long AS (
  SELECT doc_id, simhash, t.band, (simhash >> (t.band * 4)) % 16 AS band_val
  FROM sims, unnest([0, 1, 2, 3]) AS t(band)),
capped AS (SELECT * FROM long QUALIFY count(*) OVER (PARTITION BY band, band_val) <= 1000),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS ha, b.simhash AS hb
  FROM capped a JOIN capped b USING (band, band_val)
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 3
""",
}


def _dedup_embedding_sql() -> str:
    """LSH-bucket-blocked embedding near-dup twin: identical seeded
    hyperplane buckets, radius-1 probe (candidate iff bucket Hamming <= 1),
    1000-cap on exact buckets, exact cosine verify."""
    from goldenretriever_spark.operators.ann import hyperplanes

    bits = " + ".join(
        f"(CASE WHEN list_dot_product({{v}}, {plane!r}::DOUBLE[]) > 0 THEN {2 ** p} ELSE 0 END)"
        for p, plane in enumerate(hyperplanes())
    )
    cos = (
        "CAST(round(list_dot_product(x.embedding, y.embedding)"
        " / (sqrt(list_dot_product(x.embedding, x.embedding))"
        " * sqrt(list_dot_product(y.embedding, y.embedding))) * 10000) AS BIGINT)"
    )
    return f"""
WITH eb AS (SELECT vec_id, embedding, ({bits.format(v="embedding")}) AS bucket FROM embeddings),
capped AS (SELECT * FROM eb QUALIFY count(*) OVER (PARTITION BY bucket) <= 1000)
SELECT x.vec_id AS id_a, y.vec_id AS id_b, {cos} AS cosine_q
FROM capped x JOIN capped y
  ON bit_count(xor(x.bucket, y.bucket)) <= 1 AND x.vec_id < y.vec_id
WHERE {cos} >= 3500
"""


def _ann_scored_sql(bucketed: bool, planes: list[list[float]] | None = None) -> str:
    cos = (
        "CAST(round(list_dot_product(q.qvec, e.embedding)"
        " / (sqrt(list_dot_product(q.qvec, q.qvec))"
        " * sqrt(list_dot_product(e.embedding, e.embedding))) * 10000) AS BIGINT)"
    )
    if not bucketed:
        return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings ORDER BY vec_id LIMIT 5),
scored AS (SELECT q.query_id, e.vec_id, {cos} AS cosine_q FROM q CROSS JOIN embeddings e)
SELECT query_id, vec_id, cosine_q, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine_q DESC, vec_id ASC) AS rnk
  FROM scored) WHERE rnk <= 5
"""
    assert planes is not None
    plane_bits = " + ".join(
        f"(CASE WHEN list_dot_product({{v}}, {plane!r}::DOUBLE[]) > 0 THEN {2 ** p} ELSE 0 END)"
        for p, plane in enumerate(planes)
    )
    bq = plane_bits.format(v="q.qvec")
    be = plane_bits.format(v="e.embedding")
    join_cond = f"({bq}) = ({be})"
    if bucketed == "multiprobe":
        # probe radius 1: candidate iff buckets differ in <= 1 sign bit
        join_cond = f"bit_count(xor(({bq}), ({be}))) <= 1"
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings ORDER BY vec_id LIMIT 5),
scored AS (
  SELECT q.query_id, e.vec_id, {cos} AS cosine_q
  FROM q JOIN embeddings e ON {join_cond})
SELECT query_id, vec_id, cosine_q, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine_q DESC, vec_id ASC) AS rnk
  FROM scored) WHERE rnk <= 5
"""


def _plane_bits(planes: list[list[float]]) -> str:
    """Bucket-id bit expression template ({v} = vector column)."""
    return " + ".join(
        f"(CASE WHEN list_dot_product({{v}}, {plane!r}::DOUBLE[]) > 0 THEN {2 ** p} ELSE 0 END)"
        for p, plane in enumerate(planes)
    )


def _ann_multitable_sql(n_tables: int = 4) -> str:
    """Union-over-L-tables candidates as an OR of per-table bucket equalities
    (one row per (q, e) pair — exactly the engine's max-agg dedup)."""
    from goldenretriever_spark.operators.ann import hyperplanes

    conds = []
    for t in range(n_tables):
        bits = _plane_bits(hyperplanes(seed=42 + 1000 * t))
        conds.append(f"(({bits.format(v='q.qvec')}) = ({bits.format(v='e.embedding')}))")
    cos = (
        "CAST(round(list_dot_product(q.qvec, e.embedding)"
        " / (sqrt(list_dot_product(q.qvec, q.qvec))"
        " * sqrt(list_dot_product(e.embedding, e.embedding))) * 10000) AS BIGINT)"
    )
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings ORDER BY vec_id LIMIT 5),
scored AS (
  SELECT q.query_id, e.vec_id, {cos} AS cosine_q
  FROM q JOIN embeddings e ON {" OR ".join(conds)})
SELECT query_id, vec_id, cosine_q, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine_q DESC, vec_id ASC) AS rnk
  FROM scored) WHERE rnk <= 5
"""


def _cosq(a: str, b: str) -> str:
    return (
        f"CAST(round(list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b}))) * 10000) AS BIGINT)"
    )


def _ann_ivf_sql(n_centroids: int = 8, n_probe: int = 2) -> str:
    """IVF twin: quantized-cosine argmax assignment, n_probe nearest lists,
    exact re-rank — identical tie discipline (asc centroid_id / vec_id)."""
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings ORDER BY vec_id LIMIT 5),
cent AS (SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT {n_centroids}),
assign AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {_cosq("e.embedding", "c.cvec")} DESC, c.centroid_id ASC) AS arnk
    FROM embeddings e CROSS JOIN cent c) WHERE arnk = 1),
probes AS (
  SELECT query_id, qvec, centroid_id FROM (
    SELECT q.query_id, q.qvec, c.centroid_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {_cosq("q.qvec", "c.cvec")} DESC, c.centroid_id ASC) AS prnk
    FROM q CROSS JOIN cent c) WHERE prnk <= {n_probe}),
scored AS (
  SELECT p.query_id, a.vec_id, {_cosq("p.qvec", "a.embedding")} AS cosine_q
  FROM probes p JOIN assign a USING (centroid_id))
SELECT query_id, vec_id, cosine_q, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine_q DESC, vec_id ASC) AS rnk
  FROM scored) WHERE rnk <= 5
"""


def _ann_ivf_trained_sql(n_probe: int = 2) -> str:
    """Trained-IVF SERVING twin (VERDICT r4 #4): the k-means training loop
    has no SQL twin, but its OUTPUT does — the pinned sf0.01 codebook
    (operators/ivf_codebook.py, provenance in its docstring) ships as
    centroid literals, the same pattern as hyperplanes(). The probe +
    re-rank math therefore gets a full hash check; only the training loop
    stays pytest-covered."""
    from goldenretriever_spark.operators.ivf_codebook import CODEBOOK_SF001

    cent_rows = ",\n  ".join(
        f"({i}, {row!r}::DOUBLE[])" for i, row in enumerate(CODEBOOK_SF001)
    )
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings ORDER BY vec_id LIMIT 5),
cent(centroid_id, cvec) AS (VALUES
  {cent_rows}),
assign AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {_cosq("e.embedding", "c.cvec")} DESC, c.centroid_id ASC) AS arnk
    FROM embeddings e CROSS JOIN cent c) WHERE arnk = 1),
probes AS (
  SELECT query_id, qvec, centroid_id FROM (
    SELECT q.query_id, q.qvec, c.centroid_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {_cosq("q.qvec", "c.cvec")} DESC, c.centroid_id ASC) AS prnk
    FROM q CROSS JOIN cent c) WHERE prnk <= {n_probe}),
scored AS (
  SELECT p.query_id, a.vec_id, {_cosq("p.qvec", "a.embedding")} AS cosine_q
  FROM probes p JOIN assign a USING (centroid_id))
SELECT query_id, vec_id, cosine_q, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine_q DESC, vec_id ASC) AS rnk
  FROM scored) WHERE rnk <= 5
"""


def ann_oracles() -> dict[str, str]:
    from goldenretriever_spark.operators.ann import hyperplanes

    return {
        "ann_brute_topk": _ann_scored_sql(False),
        "ann_lsh_topk": _ann_scored_sql(True, hyperplanes()),
        "ann_lsh_multiprobe": _ann_scored_sql("multiprobe", hyperplanes()),
        "ann_lsh_multitable": _ann_multitable_sql(4),
        "ann_ivf_topk": _ann_ivf_sql(8, 2),
        "ann_ivf_trained_topk": _ann_ivf_trained_sql(2),
    }


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(RELATIONAL)
    out.update(TEXTSTATS)
    out.update(DEDUP)
    out["dedup_embedding_neardup"] = _dedup_embedding_sql()
    out.update(ann_oracles())
    return out
