"""DuckDB oracle SQL for the vector engine (LSH / kNN / ANN / sim-join).

The LSH model is refit here from the same parquet with the same deterministic
sample rule (first 2·T·B rows by vec_id, float64), so the hyperplane literals
inlined into the SQL are bit-identical to what the Spark operators use. The
margin sign test is round(dot − offset, 6) > 0 on both sides, making hash
bits immune to float summation-order noise.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .constants import (
    ANN_K1,
    ANN_K2,
    COSINE_JOIN_TAU,
    KNN_K,
    LSH_BITS,
    LSH_TABLES,
    MAX_BUCKET,
    N_QUERIES,
)

# hashes → capped candidate pairs: exact mirror of operators/knn._lsh_pairs
# (functions/blocking.capped_bucket_pairs — drop (tbl, hash) buckets with
# more than MAX_BUCKET members before the quadratic pair self-join)
_CAPPED_PAIRS_CTE = f"""bsz AS (
  SELECT tbl, hash, COUNT(*) AS n FROM hashes GROUP BY 1, 2
), kept AS (
  SELECT h.vec_id, h.tbl, h.hash FROM hashes h
  JOIN bsz s ON s.tbl = h.tbl AND s.hash = h.hash
  WHERE s.n <= {MAX_BUCKET}
), pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM kept a JOIN kept b ON a.tbl = b.tbl AND a.hash = b.hash AND a.vec_id < b.vec_id
)"""


@lru_cache(maxsize=8)
def lsh_model_for(sf_dir: str):
    import pyarrow.parquet as pq

    from .operators.lsh import LshModel

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    pdf = tbl.to_pandas()
    n = 2 * LSH_TABLES * LSH_BITS
    pdf = pdf[pdf.vec_id < n].sort_values("vec_id")
    return LshModel.from_sample(np.array(pdf["embedding"].tolist(), dtype=np.float64))


def _hash_sql(model, t: int, vec: str = "embedding") -> str:
    terms = []
    for b in range(model.bits):
        i = t * model.bits + b
        lit = "[" + ",".join(repr(float(x)) for x in model.normals[i]) + "]"
        c = repr(float(model.offsets[i]))
        terms.append(
            f"(CASE WHEN round(list_dot_product({vec}::DOUBLE[], CAST({lit} AS DOUBLE[]))"
            f" - ({c}), 6) > 0 THEN {1 << b} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _hashes_cte(model, where: str | None = None, from_table: str = "embeddings") -> str:
    w = f" WHERE {where}" if where else ""
    parts = [
        f"SELECT vec_id, CAST({t} AS INT) AS tbl, {_hash_sql(model, t)} AS hash FROM {from_table}{w}"
        for t in range(model.tables)
    ]
    return "\nUNION ALL\n".join(parts)


def lsh_index(sf_dir: str) -> str:
    return _hashes_cte(lsh_model_for(sf_dir))


def _ann_core(model, k1: int, k2: int, nq: int) -> str:
    """Shared CTE chain ending in view `ann(query_id, neighbor_id, n_match, distance)`."""
    return f"""
hashes AS (
{_hashes_cte(model)}
), cand AS (
  SELECT q.vec_id AS query_id, i.vec_id AS neighbor_id, CAST(COUNT(*) AS BIGINT) AS n_match
  FROM hashes i JOIN hashes q ON i.tbl = q.tbl AND i.hash = q.hash
  WHERE q.vec_id < {nq} AND i.vec_id <> q.vec_id
  GROUP BY 1, 2
), k1_sel AS (
  SELECT query_id, neighbor_id, n_match,
         row_number() OVER (PARTITION BY query_id ORDER BY n_match DESC, neighbor_id) AS rn
  FROM cand
), scored AS (
  SELECT k.query_id, k.neighbor_id, k.n_match,
         round(list_distance(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 6) AS distance
  FROM k1_sel k
  JOIN embeddings qe ON qe.vec_id = k.query_id
  JOIN embeddings ne ON ne.vec_id = k.neighbor_id
  WHERE k.rn <= {k1}
), ann AS (
  SELECT query_id, neighbor_id, n_match, distance
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) AS rn2
        FROM scored)
  WHERE rn2 <= {k2}
)"""


def ann_search_lsh(sf_dir: str) -> str:
    model = lsh_model_for(sf_dir)
    return f"WITH {_ann_core(model, ANN_K1, ANN_K2, N_QUERIES)}\nSELECT * FROM ann"


def _ann_two_sided_core(model, index_where: str) -> str:
    """CTE chain ending in `ann`, with the INDEX side of the term-match
    restricted by `index_where` (pre-filter composition) and queries the
    canonical batch."""
    return f"""ih AS (
{_hashes_cte(model, index_where)}
), qh AS (
{_hashes_cte(model, f"vec_id < {N_QUERIES}")}
), cand AS (
  SELECT q.vec_id AS query_id, i.vec_id AS neighbor_id, CAST(COUNT(*) AS BIGINT) AS n_match
  FROM ih i JOIN qh q ON i.tbl = q.tbl AND i.hash = q.hash
  WHERE i.vec_id <> q.vec_id
  GROUP BY 1, 2
), k1_sel AS (
  SELECT query_id, neighbor_id, n_match,
         row_number() OVER (PARTITION BY query_id ORDER BY n_match DESC, neighbor_id) AS rn
  FROM cand
), ann AS (
  SELECT query_id, neighbor_id, n_match, distance
  FROM (SELECT k.query_id, k.neighbor_id, k.n_match,
               round(list_distance(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 6) AS distance,
               row_number() OVER (PARTITION BY k.query_id
                                  ORDER BY round(list_distance(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 6), k.neighbor_id) AS rn2
        FROM k1_sel k
        JOIN embeddings qe ON qe.vec_id = k.query_id
        JOIN embeddings ne ON ne.vec_id = k.neighbor_id
        WHERE k.rn <= {ANN_K1})
  WHERE rn2 <= {ANN_K2}
)"""


def ann_search_lsh_filtered(sf_dir: str) -> str:
    """Pre-filter composition (operators/knn.ann_search_lsh_filtered): the
    index side of the term-match is restricted to label = ANN_FILTER_LABEL
    before candidate generation; queries stay the canonical batch."""
    from .constants import ANN_FILTER_LABEL

    model = lsh_model_for(sf_dir)
    return f"""
WITH {_ann_two_sided_core(model, f"label = {ANN_FILTER_LABEL}")}
SELECT * FROM ann
"""


def index_delete(sf_dir: str) -> str:
    """Full-rebuild-on-filtered-table reference for the purged LSH store
    (operators/knn.index_delete): the patched store's search must equal
    ann_search_lsh recomputed over the surviving vectors only (purged
    query ids contribute no rows — rebuild semantics)."""
    from .constants import DELETE_MOD, DELETE_REM

    model = lsh_model_for(sf_dir)
    memb = (
        f"memb AS (SELECT vec_id, embedding::DOUBLE[] AS embedding "
        f"FROM embeddings WHERE vec_id % {DELETE_MOD} <> {DELETE_REM})"
    )
    return f"""
WITH {memb},
hashes AS (
{_hashes_cte(model, from_table="memb")}
), cand AS (
  SELECT q.vec_id AS query_id, i.vec_id AS neighbor_id, CAST(COUNT(*) AS BIGINT) AS n_match
  FROM hashes i JOIN hashes q ON i.tbl = q.tbl AND i.hash = q.hash
  WHERE q.vec_id < {N_QUERIES} AND i.vec_id <> q.vec_id
  GROUP BY 1, 2
), k1_sel AS (
  SELECT query_id, neighbor_id, n_match,
         row_number() OVER (PARTITION BY query_id ORDER BY n_match DESC, neighbor_id) AS rn
  FROM cand
), scored AS (
  SELECT k.query_id, k.neighbor_id, k.n_match,
         round(list_distance(qe.embedding, ne.embedding), 6) AS distance
  FROM k1_sel k
  JOIN memb qe ON qe.vec_id = k.query_id
  JOIN memb ne ON ne.vec_id = k.neighbor_id
  WHERE k.rn <= {ANN_K1}
)
SELECT query_id, neighbor_id, n_match, distance
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) AS rn2
      FROM scored)
WHERE rn2 <= {ANN_K2}
"""


def index_upsert(sf_dir: str) -> str:
    """Full-rebuild-on-updated-table reference for the patched store
    (operators/knn.index_upsert): the upserted store's search must equal
    ann_search_lsh recomputed over the updated vectors."""
    from .constants import UPSERT_MOD

    model = lsh_model_for(sf_dir)
    memb = (
        f"memb AS (SELECT vec_id, CASE WHEN vec_id % {UPSERT_MOD} = 0 "
        "THEN list_transform(embedding::DOUBLE[], x -> x * 2.0) "
        "ELSE embedding::DOUBLE[] END AS embedding FROM embeddings)"
    )
    return f"""
WITH {memb},
hashes AS (
{_hashes_cte(model, from_table="memb")}
), cand AS (
  SELECT q.vec_id AS query_id, i.vec_id AS neighbor_id, CAST(COUNT(*) AS BIGINT) AS n_match
  FROM hashes i JOIN hashes q ON i.tbl = q.tbl AND i.hash = q.hash
  WHERE q.vec_id < {N_QUERIES} AND i.vec_id <> q.vec_id
  GROUP BY 1, 2
), k1_sel AS (
  SELECT query_id, neighbor_id, n_match,
         row_number() OVER (PARTITION BY query_id ORDER BY n_match DESC, neighbor_id) AS rn
  FROM cand
), scored AS (
  SELECT k.query_id, k.neighbor_id, k.n_match,
         round(list_distance(qe.embedding, ne.embedding), 6) AS distance
  FROM k1_sel k
  JOIN memb qe ON qe.vec_id = k.query_id
  JOIN memb ne ON ne.vec_id = k.neighbor_id
  WHERE k.rn <= {ANN_K1}
)
SELECT query_id, neighbor_id, n_match, distance
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) AS rn2
      FROM scored)
WHERE rn2 <= {ANN_K2}
"""


def semantic_doc_search(sf_dir: str) -> str:
    """Retrieval composition (operators/knn.semantic_doc_search): ANN over
    the document-backed vectors, results joined to the documents table."""
    model = lsh_model_for(sf_dir)
    return f"""
WITH {_ann_two_sided_core(model, "vec_id IN (SELECT doc_id FROM documents)")}
SELECT a.query_id, a.neighbor_id AS doc_id, a.n_match, a.distance, d.source
FROM ann a JOIN documents d ON d.doc_id = a.neighbor_id
"""


def _knn_sql(metric: str, k: int, nq: int) -> str:
    if metric == "euclidean":
        val = "round(list_distance(q.qv, i.nv), 6)"
        col, order = "distance", "ASC"
    elif metric == "dot":
        val = "round(list_dot_product(q.qv, i.nv), 6)"
        col, order = "dot", "DESC"
    else:
        val = "round(list_cosine_similarity(q.qv, i.nv), 6)"
        col, order = "cosine", "DESC"
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {nq}),
     i AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nv FROM embeddings)
SELECT query_id, neighbor_id, {col} FROM (
  SELECT q.qid AS query_id, i.nid AS neighbor_id, {val} AS {col},
         row_number() OVER (PARTITION BY q.qid ORDER BY {val} {order}, i.nid) AS rn
  FROM q JOIN i ON i.nid <> q.qid)
WHERE rn <= {k}
"""


def knn_exact_euclidean(sf_dir: str) -> str:
    return _knn_sql("euclidean", KNN_K, N_QUERIES)


def knn_join(sf_dir: str) -> str:
    """Cross-set kNN join (operators/knn.knn_join mirror): one label's
    vectors against the index of every other label."""
    from .constants import ANN_FILTER_LABEL

    return f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings
           WHERE label = {ANN_FILTER_LABEL}),
     i AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nv FROM embeddings
           WHERE label <> {ANN_FILTER_LABEL})
SELECT query_id, neighbor_id, distance FROM (
  SELECT q.qid AS query_id, i.nid AS neighbor_id,
         round(list_distance(q.qv, i.nv), 6) AS distance,
         row_number() OVER (PARTITION BY q.qid
                            ORDER BY round(list_distance(q.qv, i.nv), 6), i.nid) AS rn
  FROM q JOIN i ON i.nid <> q.qid)
WHERE rn <= {KNN_K}
"""


def knn_exact_cosine(sf_dir: str) -> str:
    return _knn_sql("cosine", KNN_K, N_QUERIES)


def knn_exact_mips(sf_dir: str) -> str:
    return _knn_sql("dot", KNN_K, N_QUERIES)


def ann_recall_families(sf_dir: str) -> str:
    fams = [
        ("lsh", ann_recall(sf_dir)),
        ("lsh_multiprobe", ann_recall_lsh_multiprobe(sf_dir)),
        ("ivf", ann_recall_ivf(sf_dir)),
        ("pq", ann_recall_pq(sf_dir)),
        ("ivfpq", ann_recall_ivfpq(sf_dir)),
        ("ivfpq_refined", ann_recall_ivfpq_refined(sf_dir)),
        ("sq8", ann_recall_sq8(sf_dir)),
        ("graph", ann_recall_graph(sf_dir)),
        ("graph_beam", ann_recall_graph_beam(sf_dir)),
        ("matryoshka", ann_recall_matryoshka(sf_dir)),
        ("bitsign", ann_recall_bitsign(sf_dir)),
    ]
    union = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS family, recall FROM ({sql})" for name, sql in fams
    )
    return f"""
SELECT family,
       round(CAST(SUM(CAST(recall AS DECIMAL(10,4))) AS DOUBLE) / COUNT(*), 4)
         AS recall
FROM ({union})
GROUP BY family
"""


def knn_classify(sf_dir: str) -> str:
    return f"""
WITH nn AS ({_knn_sql("cosine", KNN_K, N_QUERIES)}),
votes AS (
  SELECT nn.query_id, e.label, COUNT(*) AS votes
  FROM nn JOIN embeddings e ON e.vec_id = nn.neighbor_id
  GROUP BY nn.query_id, e.label
), pred AS (
  SELECT query_id, label AS pred_label, votes FROM (
    SELECT query_id, label, votes,
           row_number() OVER (PARTITION BY query_id
             ORDER BY votes DESC, label ASC) AS rn
    FROM votes)
  WHERE rn = 1
)
SELECT p.query_id, q.label AS true_label, p.pred_label, p.votes,
       p.pred_label = q.label AS correct
FROM pred p JOIN embeddings q ON q.vec_id = p.query_id
"""


def ann_recall(sf_dir: str) -> str:
    model = lsh_model_for(sf_dir)
    exact = _knn_sql("euclidean", KNN_K, N_QUERIES)
    return f"""
WITH {_ann_core(model, ANN_K1, ANN_K2, N_QUERIES)},
exact AS ({exact}),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM ann a JOIN exact e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1
), ne AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1
)
SELECT ne.query_id, round(COALESCE(h.n_hit, 0) / ne.n_exact, 4) AS recall
FROM ne LEFT JOIN hits h ON h.query_id = ne.query_id
"""


def ann_recall_sweep(sf_dir: str) -> str:
    """Recall per (n_tables, n_bits, query) over prefixes of the fitted
    model on BOTH parameter axes — each grid point is the full ann_recall
    SQL with the sliced model's hyperplane literals inlined
    (LshModel.subset(t).subset_bits(b) mirror; the Spark side derives the
    same B prefixes arithmetically via hash % 2^b)."""
    from .constants import LSH_SWEEP_BITS, LSH_SWEEP_TABLES

    model = lsh_model_for(sf_dir)
    exact = _knn_sql("euclidean", KNN_K, N_QUERIES)
    parts = []
    for t in LSH_SWEEP_TABLES:
        for b in LSH_SWEEP_BITS:
            sub = model.subset(t).subset_bits(b)
            inner = f"""
WITH {_ann_core(sub, ANN_K1, ANN_K2, N_QUERIES)},
exact AS ({exact}),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM ann a JOIN exact e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1
), ne AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1
)
SELECT ne.query_id, round(COALESCE(h.n_hit, 0) / ne.n_exact, 4) AS recall
FROM ne LEFT JOIN hits h ON h.query_id = ne.query_id
"""
            parts.append(
                f"SELECT CAST({t} AS INT) AS n_tables, CAST({b} AS INT) AS n_bits,"
                f" q.query_id, q.recall FROM ({inner}) q"
            )
    return "\nUNION ALL\n".join(parts)


def similarity_join_lsh(sf_dir: str) -> str:
    model = lsh_model_for(sf_dir)
    return f"""
WITH hashes AS (
{_hashes_cte(model)}
), {_CAPPED_PAIRS_CTE}
SELECT p.vec_a, p.vec_b,
       round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) AS cosine
FROM pairs p
JOIN embeddings ea ON ea.vec_id = p.vec_a
JOIN embeddings eb ON eb.vec_id = p.vec_b
WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) >= {COSINE_JOIN_TAU}
"""


def dedup_embedding_cosine(sf_dir: str) -> str:
    model = lsh_model_for(sf_dir)
    return f"""
WITH hashes AS (
{_hashes_cte(model)}
), {_CAPPED_PAIRS_CTE}, near AS (
  SELECT vec_a, vec_b FROM pairs p
  JOIN embeddings ea ON ea.vec_id = p.vec_a
  JOIN embeddings eb ON eb.vec_id = p.vec_b
  WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) >= {COSINE_JOIN_TAU}
), sym AS (
  SELECT vec_a AS vec_id, vec_b AS other FROM near
  UNION ALL SELECT vec_b, vec_a FROM near
  UNION ALL SELECT vec_id, vec_id FROM embeddings
)
SELECT vec_id, MIN(other) AS canonical_id FROM sym GROUP BY vec_id
"""


def vector_stats(sf_dir: str) -> str:
    return """
SELECT vec_id,
       round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm,
       round(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 6) AS self_dot,
       CAST(len(embedding) AS INT) AS dim
FROM embeddings
"""


# ---- IVF (coarse-quantizer ANN; operators/ivf.py) ---------------------------


def _ivf_cent_cte(sf_dir: str) -> str:
    """Centroid literals from the same deterministic driver-side fit the
    Spark operator uses (IvfModel.fit_path) — bit-identical by construction."""
    from .operators.ivf import model_for

    cent = model_for(sf_dir).centroids
    rows = " UNION ALL ".join(
        f"SELECT {i} AS list_id, [{','.join(repr(float(x)) for x in cent[i])}]::DOUBLE[] AS c"
        for i in range(len(cent))
    )
    return f"cent AS ({rows})"


def ivf_index(sf_dir: str) -> str:
    return f"""
WITH {_ivf_cent_cte(sf_dir)},
d AS (
  SELECT e.vec_id, c.list_id,
         round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS center_dist
  FROM embeddings e CROSS JOIN cent c
)
SELECT vec_id, CAST(list_id AS INT) AS list_id, center_dist
FROM d
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY center_dist, list_id) = 1
"""


def ann_search_ivf(sf_dir: str) -> str:
    from .constants import ANN_K2, IVF_NPROBE, N_QUERIES

    return f"""
WITH {_ivf_cent_cte(sf_dir)},
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM embeddings e CROSS JOIN cent c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) = 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM embeddings e CROSS JOIN cent c
    WHERE e.vec_id < {N_QUERIES}
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) <= {IVF_NPROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, CAST(a.list_id AS INT) AS list_id,
         round(list_distance(eq.embedding::DOUBLE[], en.embedding::DOUBLE[]), 6) AS distance
  FROM probes p
  JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
  JOIN embeddings eq ON eq.vec_id = p.query_id
  JOIN embeddings en ON en.vec_id = a.vec_id
)
SELECT query_id, neighbor_id, list_id, distance
FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {ANN_K2}
"""


def ann_search_ivf_filtered(sf_dir: str) -> str:
    """Pre-filter composition for the IVF family: assignment (the index
    side) restricted to label = ANN_FILTER_LABEL; probes stay the canonical
    query batch (operators/ivf.ann_search_ivf_filtered mirror)."""
    from .constants import ANN_FILTER_LABEL, ANN_K2, IVF_NPROBE, N_QUERIES

    return f"""
WITH {_ivf_cent_cte(sf_dir)},
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM embeddings e CROSS JOIN cent c
    WHERE e.label = {ANN_FILTER_LABEL}
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) = 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM embeddings e CROSS JOIN cent c
    WHERE e.vec_id < {N_QUERIES}
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) <= {IVF_NPROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, CAST(a.list_id AS INT) AS list_id,
         round(list_distance(eq.embedding::DOUBLE[], en.embedding::DOUBLE[]), 6) AS distance
  FROM probes p
  JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
  JOIN embeddings eq ON eq.vec_id = p.query_id
  JOIN embeddings en ON en.vec_id = a.vec_id
)
SELECT query_id, neighbor_id, list_id, distance
FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {ANN_K2}
"""


def _ivfpq_core(sf_dir: str, src: str = "embeddings") -> str:
    """CTE chain ending in `adc(query_id, neighbor_id, adc_dist)`: IVF list
    pruning composed with PQ-ADC ranking (operators/pq.ann_search_ivfpq).
    `src` swaps the corpus table everywhere — assign, probes, dtab AND
    the codes CTE (ivfpq_delete passes a filtered `memb`: codes of
    survivors equal their full-table codes, deterministic per vector;
    ivfpq_upsert passes the updated table: changed vectors get NEW codes
    and assignments, exactly the no-refit rebuild semantics)."""
    from .constants import IVF_NPROBE, N_QUERIES

    pq_cte, model = _pq_codes_sql(sf_dir, name="pcent", src=src)
    dsub = model.dsub
    return f"""{_ivf_cent_cte(sf_dir)},
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM {src} e CROSS JOIN cent c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) = 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM {src} e CROSS JOIN cent c
    WHERE e.vec_id < {N_QUERIES}
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) <= {IVF_NPROBE}
),
{pq_cte},
dtab AS (
  SELECT q.vec_id AS query_id, c.m, c.k AS code,
         CAST(round(power(round(list_distance(
           (q.embedding::DOUBLE[])[c.m * {dsub} + 1 : (c.m + 1) * {dsub}], c.c), 6), 2), 6)
           AS DECIMAL(18,6)) AS d2
  FROM {src} q CROSS JOIN pcent c
  WHERE q.vec_id < {N_QUERIES}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
),
adc AS (
  SELECT ca.query_id, ca.neighbor_id, CAST(SUM(d.d2) AS DOUBLE) AS adc_dist
  FROM cand ca
  JOIN codes co ON co.vec_id = ca.neighbor_id
  JOIN dtab d ON d.query_id = ca.query_id AND d.m = co.m AND d.code = co.code
  GROUP BY 1, 2
)"""


def ann_search_ivfpq(sf_dir: str) -> str:
    from .constants import ANN_K2

    return f"""
WITH {_ivfpq_core(sf_dir)}
SELECT query_id, neighbor_id, adc_dist
FROM adc
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) <= {ANN_K2}
"""


def ivfpq_upsert(sf_dir: str) -> str:
    """Full-rebuild-on-updated-table reference for the patched IVFPQ codes
    store (operators/pq.ivfpq_upsert): codes, assignment, probes and ADC
    ranking recomputed over the UPDATED vectors with the ORIGINAL coarse
    centroids and PQ codebooks (no refit — the operator's production
    invariant); changed query vectors search with their new coordinates."""
    from .constants import ANN_K2, UPSERT_MOD

    memb = (
        f"memb AS (SELECT vec_id, CASE WHEN vec_id % {UPSERT_MOD} = 0 "
        "THEN list_transform(embedding::DOUBLE[], x -> x * 2.0) "
        "ELSE embedding::DOUBLE[] END AS embedding FROM embeddings)"
    )
    return f"""
WITH {memb}, {_ivfpq_core(sf_dir, src="memb")}
SELECT query_id, neighbor_id, adc_dist
FROM adc
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) <= {ANN_K2}
"""


def ivfpq_delete(sf_dir: str) -> str:
    """Full-rebuild-on-filtered-table reference for the purged IVFPQ codes
    store (operators/pq.ivfpq_delete): assignment, probes and ADC ranking
    recomputed over the SURVIVING vectors with the ORIGINAL coarse
    centroids and PQ codebooks (no refit — the operator's production
    invariant); a purged query id contributes no output rows, exactly
    like the patched-store search."""
    from .constants import ANN_K2, DELETE_MOD, DELETE_REM

    memb = (
        f"memb AS (SELECT vec_id, embedding FROM embeddings "
        f"WHERE vec_id % {DELETE_MOD} <> {DELETE_REM})"
    )
    return f"""
WITH {memb}, {_ivfpq_core(sf_dir, src="memb")}
SELECT query_id, neighbor_id, adc_dist
FROM adc
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) <= {ANN_K2}
"""


def _ivfpq_refined_cte(sf_dir: str) -> str:
    """CTE chain ending in `refined(query_id, neighbor_id, distance)`:
    the ADC top-REFINE_R shortlist re-ranked by exact euclidean on the raw
    vectors (operators/pq.ann_search_ivfpq_refined)."""
    from .constants import REFINE_R

    return f"""{_ivfpq_core(sf_dir)},
shortlist AS (
  SELECT query_id, neighbor_id FROM adc
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) <= {REFINE_R}
),
refined AS (
  SELECT s.query_id, s.neighbor_id,
         round(list_distance(eq.embedding::DOUBLE[], en.embedding::DOUBLE[]), 6) AS distance
  FROM shortlist s
  JOIN embeddings eq ON eq.vec_id = s.query_id
  JOIN embeddings en ON en.vec_id = s.neighbor_id
)"""


def ann_search_ivfpq_refined(sf_dir: str) -> str:
    from .constants import ANN_K2

    return f"""
WITH {_ivfpq_refined_cte(sf_dir)}
SELECT query_id, neighbor_id, distance
FROM refined
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {ANN_K2}
"""


def ann_recall_ivfpq_refined(sf_dir: str) -> str:
    from .constants import ANN_K2

    exact = _knn_sql("euclidean", KNN_K, N_QUERIES)
    return f"""
WITH {_ivfpq_refined_cte(sf_dir)},
ann AS (
  SELECT query_id, neighbor_id FROM refined
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {ANN_K2}
),
exact AS ({exact}),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM ann a JOIN exact e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1
), ne AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1
)
SELECT ne.query_id, round(COALESCE(h.n_hit, 0) / ne.n_exact, 4) AS recall
FROM ne LEFT JOIN hits h ON h.query_id = ne.query_id
"""


def ann_recall_ivfpq(sf_dir: str) -> str:
    from .constants import ANN_K2

    exact = _knn_sql("euclidean", KNN_K, N_QUERIES)
    return f"""
WITH {_ivfpq_core(sf_dir)},
ann AS (
  SELECT query_id, neighbor_id FROM adc
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) <= {ANN_K2}
),
exact AS ({exact}),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM ann a JOIN exact e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1
), ne AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1
)
SELECT ne.query_id, round(COALESCE(h.n_hit, 0) / ne.n_exact, 4) AS recall
FROM ne LEFT JOIN hits h ON h.query_id = ne.query_id
"""


def ann_recall_ivf(sf_dir: str) -> str:
    from .constants import IVF_NPROBE, KNN_K

    exact = _knn_sql("euclidean", KNN_K, N_QUERIES)
    return f"""
WITH {_ivf_cent_cte(sf_dir)},
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM embeddings e CROSS JOIN cent c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) = 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM embeddings e CROSS JOIN cent c
    WHERE e.vec_id < {N_QUERIES}
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) <= {IVF_NPROBE}
),
ann AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           round(list_distance(eq.embedding::DOUBLE[], en.embedding::DOUBLE[]), 6) AS distance
    FROM probes p
    JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
    JOIN embeddings eq ON eq.vec_id = p.query_id
    JOIN embeddings en ON en.vec_id = a.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {ANN_K2}
),
exact AS ({exact}),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM ann a JOIN exact e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1
), ne AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1
)
SELECT ne.query_id, round(COALESCE(h.n_hit, 0) / ne.n_exact, 4) AS recall
FROM ne LEFT JOIN hits h ON h.query_id = ne.query_id
"""


# ---- PQ (product quantization; operators/pq.py) -----------------------------


def _pq_cent_cte(sf_dir: str, name: str = "cent") -> str:
    """Codebook literals from the same driver-side fit the Spark operator
    uses (PqModel.fit_path) — bit-identical by construction. One row per
    (m, k): the dsub-dim sub-centroid. `name` lets composed oracles
    (IVFPQ) avoid clashing with the IVF centroid CTE."""
    from .operators.pq import model_for

    model = model_for(sf_dir)
    rows = " UNION ALL ".join(
        f"SELECT {mi} AS m, {k} AS k, "
        f"[{','.join(repr(float(x)) for x in model.centroids[mi, k])}]::DOUBLE[] AS c"
        for mi in range(model.m)
        for k in range(model.ksub)
    )
    return f"{name} AS ({rows})", model


def _pq_codes_sql(sf_dir: str, name: str = "cent", src: str = "embeddings") -> tuple[str, object]:
    cent, model = _pq_cent_cte(sf_dir, name)
    dsub = model.dsub
    return (
        f"""{cent},
sub AS (
  SELECT e.vec_id, c.m, c.k,
         round(list_distance(
           (e.embedding::DOUBLE[])[c.m * {dsub} + 1 : (c.m + 1) * {dsub}], c.c), 6) AS d
  FROM {src} e CROSS JOIN {name} c
),
codes AS (
  SELECT vec_id, CAST(m AS INT) AS m, CAST(k AS INT) AS code
  FROM sub QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d, k) = 1
)""",
        model,
    )


def pq_codes(sf_dir: str) -> str:
    cte, _ = _pq_codes_sql(sf_dir)
    return f"WITH {cte} SELECT vec_id, m, code FROM codes"


def ann_search_pq(sf_dir: str) -> str:
    from .constants import ANN_K2, N_QUERIES

    cte, model = _pq_codes_sql(sf_dir)
    dsub = model.dsub
    return f"""
WITH {cte},
dtab AS (
  SELECT q.vec_id AS query_id, c.m, c.k AS code,
         -- round-square-round, matching PqModel.dist_table exactly
         CAST(round(power(round(list_distance(
           (q.embedding::DOUBLE[])[c.m * {dsub} + 1 : (c.m + 1) * {dsub}], c.c), 6), 2), 6)
           AS DECIMAL(18,6)) AS d2
  FROM embeddings q CROSS JOIN cent c
  WHERE q.vec_id < {N_QUERIES}
),
adc AS (
  SELECT d.query_id, co.vec_id AS neighbor_id, CAST(SUM(d.d2) AS DOUBLE) AS adc_dist
  FROM codes co JOIN dtab d ON d.m = co.m AND d.code = co.code
  WHERE co.vec_id <> d.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc_dist
FROM adc
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) <= {ANN_K2}
"""


def ann_recall_pq(sf_dir: str) -> str:
    exact = _knn_sql("euclidean", KNN_K, N_QUERIES)
    inner = ann_search_pq(sf_dir)
    return f"""
WITH ann AS ({inner}),
exact AS ({exact}),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM ann a JOIN exact e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1
), ne AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1
)
SELECT ne.query_id, round(COALESCE(h.n_hit, 0) / ne.n_exact, 4) AS recall
FROM ne LEFT JOIN hits h ON h.query_id = ne.query_id
"""


def label_centroids(sf_dir: str) -> str:
    return """
WITH exploded AS (
  SELECT label, u.idx - 1 AS dim, u.v
  FROM embeddings,
       LATERAL (SELECT unnest(embedding::DOUBLE[]) AS v,
                       generate_subscripts(embedding, 1) AS idx) u
)
SELECT label, CAST(dim AS INT) AS dim,
       round(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean
FROM exploded GROUP BY label, dim
"""


def dedup_semantic(sf_dir: str) -> str:
    """Within-list pairwise cosine ≥ τ over the SAME deterministic k-means
    assignment as the BUILD quantizer (operators/ivf.dedup_semantic uses
    graph_model_for: lists ∝ N, coinciding with the serving quantizer at
    the test SFs)."""
    from .constants import SEMDEDUP_TAU

    cos = "round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6)"
    return f"""
WITH {_graph_cent_cte(sf_dir)},
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM embeddings e CROSS JOIN gcent c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) = 1
)
SELECT CAST(a.list_id AS INT) AS list_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
       {cos} AS cosine
FROM assign a
JOIN assign b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
JOIN embeddings ea ON ea.vec_id = a.vec_id
JOIN embeddings eb ON eb.vec_id = b.vec_id
WHERE {cos} >= {SEMDEDUP_TAU}
"""


def range_search(sf_dir: str) -> str:
    from .constants import RANGE_RADIUS

    return f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
     i AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nv FROM embeddings)
SELECT q.qid AS query_id, i.nid AS neighbor_id,
       round(list_distance(q.qv, i.nv), 6) AS distance
FROM q JOIN i ON i.nid <> q.qid
WHERE round(list_distance(q.qv, i.nv), 6) <= {RANGE_RADIUS}
"""


def knn_graph(sf_dir: str) -> str:
    """Per-list kNN graph over the SAME deterministic k-means assignment as
    the BUILD quantizer (operators/ivf.knn_graph uses graph_model_for:
    lists ∝ N, coinciding with the serving quantizer at the test SFs)."""
    from .constants import KNN_GRAPH_K

    return f"""
WITH {_graph_cent_cte(sf_dir)},
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM embeddings e CROSS JOIN gcent c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) = 1
)
SELECT vec_a, vec_b, distance FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_distance(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) AS distance
  FROM assign a
  JOIN assign b ON a.list_id = b.list_id AND a.vec_id <> b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
) QUALIFY row_number() OVER (PARTITION BY vec_a ORDER BY distance, vec_b) <= {KNN_GRAPH_K}
"""


# ---- graph-expanded ANN (operators/graph.py) --------------------------------


def _graph_cent_cte(sf_dir: str) -> str:
    """BUILD-quantizer centroid literals (operators/graph.graph_model_for:
    lists ∝ N, same deterministic driver-side fit) — named gcent so the
    serving quantizer's cent CTE can coexist in the same query."""
    from .operators.graph import graph_model_for

    cent = graph_model_for(sf_dir).centroids
    rows = " UNION ALL ".join(
        f"SELECT {i} AS list_id, [{','.join(repr(float(x)) for x in cent[i])}]::DOUBLE[] AS c"
        for i in range(len(cent))
    )
    return f"gcent AS ({rows})"


def _graph_edges_cte(sf_dir: str, src: str = "embeddings") -> str:
    """mem (GRAPH_PROBES nearest-list memberships per vector) + edges (top
    GRAPH_DEGREE neighbors within the union of co-memberships) — the exact
    mirror of operators/graph.build_graph_edges. Callers prepend
    _graph_cent_cte. `src` swaps the corpus the graph is CONSTRUCTED over
    (the rebuild oracle builds on the surviving vectors — fresh
    construction, original build quantizer)."""
    from .constants import GRAPH_DEGREE, GRAPH_PROBES

    return f"""
mem AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM {src} e CROSS JOIN gcent c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) <= {GRAPH_PROBES}
),
edges AS (
  SELECT vec_a, vec_b, distance FROM (
    SELECT p.vec_a, p.vec_b,
           round(list_distance(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) AS distance
    FROM (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM mem a JOIN mem b ON a.list_id = b.list_id AND a.vec_id <> b.vec_id) p
    JOIN {src} ea ON ea.vec_id = p.vec_a
    JOIN {src} eb ON eb.vec_id = p.vec_b
  ) QUALIFY row_number() OVER (PARTITION BY vec_a ORDER BY distance, vec_b) <= {GRAPH_DEGREE}
)"""


def knn_graph_multiprobe(sf_dir: str) -> str:
    """Overlapping-partition kNN graph (operators/graph.knn_graph_multiprobe)."""
    return f"""
WITH {_graph_cent_cte(sf_dir)},
{_graph_edges_cte(sf_dir)}
SELECT vec_a, vec_b, distance FROM edges
"""


def embedding_clusters(sf_dir: str) -> str:
    """Transitive closure over the graph's near-dup edges (distance ≤
    GRAPH_CLUSTER_TAU) via WITH RECURSIVE — the declarative twin of the
    Spark label-propagation loop (operators/graph.embedding_clusters)."""
    from .constants import GRAPH_CLUSTER_TAU

    return f"""
WITH RECURSIVE {_graph_cent_cte(sf_dir)},
{_graph_edges_cte(sf_dir)},
near AS (
  SELECT vec_a, vec_b FROM edges WHERE distance <= {GRAPH_CLUSTER_TAU}
),
sym AS (
  SELECT vec_a, vec_b FROM near
  UNION ALL
  SELECT vec_b, vec_a FROM near
),
reach(vec_id, r) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT s.vec_a, reach.r
  FROM reach JOIN sym s ON s.vec_b = reach.vec_id
)
SELECT vec_id, MIN(r) AS cluster_id FROM reach GROUP BY vec_id
"""


def _graph_ann_cte(
    sf_dir: str, src: str = "embeddings", edge_pred: str = "", edges_src: str = "embeddings"
) -> str:
    """seeds (nprobe=1 list members, top GRAPH_SEED_K) → 1-hop expansion →
    exact rerank: ann AS (query_id, neighbor_id, distance) — the mirror of
    operators/graph.ann_search_graph. `src` swaps the corpus table (the
    delete oracle passes a filtered `memb`); `edge_pred`, when set,
    inserts a live_edges CTE filtering the ORIGINAL full-corpus graph —
    the edge-patch (mark-delete) contract, NOT a graph rebuild; the
    rebuild oracle instead sets `edges_src` so the graph is CONSTRUCTED
    fresh on the surviving corpus."""
    from .constants import ANN_K2, GRAPH_SEED_K, N_QUERIES

    etab = "edges"
    live = ""
    if edge_pred:
        etab = "live_edges"
        live = f"live_edges AS (SELECT * FROM edges WHERE {edge_pred}),\n"
    return f"""
{_graph_edges_cte(sf_dir, src=edges_src)},
{live}assign AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM {src} e CROSS JOIN cent c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) = 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM {src} e CROSS JOIN cent c
    WHERE e.vec_id < {N_QUERIES}
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) = 1
),
seeds AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           round(list_distance(eq.embedding::DOUBLE[], en.embedding::DOUBLE[]), 6) AS distance
    FROM probes p
    JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
    JOIN {src} eq ON eq.vec_id = p.query_id
    JOIN {src} en ON en.vec_id = a.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {GRAPH_SEED_K}
),
cand AS (
  SELECT DISTINCT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id FROM seeds
    UNION ALL
    SELECT s.query_id, e.vec_b AS neighbor_id
    FROM seeds s JOIN {etab} e ON e.vec_a = s.neighbor_id
  ) u WHERE neighbor_id <> query_id
),
ann AS (
  SELECT query_id, neighbor_id, distance FROM (
    SELECT c.query_id, c.neighbor_id,
           round(list_distance(eq.embedding::DOUBLE[], en.embedding::DOUBLE[]), 6) AS distance
    FROM cand c
    JOIN {src} eq ON eq.vec_id = c.query_id
    JOIN {src} en ON en.vec_id = c.neighbor_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {ANN_K2}
)"""


def ann_search_graph(sf_dir: str) -> str:
    return f"""
WITH {_ivf_cent_cte(sf_dir)},
{_graph_cent_cte(sf_dir)},
{_graph_ann_cte(sf_dir)}
SELECT query_id, neighbor_id, distance FROM ann
"""


def graph_delete(sf_dir: str) -> str:
    """Edge-patch (mark-delete) reference for the purged graph store
    (operators/graph.graph_delete): seeds, rerank and queries recomputed
    over the SURVIVING vectors with the ORIGINAL quantizers, and the hop
    walks the ORIGINAL full-corpus graph MINUS every edge touching a
    doomed id — deliberately NOT a graph rebuild (a rebuilt kNN graph
    would discover replacement neighbors; HNSW/FAISS deletes don't, and
    neither does this contract — see the operator docstring)."""
    from .constants import DELETE_MOD, DELETE_REM

    memb = (
        f"memb AS (SELECT vec_id, embedding FROM embeddings "
        f"WHERE vec_id % {DELETE_MOD} <> {DELETE_REM})"
    )
    pred = (
        f"vec_a % {DELETE_MOD} <> {DELETE_REM} "
        f"AND vec_b % {DELETE_MOD} <> {DELETE_REM}"
    )
    return f"""
WITH {_ivf_cent_cte(sf_dir)},
{_graph_cent_cte(sf_dir)},
{memb},
{_graph_ann_cte(sf_dir, src="memb", edge_pred=pred)}
SELECT query_id, neighbor_id, distance FROM ann
"""


def graph_rebuild(sf_dir: str) -> str:
    """Periodic offline REBUILD reference (operators/graph.graph_rebuild):
    after deletes accumulate to GRAPH_REBUILD_MOD's 25% fraction, the
    recovery is fresh graph CONSTRUCTION on the surviving corpus with the
    ORIGINAL build quantizer (no refit — the #151-#155 maintenance
    convention), so the oracle swaps the edges CTE's corpus to the
    survivors (edges_src) instead of filtering the stale full-corpus graph
    (graph_delete's edge_pred). Seeds/rerank/queries likewise over the
    survivors with the original serving quantizer."""
    from .constants import GRAPH_REBUILD_MOD, GRAPH_REBUILD_REM

    memb = (
        f"memb AS (SELECT vec_id, embedding FROM embeddings "
        f"WHERE vec_id % {GRAPH_REBUILD_MOD} <> {GRAPH_REBUILD_REM})"
    )
    return f"""
WITH {_ivf_cent_cte(sf_dir)},
{_graph_cent_cte(sf_dir)},
{memb},
{_graph_ann_cte(sf_dir, src="memb", edges_src="memb")}
SELECT query_id, neighbor_id, distance FROM ann
"""


def _graph_beam_cte(sf_dir: str) -> str:
    """Best-first beam refinement, unrolled round-for-round against the
    Spark loop (operators/graph.ann_search_graph_beam): pool0 = scored
    seeds; each round takes the BEAM_WIDTH best not-yet-expanded pool rows
    per query (expansion history = the earlier beam CTEs), walks only
    their out-edges, scores only unseen targets, and unions them into the
    pool. Ends in ann AS (query_id, neighbor_id, distance) top-ANN_K2."""
    from .constants import ANN_K2, BEAM_ROUNDS, BEAM_WIDTH, GRAPH_SEED_K, N_QUERIES

    rounds = []
    prev = "pool0"
    for r in range(1, BEAM_ROUNDS + 1):
        not_expanded = " AND ".join(
            f"NOT EXISTS (SELECT 1 FROM beam{i} b{i} "
            f"WHERE b{i}.query_id = p.query_id AND b{i}.neighbor_id = p.neighbor_id)"
            for i in range(1, r)
        )
        where_ne = f"WHERE {not_expanded}" if not_expanded else ""
        rounds.append(
            f"""beam{r} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, p.neighbor_id, p.distance FROM {prev} p {where_ne}
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {BEAM_WIDTH}
),
hop{r} AS (
  SELECT DISTINCT b.query_id, e.vec_b AS neighbor_id
  FROM beam{r} b JOIN edges e ON e.vec_a = b.neighbor_id
  WHERE e.vec_b <> b.query_id
),
new{r} AS (
  SELECT h.query_id, h.neighbor_id FROM hop{r} h
  WHERE NOT EXISTS (SELECT 1 FROM {prev} p
                    WHERE p.query_id = h.query_id AND p.neighbor_id = h.neighbor_id)
),
pool{r} AS (
  SELECT query_id, neighbor_id, distance FROM {prev}
  UNION ALL
  SELECT n.query_id, n.neighbor_id,
         round(list_distance(eq.embedding::DOUBLE[], en.embedding::DOUBLE[]), 6) AS distance
  FROM new{r} n
  JOIN embeddings eq ON eq.vec_id = n.query_id
  JOIN embeddings en ON en.vec_id = n.neighbor_id
)"""
        )
        prev = f"pool{r}"
    body = ",\n".join(rounds)
    return f"""{_graph_edges_cte(sf_dir)},
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM embeddings e CROSS JOIN cent c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) = 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM embeddings e CROSS JOIN cent c
    WHERE e.vec_id < {N_QUERIES}
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) = 1
),
pool0 AS (
  SELECT query_id, neighbor_id, distance FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           round(list_distance(eq.embedding::DOUBLE[], en.embedding::DOUBLE[]), 6) AS distance
    FROM probes p
    JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
    JOIN embeddings eq ON eq.vec_id = p.query_id
    JOIN embeddings en ON en.vec_id = a.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {GRAPH_SEED_K}
),
{body},
ann AS (
  SELECT query_id, neighbor_id, distance FROM {prev}
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {ANN_K2}
)"""


def ann_search_graph_beam(sf_dir: str) -> str:
    return f"""
WITH {_ivf_cent_cte(sf_dir)},
{_graph_cent_cte(sf_dir)},
{_graph_beam_cte(sf_dir)}
SELECT query_id, neighbor_id, distance FROM ann
"""


def ann_recall_graph_beam(sf_dir: str) -> str:
    from .constants import KNN_K

    exact = _knn_sql("euclidean", KNN_K, N_QUERIES)
    return f"""
WITH {_ivf_cent_cte(sf_dir)},
{_graph_cent_cte(sf_dir)},
{_graph_beam_cte(sf_dir)},
exact AS ({exact}),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM ann a JOIN exact e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1
), ne AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1
)
SELECT ne.query_id, round(COALESCE(h.n_hit, 0) / ne.n_exact, 4) AS recall
FROM ne LEFT JOIN hits h ON h.query_id = ne.query_id
"""


def ann_recall_graph(sf_dir: str) -> str:
    from .constants import KNN_K

    exact = _knn_sql("euclidean", KNN_K, N_QUERIES)
    return f"""
WITH {_ivf_cent_cte(sf_dir)},
{_graph_cent_cte(sf_dir)},
{_graph_ann_cte(sf_dir)},
exact AS ({exact}),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM ann a JOIN exact e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1
), ne AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1
)
SELECT ne.query_id, round(COALESCE(h.n_hit, 0) / ne.n_exact, 4) AS recall
FROM ne LEFT JOIN hits h ON h.query_id = ne.query_id
"""


def ann_recall_graph_sweep(sf_dir: str) -> str:
    """Recall at every expansion depth 0..GRAPH_SWEEP_HOPS from ONE seed
    CTE and one edge CTE (operators/graph.ann_recall_graph_sweep): frontier
    f{h} = f{h-1} ∪ its out-edge targets (dedup), candidates exclude the
    query itself only at rerank time — exactly the Spark loop."""
    from .constants import ANN_K2, GRAPH_SEED_K, GRAPH_SWEEP_HOPS, KNN_K

    exact = _knn_sql("euclidean", KNN_K, N_QUERIES)
    # seeds CTE comes from _graph_ann_cte's prefix; rebuild just the parts
    # we need (assign/probes/seeds) and the frontier chain
    frontier_ctes, ann_selects = [], []
    prev = "f0"
    frontier_ctes.append("f0 AS (SELECT query_id, neighbor_id FROM seeds)")
    for h in range(1, GRAPH_SWEEP_HOPS + 1):
        cur = f"f{h}"
        frontier_ctes.append(
            f"""{cur} AS (
  SELECT DISTINCT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id FROM {prev}
    UNION ALL
    SELECT f.query_id, e.vec_b AS neighbor_id
    FROM {prev} f JOIN edges e ON e.vec_a = f.neighbor_id
  ) u
)"""
        )
        prev = cur
    for h in range(GRAPH_SWEEP_HOPS + 1):
        ann_selects.append(
            f"""SELECT {h} AS hops, query_id, neighbor_id FROM (
  SELECT c.query_id, c.neighbor_id,
         round(list_distance(eq.embedding::DOUBLE[], en.embedding::DOUBLE[]), 6) AS distance
  FROM (SELECT DISTINCT query_id, neighbor_id FROM f{h}
        WHERE neighbor_id <> query_id) c
  JOIN embeddings eq ON eq.vec_id = c.query_id
  JOIN embeddings en ON en.vec_id = c.neighbor_id
) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {ANN_K2}"""
        )
    anns = "\nUNION ALL\n".join(ann_selects)
    return f"""
WITH {_ivf_cent_cte(sf_dir)},
{_graph_cent_cte(sf_dir)},
{_graph_edges_cte(sf_dir)},
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM embeddings e CROSS JOIN cent c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) = 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS cd
    FROM embeddings e CROSS JOIN cent c
    WHERE e.vec_id < {N_QUERIES}
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) = 1
),
seeds AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           round(list_distance(eq.embedding::DOUBLE[], en.embedding::DOUBLE[]), 6) AS distance
    FROM probes p
    JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
    JOIN embeddings eq ON eq.vec_id = p.query_id
    JOIN embeddings en ON en.vec_id = a.vec_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {GRAPH_SEED_K}
),
{",".join(frontier_ctes)},
ann AS (
{anns}
),
exact AS ({exact}),
hits AS (
  SELECT a.hops, a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM ann a JOIN exact e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1, 2
), ne AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1
), grid AS (
  SELECT h.hops, ne.query_id, ne.n_exact
  FROM ne CROSS JOIN (SELECT unnest(range(0, {GRAPH_SWEEP_HOPS + 1})) AS hops) h
)
SELECT CAST(g.hops AS INT) AS hops, g.query_id,
       round(COALESCE(h.n_hit, 0) / g.n_exact, 4) AS recall
FROM grid g LEFT JOIN hits h ON h.hops = g.hops AND h.query_id = g.query_id
"""


def sq8_quantize(sf_dir: str) -> str:
    from .constants import SQ8_LEVELS

    return f"""
WITH exploded AS (
  SELECT vec_id, CAST(u.idx - 1 AS INT) AS dim, u.v
  FROM embeddings,
       LATERAL (SELECT unnest(embedding::DOUBLE[]) AS v,
                       generate_subscripts(embedding, 1) AS idx) u
),
rng AS (
  SELECT dim, MIN(v) AS dmin, MAX(v) AS dmax FROM exploded GROUP BY dim
)
SELECT vec_id, e.dim,
       CAST(LEAST({SQ8_LEVELS}, GREATEST(0,
            CAST(FLOOR((e.v - r.dmin) / ((r.dmax - r.dmin) / {SQ8_LEVELS}.0) + 0.5) AS INT))) AS INT) AS code,
       CAST(FLOOR((e.v - (r.dmin + LEAST({SQ8_LEVELS}, GREATEST(0,
            CAST(FLOOR((e.v - r.dmin) / ((r.dmax - r.dmin) / {SQ8_LEVELS}.0) + 0.5) AS INT)))
            * ((r.dmax - r.dmin) / {SQ8_LEVELS}.0))) * 1000000.0 + 0.5) AS BIGINT) AS err_micros
FROM exploded e JOIN rng r ON r.dim = e.dim
"""


def _sq8_deq_cte() -> str:
    """embeddings → SQ8 round-trip vectors (exact mirror of
    operators/pq._dequant_expr, with MIN/MAX computed in SQL — identical
    doubles to the driver-side numpy fit)."""
    from .constants import SQ8_LEVELS

    deq_val = (
        f"r.dmin + LEAST({SQ8_LEVELS}, GREATEST(0, "
        f"CAST(FLOOR((e.v - r.dmin) / r.scale + 0.5) AS INT)))::DOUBLE * r.scale"
    )
    return f"""
exploded AS (
  SELECT vec_id, CAST(u.idx - 1 AS INT) AS dim, u.v
  FROM embeddings,
       LATERAL (SELECT unnest(embedding::DOUBLE[]) AS v,
                       generate_subscripts(embedding, 1) AS idx) u
), rng AS (
  SELECT dim, MIN(v) AS dmin, (MAX(v) - MIN(v)) / {SQ8_LEVELS}.0 AS scale
  FROM exploded GROUP BY dim
), deq AS (
  SELECT vec_id, list({deq_val} ORDER BY e.dim) AS dv
  FROM exploded e JOIN rng r ON r.dim = e.dim
  GROUP BY vec_id
)"""


def ann_search_sq8(sf_dir: str) -> str:
    from .constants import KNN_K

    return f"""
WITH {_sq8_deq_cte()},
q AS (SELECT vec_id AS qid, dv AS qv FROM deq WHERE vec_id < {N_QUERIES}),
i AS (SELECT vec_id AS nid, dv AS nv FROM deq)
SELECT query_id, neighbor_id, distance FROM (
  SELECT q.qid AS query_id, i.nid AS neighbor_id,
         round(list_distance(q.qv, i.nv), 6) AS distance,
         row_number() OVER (PARTITION BY q.qid
                            ORDER BY round(list_distance(q.qv, i.nv), 6), i.nid) AS rn
  FROM q JOIN i ON i.nid <> q.qid)
WHERE rn <= {KNN_K}
"""


def ann_recall_sq8(sf_dir: str) -> str:
    from .constants import KNN_K

    exact = _knn_sql("euclidean", KNN_K, N_QUERIES)
    return f"""
WITH {_sq8_deq_cte()},
q AS (SELECT vec_id AS qid, dv AS qv FROM deq WHERE vec_id < {N_QUERIES}),
i AS (SELECT vec_id AS nid, dv AS nv FROM deq),
ann AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.qid AS query_id, i.nid AS neighbor_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY round(list_distance(q.qv, i.nv), 6), i.nid) AS rn
    FROM q JOIN i ON i.nid <> q.qid)
  WHERE rn <= {KNN_K}
),
exact AS ({exact}),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM ann a JOIN exact e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1
), ne AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1
)
SELECT ne.query_id, round(COALESCE(h.n_hit, 0) / ne.n_exact, 4) AS recall
FROM ne LEFT JOIN hits h ON h.query_id = ne.query_id
"""


def hybrid_search_rrf(sf_dir: str) -> str:
    """Hybrid BM25 ⊕ ANN reciprocal-rank fusion
    (operators/search.hybrid_search_rrf mirror): BM25 ranks from
    oracles_text.bm25_core, ANN ranks from the LSH search over the
    document-backed vectors (the semantic_doc_search CTE), fused as
    Σ round(1/(RRF_K + rank), 6) in decimal."""
    from .constants import ANN_K2, RRF_K
    from .oracles_text import bm25_core

    model = lsh_model_for(sf_dir)
    return f"""
WITH {bm25_core()},
{_ann_two_sided_core(model, "vec_id IN (SELECT doc_id FROM documents)")},
bm_rank AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM bm
),
ann_rank AS (
  SELECT query_id, neighbor_id AS doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) AS rank
  FROM ann
),
fused AS (
  SELECT query_id, doc_id,
         CAST(SUM(CAST(round(1.0 / ({RRF_K} + rank), 6) AS DECIMAL(18,6))) AS DOUBLE)
           AS rrf_score,
         CAST(MAX(bmflag) AS BOOLEAN) AS in_bm25,
         COUNT(*) - MAX(bmflag) > 0 AS in_ann
  FROM (
    SELECT query_id, doc_id, rank, 1 AS bmflag FROM bm_rank
    UNION ALL
    SELECT query_id, doc_id, rank, 0 AS bmflag FROM ann_rank
  ) GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, rrf_score, in_bm25, in_ann FROM fused
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) <= {ANN_K2}
"""


def _multiprobe_qh(model, nq: int, p: int) -> str:
    """Query-side multi-probe hashes (operators/lsh.probe_hash_udf mirror):
    per table the base hash plus p variants flipping the lowest-|margin|
    bits; the (|margin|, bit) struct sort is DuckDB's list_sort, matching
    numpy's stable argsort tie rule."""
    parts = []
    for t in range(model.tables):
        structs = []
        for b in range(model.bits):
            i = t * model.bits + b
            lit = "[" + ",".join(repr(float(x)) for x in model.normals[i]) + "]"
            c = repr(float(model.offsets[i]))
            structs.append(
                "struct_pack(a := abs(round(list_dot_product(embedding::DOUBLE[], "
                f"CAST({lit} AS DOUBLE[])) - ({c}), 6)), j := {b})"
            )
        probes = "[h" + "".join(
            f", xor(h, CAST(1 << f[{i + 1}] AS BIGINT))" for i in range(p)
        ) + "]"
        parts.append(
            f"SELECT vec_id, CAST({t} AS INT) AS tbl, unnest({probes}) AS hash\n"
            f"FROM (SELECT vec_id, {_hash_sql(model, t)} AS h,\n"
            f"             list_transform(list_sort([{', '.join(structs)}]), x -> x.j) AS f\n"
            f"      FROM embeddings WHERE vec_id < {nq})"
        )
    return "\nUNION ALL\n".join(parts)


def _multiprobe_core(sf_dir: str) -> str:
    """CTE chain ending in `ann` for the multi-probe search."""
    from .constants import LSH_MULTIPROBE

    model = lsh_model_for(sf_dir)
    return f"""hashes AS (
{_hashes_cte(model)}
), qh AS (
{_multiprobe_qh(model, N_QUERIES, LSH_MULTIPROBE)}
), cand AS (
  SELECT q.vec_id AS query_id, i.vec_id AS neighbor_id, CAST(COUNT(*) AS BIGINT) AS n_match
  FROM hashes i JOIN qh q ON i.tbl = q.tbl AND i.hash = q.hash
  WHERE i.vec_id <> q.vec_id
  GROUP BY 1, 2
), k1_sel AS (
  SELECT query_id, neighbor_id, n_match,
         row_number() OVER (PARTITION BY query_id ORDER BY n_match DESC, neighbor_id) AS rn
  FROM cand
), ann AS (
  SELECT query_id, neighbor_id, n_match, distance
  FROM (SELECT k.query_id, k.neighbor_id, k.n_match,
               round(list_distance(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 6) AS distance,
               row_number() OVER (PARTITION BY k.query_id
                                  ORDER BY round(list_distance(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 6), k.neighbor_id) AS rn2
        FROM k1_sel k
        JOIN embeddings qe ON qe.vec_id = k.query_id
        JOIN embeddings ne ON ne.vec_id = k.neighbor_id
        WHERE k.rn <= {ANN_K1})
  WHERE rn2 <= {ANN_K2}
)"""


def ann_search_lsh_multiprobe(sf_dir: str) -> str:
    return f"""
WITH {_multiprobe_core(sf_dir)}
SELECT * FROM ann
"""


def ann_recall_lsh_multiprobe(sf_dir: str) -> str:
    exact = _knn_sql("euclidean", KNN_K, N_QUERIES)
    return f"""
WITH {_multiprobe_core(sf_dir)},
a2 AS (SELECT query_id, neighbor_id FROM ann),
exact AS ({exact}),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM a2 a JOIN exact e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1
), ne AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1
)
SELECT ne.query_id, round(COALESCE(h.n_hit, 0) / ne.n_exact, 4) AS recall
FROM ne LEFT JOIN hits h ON h.query_id = ne.query_id
"""


def index_stats(sf_dir: str) -> str:
    # occupancy histograms of both index families, composed from the same
    # deterministic model fits the Spark side uses
    return f"""
WITH hashes AS (
{_hashes_cte(lsh_model_for(sf_dir))}
), lsh_b AS (
  SELECT tbl, hash, COUNT(*) AS sz FROM hashes GROUP BY 1, 2
), {_ivf_cent_cte(sf_dir)},
d AS (
  SELECT e.vec_id, c.list_id,
         round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS center_dist
  FROM embeddings e CROSS JOIN cent c
), assign AS (
  SELECT vec_id, list_id FROM d
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY center_dist, list_id) = 1
), ivf_b AS (
  SELECT list_id, COUNT(*) AS sz FROM assign GROUP BY 1
)
SELECT 'lsh' AS family, CAST(sz AS BIGINT) AS sz, CAST(COUNT(*) AS BIGINT) AS n_buckets
FROM lsh_b GROUP BY 2
UNION ALL
SELECT 'ivf' AS family, CAST(sz AS BIGINT) AS sz, CAST(COUNT(*) AS BIGINT) AS n_buckets
FROM ivf_b GROUP BY 2
"""


def _matryoshka_cte(nq: int) -> str:
    from .constants import MRL_DIMS, MRL_K1

    return f"""q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {nq}
), i AS (
  SELECT vec_id AS nid, embedding::DOUBLE[] AS nv FROM embeddings
), coarse AS (
  SELECT q.qid AS query_id, i.nid AS neighbor_id,
         round(list_distance(q.qv[1:{MRL_DIMS}], i.nv[1:{MRL_DIMS}]), 6) AS coarse_distance,
         q.qv AS qv, i.nv AS nv
  FROM q JOIN i ON i.nid <> q.qid
), short AS (
  SELECT * FROM coarse
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY coarse_distance, neighbor_id) <= {MRL_K1}
), reranked AS (
  SELECT query_id, neighbor_id, coarse_distance,
         round(list_distance(qv, nv), 6) AS distance
  FROM short
)"""


def ann_search_matryoshka(sf_dir: str) -> str:
    from .constants import ANN_K2

    return f"""
WITH {_matryoshka_cte(N_QUERIES)}
SELECT query_id, neighbor_id, coarse_distance, distance FROM reranked
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {ANN_K2}
"""


def ann_recall_matryoshka(sf_dir: str) -> str:
    from .constants import ANN_K2

    exact = _knn_sql("euclidean", KNN_K, N_QUERIES)
    return f"""
WITH {_matryoshka_cte(N_QUERIES)},
ann AS (
  SELECT query_id, neighbor_id FROM reranked
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {ANN_K2}
),
exact AS ({exact}),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM ann a JOIN exact e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1
), ne AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1
)
SELECT ne.query_id, round(COALESCE(h.n_hit, 0) / ne.n_exact, 4) AS recall
FROM ne LEFT JOIN hits h ON h.query_id = ne.query_id
"""


def ivf_delete(sf_dir: str) -> str:
    """Full-rebuild-on-filtered-table reference for the purged IVF store
    (operators/ivf.ivf_delete): assignment AND search recomputed over the
    SURVIVING vectors with the ORIGINAL centroids (no refit — the
    operator's production invariant); a purged query id contributes no
    output rows, exactly like the patched-store search."""
    from .constants import ANN_K2, DELETE_MOD, DELETE_REM, IVF_NPROBE, N_QUERIES

    memb = (
        f"memb AS (SELECT vec_id, embedding::DOUBLE[] AS embedding "
        f"FROM embeddings WHERE vec_id % {DELETE_MOD} <> {DELETE_REM})"
    )
    return f"""
WITH {memb}, {_ivf_cent_cte(sf_dir)},
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding, c.c), 6) AS cd
    FROM memb e CROSS JOIN cent c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) = 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding, c.c), 6) AS cd
    FROM memb e CROSS JOIN cent c
    WHERE e.vec_id < {N_QUERIES}
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) <= {IVF_NPROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, CAST(a.list_id AS INT) AS list_id,
         round(list_distance(eq.embedding, en.embedding), 6) AS distance
  FROM probes p
  JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
  JOIN memb eq ON eq.vec_id = p.query_id
  JOIN memb en ON en.vec_id = a.vec_id
)
SELECT query_id, neighbor_id, list_id, distance
FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {ANN_K2}
"""


def ivf_upsert(sf_dir: str) -> str:
    """Full-rebuild-on-updated-table reference for the patched IVF store
    (operators/ivf.ivf_upsert): assignment AND search recomputed over the
    updated vectors with the ORIGINAL centroids (no refit — mirroring the
    operator's production invariant)."""
    from .constants import ANN_K2, IVF_NPROBE, N_QUERIES, UPSERT_MOD

    memb = (
        f"memb AS (SELECT vec_id, CASE WHEN vec_id % {UPSERT_MOD} = 0 "
        "THEN list_transform(embedding::DOUBLE[], x -> x * 2.0) "
        "ELSE embedding::DOUBLE[] END AS embedding FROM embeddings)"
    )
    return f"""
WITH {memb}, {_ivf_cent_cte(sf_dir)},
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding, c.c), 6) AS cd
    FROM memb e CROSS JOIN cent c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) = 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           round(list_distance(e.embedding, c.c), 6) AS cd
    FROM memb e CROSS JOIN cent c
    WHERE e.vec_id < {N_QUERIES}
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cd, list_id) <= {IVF_NPROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, CAST(a.list_id AS INT) AS list_id,
         round(list_distance(eq.embedding, en.embedding), 6) AS distance
  FROM probes p
  JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
  JOIN memb eq ON eq.vec_id = p.query_id
  JOIN memb en ON en.vec_id = a.vec_id
)
SELECT query_id, neighbor_id, list_id, distance
FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {ANN_K2}
"""


def _bitsign_codes_cte() -> str:
    """embeddings → packed sign bits (exact mirror of
    operators/pq._bitsign_code_cols): mid = (MIN+MAX)*0.5 per dim is the
    same one-add-one-mul IEEE arithmetic the driver-side numpy fit runs,
    bit weight (1::BIGINT << ((dim-1) % 32)) matches Spark's i % 32 word
    layout. Two 32-bit words — DuckDB overflows on 1::BIGINT << 63."""
    return """ex AS (
  SELECT vec_id, CAST(u.idx AS INT) AS dim, u.v
  FROM embeddings,
       LATERAL (SELECT unnest(embedding::DOUBLE[]) AS v,
                       generate_subscripts(embedding, 1) AS idx) u
), mids AS (
  SELECT dim, (MIN(v) + MAX(v)) * 0.5 AS mid FROM ex GROUP BY 1
), codes AS (
  SELECT e.vec_id,
         SUM(CASE WHEN e.dim <= 32 AND e.v > m.mid
                  THEN (1::BIGINT << ((e.dim - 1) % 32)) ELSE 0 END)::BIGINT AS code_lo,
         SUM(CASE WHEN e.dim > 32 AND e.v > m.mid
                  THEN (1::BIGINT << ((e.dim - 1) % 32)) ELSE 0 END)::BIGINT AS code_hi
  FROM ex e JOIN mids m ON m.dim = e.dim
  GROUP BY 1
)"""


def bitsign_codes(sf_dir: str) -> str:
    return f"""
WITH {_bitsign_codes_cte()}
SELECT vec_id, code_lo, code_hi FROM codes
"""


def _bitsign_rerank_cte(nq: int) -> str:
    from .constants import BITSIGN_K1

    return f"""{_bitsign_codes_cte()},
qc AS (
  SELECT vec_id AS query_id, code_lo AS q_lo, code_hi AS q_hi
  FROM codes WHERE vec_id < {nq}
), coarse AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(bit_count(xor(c.code_lo, q.q_lo))
              + bit_count(xor(c.code_hi, q.q_hi)) AS BIGINT) AS hamming
  FROM codes c JOIN qc q ON c.vec_id <> q.query_id
), short AS (
  SELECT * FROM coarse
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) <= {BITSIGN_K1}
), reranked AS (
  SELECT s.query_id, s.neighbor_id, s.hamming,
         round(list_distance(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 6) AS distance
  FROM short s
  JOIN embeddings ne ON ne.vec_id = s.neighbor_id
  JOIN embeddings qe ON qe.vec_id = s.query_id
)"""


def ann_search_bitsign(sf_dir: str) -> str:
    from .constants import ANN_K2

    return f"""
WITH {_bitsign_rerank_cte(N_QUERIES)}
SELECT query_id, neighbor_id, hamming, distance FROM reranked
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {ANN_K2}
"""


def ann_recall_bitsign(sf_dir: str) -> str:
    from .constants import ANN_K2

    exact = _knn_sql("euclidean", KNN_K, N_QUERIES)
    return f"""
WITH {_bitsign_rerank_cte(N_QUERIES)},
ann AS (
  SELECT query_id, neighbor_id FROM reranked
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY distance, neighbor_id) <= {ANN_K2}
),
exact AS ({exact}),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM ann a JOIN exact e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1
), ne AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1
)
SELECT ne.query_id, round(COALESCE(h.n_hit, 0) / ne.n_exact, 4) AS recall
FROM ne LEFT JOIN hits h ON h.query_id = ne.query_id
"""


def aknn_http_doc_get(sf_dir: str) -> str:
    """ES GET /{index}/{id} parity oracle (#163): the wire doc GETs must
    reproduce the canonical query rows of the embeddings parquet
    component-for-component — JSON emits shortest-repr doubles and
    parses them back to identical float64, and widening float→double is
    exact in both engines, so the compare is bit-exact."""
    from .constants import N_QUERIES

    return f"""
SELECT vec_id, CAST(u.idx - 1 AS INT) AS dim, u.v AS x
FROM embeddings,
     LATERAL (SELECT unnest(embedding::DOUBLE[]) AS v,
                     generate_subscripts(embedding, 1) AS idx) u
WHERE vec_id < {N_QUERIES}
"""
