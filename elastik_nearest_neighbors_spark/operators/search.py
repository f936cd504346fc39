"""Full-text and hybrid retrieval — the Elasticsearch side of the house.

The reference engine is an Elasticsearch plugin: its vector search rides
next to ES's native primitive, BM25 keyword scoring, and modern ES serves
both fused (hybrid search, reciprocal-rank fusion). These operators restate
that surface Spark-first over the `documents` corpus:

- `bm25_doc_search` — Lucene-flavoured BM25 with more-like-this queries
  (the canonical query docs' own token sets), as one declarative plan:
  postings/df/dl aggregations off a single tokenize pass, query terms
  BROADCAST against the postings (the corpus never shuffles for a query
  batch), per-(query, doc) decimal-exact score sum, top-k window.
- `hybrid_search_rrf` — BM25 top-k ⊕ semantic ANN top-k fused by
  reciprocal rank (score = Σ 1/(RRF_K + rank)), ES 8's hybrid ranking.

Scale: the corpus-side aggregations are O(tokens) with map-side combine;
a query batch touches only the posting rows of its own terms via a
broadcast hash join, and the fusion inputs are two Q·k rank lists (KB).
Floats: ln() rounds to DIST_ROUND before use (both engines agree at that
precision — the idf_scores precedent) and all score sums run in
decimal(18,6), so results are bit-stable and order-insensitive.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from ..constants import ANN_K2, BM25_B, BM25_K1, DEC, DIST_ROUND, N_QUERIES, RRF_K
from .. import io
from ..session import configure


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    return io.table(spark, sf_dir, "documents", widen=True)


def _postings(docs: DataFrame) -> DataFrame:
    """(doc_id, token, tf) term frequencies — one tokenize + explode pass,
    map-side-combined count. The inverted index as a DataFrame."""
    return (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_scores(docs: DataFrame, k: int = ANN_K2) -> DataFrame:
    """Top-k BM25 over `docs` for more-like-this queries (query docs =
    doc_id < N_QUERIES, query terms = their distinct tokens, self-match
    excluded).

    score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf / (tf + K1·(1 − B + B·dl/avgdl))
    with Lucene's idf = ln(1 + (N − df + ½)/(df + ½)).

    Plan shape: postings → df (O(vocab) agg) and dl (O(docs) agg) off the
    same pass; the Q·|terms| query-term list BROADCASTS into the postings
    join, so the corpus-side scan is hash-semi-pruned and never shuffles
    for the query batch; the per-(query, doc) sum shuffles only matched
    posting rows (bounded by the query terms' document frequencies).
    idf and per-term scores round to DIST_ROUND, the sum is decimal-exact.

    Output: (query_id, doc_id, score) top-k per query, rank order
    (score DESC, doc_id)."""
    post = _postings(docs)
    # two driver-side scalars (one tiny agg job): corpus size + avg doc len
    # — the alternative crossJoin would shuffle every posting row for no gain
    dl = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    n_docs, total_tokens = docs.count(), dl.agg(F.sum("dl")).collect()[0][0]
    avgdl = float(total_tokens) / float(n_docs)

    idf = post.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = idf.select(
        "token",
        F.round(
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
            DIST_ROUND,
        ).alias("idf"),
    )
    qterms = (
        post.where(F.col("doc_id") < N_QUERIES)
        .select(F.col("doc_id").alias("query_id"), "token")
        .distinct()
    )
    # idf pruned to the QUERY's terms before broadcasting — the full-vocab
    # idf table is O(vocab) (100M+ tokens on a web corpus) and must never
    # broadcast; the pruned one is ≤ |query terms| rows
    q_idf = idf.join(F.broadcast(qterms.select("token").distinct()), "token")
    norm = F.col("tf") / (
        F.col("tf")
        + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl))
    )
    term_scores = (
        post.join(F.broadcast(qterms), "token")
        .where(F.col("doc_id") != F.col("query_id"))
        .join(dl, "doc_id")
        .join(F.broadcast(q_idf), "token")
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("idf") * norm, DIST_ROUND).cast(DEC).alias("ts"),
        )
    )
    scored = term_scores.groupBy("query_id", "doc_id").agg(
        F.sum("ts").cast("double").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")


def bm25_doc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_scores(_docs(spark, sf_dir))


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-k and semantic ANN top-k (LSH over the
    document-backed vectors, the semantic_doc_search path) fused by
    reciprocal rank — score = Σ_systems 1/(RRF_K + rank), Elasticsearch 8's
    rank fusion. A doc found by both systems sums both terms (full outer
    union on the two Q·k rank lists — KB-sized, the fusion itself is free).

    Per-system ranks use each system's own deterministic order (BM25:
    score DESC, doc_id; ANN: distance ASC, neighbor_id — the rank the
    search entries already emit). RRF terms round to DIST_ROUND and sum in
    decimal, same float discipline as everywhere else.

    Output: (query_id, doc_id, rrf_score, in_bm25, in_ann) top-ANN_K2 per
    query, rank order (rrf_score DESC, doc_id)."""
    from .knn import _emb, _model_for, ann_search_lsh

    docs = _docs(spark, sf_dir)
    bm = bm25_scores(docs)
    w_bm = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    bm_rank = bm.select(
        "query_id", "doc_id", F.row_number().over(w_bm).alias("rank")
    )

    emb = _emb(spark, sf_dir)
    model = _model_for(emb, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    indexed = emb.join(docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi")
    ann = ann_search_lsh(indexed, queries, model)
    w_ann = Window.partitionBy("query_id").orderBy(F.asc("distance"), F.asc("neighbor_id"))
    ann_rank = ann.select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.row_number().over(w_ann).alias("rank"),
    )

    rrf_term = F.round(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank")), DIST_ROUND).cast(DEC)
    fused = (
        bm_rank.select("query_id", "doc_id", rrf_term.alias("t"), F.lit(1).alias("bm"))
        .unionByName(
            ann_rank.select(
                "query_id", "doc_id", rrf_term.alias("t"), F.lit(0).alias("bm")
            )
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("t").cast("double").alias("rrf_score"),
            F.max("bm").cast("boolean").alias("in_bm25"),
            (F.count(F.lit(1)) - F.max("bm") > 0).alias("in_ann"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return fused.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= ANN_K2).drop("rn")
