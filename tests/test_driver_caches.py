"""r13 optimization round: the per-process driver-job caches added for the
repeat-call paths (opt guide §5 — driver time) must be RESULT-IDENTICAL to
the uncached computation. Each test clears the cache, takes a cold result,
asserts the cache populated, and compares the warm (cache-hit) result
row-for-row. The caches hold only deterministic query-side constants
(scalars, probe ids, KB-sized frames); the corpus-side work re-executes
from parquet on every call — these tests would catch a cache that leaks
between keys (wrong tokenizer/tag) or serves stale shapes.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bm25_constants_cache_round_trip(spark):
    from elastik_nearest_neighbors_spark.operators import search as s

    s._BM25_CONST_CACHE.clear()
    cold = _rows(s.bm25_doc_search(spark, SF_SMALL))
    assert len(s._BM25_CONST_CACHE) == 1, "entry point must populate the cache"
    warm = _rows(s.bm25_doc_search(spark, SF_SMALL))
    assert cold == warm

    # the char twin keys on the tokenizer name — distinct entry, same
    # round-trip guarantee
    cold_c = _rows(s.bm25_doc_search_char(spark, SF_SMALL))
    assert len(s._BM25_CONST_CACHE) == 2
    assert _rows(s.bm25_doc_search_char(spark, SF_SMALL)) == cold_c
    # word and char entries must not collide
    assert cold != cold_c or True  # shapes may coincide on tiny data; the
    # real guard is the key count above


def test_bm25_direct_call_bypasses_cache(spark):
    from elastik_nearest_neighbors_spark.operators import search as s

    s._BM25_CONST_CACHE.clear()
    docs = s._docs(spark, SF_SMALL)
    direct = _rows(s.bm25_scores(docs))
    assert s._BM25_CONST_CACHE == {}, "no cache_key → no caching"
    # and the cached entry-point path returns the same rows
    assert _rows(s.bm25_doc_search(spark, SF_SMALL)) == direct


def test_phrase_probe_cache_round_trip(spark):
    from elastik_nearest_neighbors_spark.operators import search as s

    s._PHRASE_PROBE_CACHE.clear()
    cold = _rows(s.phrase_match(spark, SF_SMALL))
    assert len(s._PHRASE_PROBE_CACHE) == 1
    assert _rows(s.phrase_match(spark, SF_SMALL)) == cold


def test_pq_dist_table_cache_round_trip(spark):
    from elastik_nearest_neighbors_spark.operators import pq

    pq._DIST_TABLE_CACHE.clear()
    cold = _rows(pq._query_dist_table(spark, SF_SMALL))
    assert len(pq._DIST_TABLE_CACHE) == 1
    # warm call returns the SAME local-relation frame (no new driver job)
    again = pq._query_dist_table(spark, SF_SMALL)
    assert _rows(again) == cold
    # tag=None bypasses
    pq._DIST_TABLE_CACHE.clear()
    assert _rows(pq._query_dist_table(spark, SF_SMALL, tag=None)) == cold
    assert pq._DIST_TABLE_CACHE == {}
    # the full ADC consumer is unchanged by the cache
    pq._DIST_TABLE_CACHE.clear()
    cold_pq = _rows(pq.ann_search_pq(spark, SF_SMALL))
    assert _rows(pq.ann_search_pq(spark, SF_SMALL)) == cold_pq


def test_graph_store_seed_cache_round_trip(spark):
    from elastik_nearest_neighbors_spark.operators import graph

    graph._SEED_CACHE.clear()
    cold = _rows(graph.ann_search_graph_store(spark, SF_SMALL))
    assert len(graph._SEED_CACHE) == 1
    assert _rows(graph.ann_search_graph_store(spark, SF_SMALL)) == cold
