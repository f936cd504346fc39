"""Gate-window placement invariant.

The driver's correctness gate runs EXACTLY the first 50 registry entries
(measured r3/r4/r5: each CORRECTNESS_r0N.json holds 50 keys). Rounds 4 and
5 both lost a round of hard driver signal to comment-vs-reality drift about
where that boundary sat. This test pins the window to a checked-in list so
the drift is structurally impossible: promoting a key above the boundary
without demoting another fails the suite, as does any silent reordering.

Rotation procedure (per registry.py policy): edit registry._QUERIES AND
EXPECTED_GATE_WINDOW below in the same commit, keeping both at exactly 50.
"""

from __future__ import annotations

from elastik_nearest_neighbors_spark import registry

GATE_WINDOW_SIZE = 50

# The r11 window, in driver gate order: (1) the three NEW keys (#157
# aknn_http_search_store, #158 graph_rebuild, #159 bm25_doc_search_char),
# (2) six r11-changed keys (server store mode + id pinning, the tokenizer
# seam through the retrieval family, the graph store/delete refactor),
# (3) the ADVICE-r10 re-gate of dedup_embedding_cosine + the _recall_of
# consumers, (4) the 14 r7-era stale greens (r10 verdict item 1), (5) the
# oldest 20 r8-era greens.
EXPECTED_GATE_WINDOW = [
    "aknn_http_search_store",
    "graph_rebuild",
    "bm25_doc_search_char",
    "aknn_http_upsert",
    "aknn_http_search",
    "bm25_doc_search",
    "hybrid_search_rrf",
    "phrase_match",
    "graph_delete",
    "ann_search_graph_store",
    "dedup_embedding_cosine",
    "ann_recall",
    "ann_recall_ivf",
    "ann_recall_pq",
    "ann_recall_ivfpq",
    "ann_recall_graph",
    "ann_recall_lsh_multiprobe",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_revenue",
    "q12_priority_lateness",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q21_waiting_supplier",
    "q22_dormant_customers",
    "sales_rollup",
    "ann_recall_families",
    "dedup_report",
    "token_count",
    "minhash_signatures",
    "minhash_signatures_char",
    "dedup_minhash_lsh",
    "minhash_est_jaccard",
    "dedup_incremental",
    "ngram_jaccard_join",
    "containment_join",
    "q11_important_stock",
    "q20_potential_promotion",
    "knn_exact_mips",
    "events_dau_wau",
    "multimodal_audio_stats",
    "multimodal_featurize",
    "multimodal_framesample",
    "events_approx_distinct_check",
    "ann_search_lsh_multiprobe",
]


def test_gate_window_matches_checked_in_list():
    actual = list(registry.queries())[:GATE_WINDOW_SIZE]
    assert actual == EXPECTED_GATE_WINDOW, (
        "registry gate window drifted from the checked-in rotation plan; "
        "update EXPECTED_GATE_WINDOW in the same commit as registry._QUERIES "
        f"(first mismatch: {next((i, a, e) for i, (a, e) in enumerate(zip(actual, EXPECTED_GATE_WINDOW)) if a != e)})"
    )


def test_expected_window_is_exactly_the_gate_size():
    assert len(EXPECTED_GATE_WINDOW) == GATE_WINDOW_SIZE
    assert len(set(EXPECTED_GATE_WINDOW)) == GATE_WINDOW_SIZE


def test_registry_still_covers_every_survey_key():
    # the rotation must reorder, never drop: 160 keys (SURVEY §2), all unique
    ks = list(registry.queries())
    assert len(ks) == 160
    assert len(set(ks)) == 160
