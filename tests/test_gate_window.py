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

# The r12 window, in driver gate order: (1) the NEW key (#161
# aknn_http_delete — wire DELETE parity, plus mid-r12 #162
# aknn_http_bulk_ingest — refresh=false staging + /_aknn_refresh, which
# demoted decontaminate to the r13 queue), (2) eleven r12-changed keys (the
# seven index-maintenance ops refactored onto the shared
# index_store.pruned_dynamic_overwrite helper, plus the server rewrite's
# consumers: fused replace, torn-write marker, DELETE endpoints), (3) the
# 20 r8-era stale greens (r11 verdict item 2), (4) the oldest 18 r9-era
# greens.
EXPECTED_GATE_WINDOW = [
    "aknn_http_delete",
    "index_upsert",
    "index_delete",
    "ivf_upsert",
    "ivf_delete",
    "ivfpq_upsert",
    "ivfpq_delete",
    "graph_delete",
    "graph_rebuild",
    "aknn_http_upsert",
    "aknn_http_search",
    "aknn_http_search_store",
    "aknn_http_bulk_ingest",
    "events_approx_distinct",
    "events_asof_join",
    "events_topk_users",
    "events_hourly",
    "events_sessionize",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q14_promo_revenue",
    "q5_local_supplier_volume",
    "q6_revenue_delta",
    "quality_score",
    "corpus_clean",
    "corpus_curate_full",
    "quality_quantile",
    "corpus_to_sequences",
    "lang_id",
    "lang_confusion",
    "aknn_model_registry",
    "label_centroids",
    "q2_min_cost_supplier",
    "ivf_index",
    "ann_search_ivf",
    "dedup_semantic",
    "similarity_join_lsh",
    "vector_stats",
    "range_search",
    "dedup_exact",
    "dedup_minhash_canonical",
    "dedup_simhash",
    "doc_fingerprint",
    "doc_chunk",
    "idf_scores",
    "pii_scrub",
    "corpus_sample",
    "token_histogram",
    "doc_repetition",
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
    # the rotation must reorder, never drop: 162 keys (SURVEY §2), all unique
    ks = list(registry.queries())
    assert len(ks) == 162
    assert len(set(ks)) == 162
