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

# The r7 window, in driver gate order: (1) the 27 r3-era greens (oldest
# driver rows in the registry), (2) the 9 URI-portable-maintenance keys and
# (3) the 7 tokenizer-seam keys whose code changed in r7, (4) the oldest
# r4-era serving-core greens that fit.
EXPECTED_GATE_WINDOW = [
    "streaming_dedup_state",
    "streaming_events_hourly",
    "streaming_sessionize_append",
    "q7_volume_shipping",
    "q10_returned_revenue",
    "q18_large_orders",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q19_disjunctive_revenue",
    "sales_rollup",
    "q8_market_share",
    "q9_product_profit",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q22_dormant_customers",
    "q12_priority_lateness",
    "q21_waiting_supplier",
    "bucketed_join_revenue",
    "events_daily_pivot",
    "events_funnel",
    "events_retention",
    "events_percentiles",
    "events_sliding_window",
    "events_props_extract",
    "events_anomaly",
    "events_user_ltv",
    "ann_recall_sweep",
    "ivf_upsert",
    "index_upsert",
    "ann_search_lsh_store",
    "ann_search_ivf_store",
    "ann_search_ivfpq_store",
    "ann_search_graph_store",
    "streaming_index",
    "streaming_index_store",
    "streaming_index_compact",
    "token_count",
    "minhash_signatures",
    "minhash_signatures_char",
    "dedup_minhash_lsh",
    "minhash_est_jaccard",
    "dedup_incremental",
    "ngram_jaccard_join",
    "containment_join",
    "lsh_index",
    "ann_search_lsh",
    "knn_exact_euclidean",
    "knn_exact_cosine",
    "dup_clusters",
    "aknn_search_api",
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
    # the rotation must reorder, never drop: 146 keys (SURVEY §2), all unique
    ks = list(registry.queries())
    assert len(ks) == 146
    assert len(set(ks)) == 146
