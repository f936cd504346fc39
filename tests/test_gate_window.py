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

# The r10 window, in driver gate order: (1) the four NEW keys: three maintenance
# ops (#153 ivfpq_delete, #154 graph_delete, #155 ivfpq_upsert — full
# CRUD across all four store layouts) plus the #156 HTTP wire surface, (2) the 11 streaming entries
# (r10-changed: every drain now fails loudly on timeout via _drain, r9
# ADVICE), (3) the 13 remaining r6-era stale greens (r9 verdict's #1
# ask), (4) the oldest 22 r7-era greens, store/maintenance keys first.
EXPECTED_GATE_WINDOW = [
    "ivfpq_delete",
    "graph_delete",
    "ivfpq_upsert",
    "aknn_http_search",
    "aknn_http_search_store",
    "graph_rebuild",
    "streaming_sessionize_check",
    "streaming_sessionize_append",
    "streaming_sessionize",
    "streaming_sliding_window",
    "streaming_dedup_state",
    "streaming_events_hourly",
    "streaming_index",
    "streaming_index_store",
    "streaming_index_compact",
    "streaming_ann_search",
    "streaming_graph_search",
    "ann_recall_matryoshka",
    "bitsign_codes",
    "ann_search_bitsign",
    "ann_recall_bitsign",
    "dup_spans",
    "dup_span_scrub",
    "knn_classify",
    "doc_logprob",
    "ann_search_lsh_filtered",
    "events_rolling_7d",
    "knn_join",
    "source_mix",
    "semantic_doc_search",
    "ann_search_ivfpq_store",
    "ann_search_graph_store",
    "ivf_upsert",
    "index_upsert",
    "ann_search_lsh_store",
    "ann_search_ivf_store",
    "lsh_index",
    "ann_search_lsh",
    "knn_exact_euclidean",
    "knn_exact_cosine",
    "dup_clusters",
    "aknn_search_api",
    "ann_recall_sweep",
    "bucketed_join_revenue",
    "events_anomaly",
    "events_daily_pivot",
    "events_funnel",
    "events_percentiles",
    "events_props_extract",
    "events_retention",
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
    # the rotation must reorder, never drop: 158 keys (SURVEY §2), all unique
    ks = list(registry.queries())
    assert len(ks) == 158
    assert len(set(ks)) == 158
