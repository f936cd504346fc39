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

# The r13 window, in driver gate order (#163 aknn_http_doc_get displaced
# streaming_index_store to the r14 queue mid-round): (1) the full ivf.py surface (the
# sharded-IVF rewrite landed below the gate mid-r12, and r13 adds the
# log-depth coarse-membership fit), (2) the pq family (probe_pairs /
# list_assignments consumers of the same code), (3) the six r13-changed
# serving keys (search job-count, wire compaction, distributed refresh),
# (4) the 16 remaining r9-era greens, (5) the 7 keys whose code paths the
# r13 optimization round changed (driver-job caches: bm25 query constants,
# phrase probes, graph-store seeds) — displacing the streaming family
# (unchanged this round, r10-green) to the r14 queue head. Third resumed
# session: Change 16 (CC lazy-checkpoint fold) changed dup_clusters →
# rotated in, displacing source_stats (r9-green, untouched all round) to
# the r14 queue head; embedding_clusters (also Change 16) was already in.
EXPECTED_GATE_WINDOW = [
    "ivf_index",
    "ann_search_ivf",
    "ann_recall_ivf",
    "ann_search_ivf_filtered",
    "ann_search_ivf_store",
    "dedup_semantic",
    "knn_graph",
    "index_stats",
    "ivf_upsert",
    "ivf_delete",
    "pq_codes",
    "ann_search_pq",
    "ann_recall_pq",
    "ann_search_ivfpq",
    "ann_search_ivfpq_refined",
    "ann_recall_ivfpq",
    "ann_recall_ivfpq_refined",
    "ann_search_ivfpq_store",
    "ivfpq_upsert",
    "ivfpq_delete",
    "aknn_http_search_store",
    "aknn_http_upsert",
    "aknn_http_delete",
    "aknn_http_bulk_ingest",
    "aknn_http_search",
    "aknn_http_doc_get",
    "streaming_index_compact",
    "sq8_quantize",
    "ann_search_sq8",
    "ann_recall_sq8",
    "boilerplate_scrub",
    "ann_search_matryoshka",
    "decontaminate",
    "seq_pack",
    "source_cap",
    "stratified_sample",
    "dup_clusters",
    "knn_graph_multiprobe",
    "ann_search_graph",
    "ann_recall_graph_sweep",
    "embedding_clusters",
    "ann_search_graph_beam",
    "ann_recall_graph_beam",
    "bm25_doc_search",
    "bm25_doc_search_char",
    "hybrid_search_rrf",
    "phrase_match",
    "ann_search_graph_store",
    "graph_delete",
    "graph_rebuild",
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
    # the rotation must reorder, never drop: 163 keys (SURVEY §2), all unique
    ks = list(registry.queries())
    assert len(ks) == 163
    assert len(set(ks)) == 163
