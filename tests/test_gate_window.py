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

# The r9 window, in driver gate order: (1) the NEW #150 (the append-mode
# sessionizer's hash-gated twin), (2) r9-changed code (the q2 plan fix and
# the IVF fit entries after the ADVICE-r8 fixes), (3) the 19 r5-era stale
# greens (the r8 verdict's #1 ask), (4) the oldest 25 r6-era greens.
EXPECTED_GATE_WINDOW = [
    "streaming_sessionize_check",
    "ivf_delete",
    "index_delete",
    "q2_min_cost_supplier",
    "ivf_index",
    "ann_search_ivf",
    "ann_recall_ivf",
    "dedup_semantic",
    "similarity_join_lsh",
    "dedup_embedding_cosine",
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
    "decontaminate",
    "seq_pack",
    "source_cap",
    "stratified_sample",
    "source_stats",
    "knn_graph_multiprobe",
    "ann_search_graph",
    "ann_recall_graph",
    "ann_recall_graph_sweep",
    "embedding_clusters",
    "streaming_graph_search",
    "ann_search_graph_beam",
    "ann_recall_graph_beam",
    "ann_search_ivfpq",
    "ann_search_ivfpq_refined",
    "ann_recall_ivfpq",
    "ann_recall_ivfpq_refined",
    "ann_search_ivf_filtered",
    "knn_graph",
    "pq_codes",
    "ann_search_pq",
    "ann_recall_pq",
    "sq8_quantize",
    "ann_search_sq8",
    "ann_recall_sq8",
    "boilerplate_scrub",
    "index_stats",
    "ann_search_matryoshka",
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
    # the rotation must reorder, never drop: 152 keys (SURVEY §2), all unique
    ks = list(registry.queries())
    assert len(ks) == 152
    assert len(set(ks)) == 152
