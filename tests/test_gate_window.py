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

# The r8 window, in driver gate order: (1) r8-changed code (families memo
# key, dedup_report's new disjoint column, the tokenizer-seam consumers
# after tokens() grew the explicit name parameter), (2) the 3 NEW TPC-H
# keys (#147-#149), (3) the IVF fit entry points (sharded fine-level fit
# seam), (4) the 20 r4-era stale greens, (5) the oldest r5-era greens that
# fit.
EXPECTED_GATE_WINDOW = [
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
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q20_potential_promotion",
    "ivf_index",
    "ann_search_ivf",
    "ann_recall_ivf",
    "dedup_semantic",
    "knn_exact_mips",
    "events_dau_wau",
    "multimodal_audio_stats",
    "multimodal_featurize",
    "multimodal_framesample",
    "events_approx_distinct",
    "events_approx_distinct_check",
    "ann_search_lsh_multiprobe",
    "ann_recall_lsh_multiprobe",
    "streaming_ann_search",
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
    "bm25_doc_search",
    "hybrid_search_rrf",
    "phrase_match",
    "quality_score",
    "corpus_clean",
    "corpus_curate_full",
    "quality_quantile",
    "corpus_to_sequences",
    "lang_id",
    "lang_confusion",
    "aknn_model_registry",
    "label_centroids",
    "ann_recall",
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
    # the rotation must reorder, never drop: 149 keys (SURVEY §2), all unique
    ks = list(registry.queries())
    assert len(ks) == 149
    assert len(set(ks)) == 149
