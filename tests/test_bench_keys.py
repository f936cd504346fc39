"""The compact bench line (bench.py) aliases every headline key so all
per-query timings fit the driver's 2000-char tail capture. The alias map is
committed at tools/bench_keys.json so the judge can decode BENCH_r{N}.json;
these tests pin runtime mapping == committed snapshot, the size contract,
and (r10) the explicit exclusion policy: HEADLINE = registry minus the
streaming drains and estimate-only twins named in bench.py's comment."""

import json
import os

import bench
from elastik_nearest_neighbors_spark import registry

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the ONLY keys the bench may skip (bench.py HEADLINE policy comment)
BENCH_EXCLUDED = {
    # (a) streaming drains — drain time, not plan cost; batch twins benched
    "streaming_index",
    "streaming_index_store",
    "streaming_index_compact",
    "streaming_sessionize",
    "streaming_sessionize_append",
    "streaming_sessionize_check",
    "streaming_sliding_window",
    "streaming_dedup_state",
    "streaming_events_hourly",
    "streaming_ann_search",
    # (b)/(c) estimate-only twins / rows-only HLL estimate
    "events_approx_distinct",
    "events_approx_distinct_check",
}


def test_headline_is_registry_minus_documented_exclusions():
    reg = set(registry.queries())
    head = set(bench.HEADLINE)
    assert head & BENCH_EXCLUDED == set(), head & BENCH_EXCLUDED
    assert reg - head == BENCH_EXCLUDED, (
        "HEADLINE drifted from the exclusion policy: "
        f"unbenched-and-undocumented={sorted(reg - head - BENCH_EXCLUDED)} "
        f"documented-but-benched-or-gone={sorted(BENCH_EXCLUDED - (reg - head))}"
    )
    assert len(bench.HEADLINE) == len(head)  # no dup timings


def test_short_keymap_unique_and_pinned():
    smap = bench.short_keymap(bench.bench_key_universe())
    assert len(set(smap.values())) == len(smap)
    with open(os.path.join(_ROOT, "tools", "bench_keys.json")) as f:
        committed = json.load(f)
    assert smap == committed, (
        "tools/bench_keys.json drifted from bench.short_keymap(HEADLINE); "
        "regenerate the snapshot in the same commit as the HEADLINE change"
    )


def test_compact_line_fits_tail_budget():
    # worst realistic payload: every key at a 4-digit-second timing
    universe = bench.bench_key_universe()
    smap = bench.short_keymap(universe)
    # mirror bench.main's compact encoder (3 sig digits, integral -> int):
    # the widest realistic value is 4 chars — "99.9" (or "1230" for a
    # 4-digit-second timing after the .3g cut)
    out = {
        "metric": "headline_queries_total",
        "value": 9999.999,
        "unit": "sec",
        "queries": {smap[k]: 99.9 for k in universe},
        "sf": 0.1,
        "queries_omitted": 0,
        "keymap": "tools/bench_keys.json",
        "full": "BENCH_LOCAL.json",
    }
    assert len(json.dumps(out, separators=(",", ":"))) <= 1900
