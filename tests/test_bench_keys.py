"""The compact bench line (bench.py) aliases every headline key so all 123
per-query timings fit the driver's 2000-char tail capture. The alias map is
committed at tools/bench_keys.json so the judge can decode BENCH_r{N}.json;
these tests pin runtime mapping == committed snapshot and the size contract."""

import json
import os

import bench

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
    out = {
        "metric": "headline_queries_total",
        "value": 9999.999,
        "unit": "sec",
        "queries": {smap[k]: 999.0 for k in universe},
        "sf": 0.1,
        "queries_omitted": 0,
        "keymap": "tools/bench_keys.json",
        "full": "BENCH_LOCAL.json",
    }
    assert len(json.dumps(out, separators=(",", ":"))) <= 1900
