"""Vanilla-session replica of the grading driver (.claude/skills/verify):
imports __spark_entry__ with a bare SparkSession (no custom confs), smokes
entry() at sf0.001, then runs every queries()[k] against oracle_sql()[k] at
sf0.01 with the bit-exact comparator from tests/oracle_check.

Usage: python tools/verify_drive.py [key ...]   (no args = all keys)

ENN_VERIFY_SF_DIR overrides the comparison scale (default
/root/testdata/sf0.01 — the driver's gate SF). The r9 verdict's item 6:
one higher-SF parity run per round (e.g. ENN_VERIFY_SF_DIR=
/root/testdata/sf0.1 over the heaviest keys) guards against
scale-dependent constants (MAX_BUCKET, literal-path thresholds)
silently diverging from their oracle mirrors.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    only = set(sys.argv[1:])
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    import __spark_entry__ as m
    from tests.oracle_check import compare, duck_con

    n = m.entry(spark).count()
    print(f"entry rows: {n}")
    assert n >= 0

    sf = os.environ.get("ENN_VERIFY_SF_DIR", "/root/testdata/sf0.01")
    con = duck_con(sf)
    # oracle SQL must be BUILT FOR the comparison SF: the vector-family
    # oracles inline model constants refit deterministically from that
    # scale's parquet (__spark_entry__.oracle_sql() pins the driver's
    # sf0.01 — correct for the gate, wrong for an override SF)
    from elastik_nearest_neighbors_spark import registry

    qs, osql = m.queries(), registry.oracle_sql(sf)
    keys = [k for k in qs if not only or k in only]
    bad = []
    for k in keys:
        t0 = time.time()
        try:
            sdf = qs[k](spark, sf)
            if k not in osql:
                print(f"{k}: rows-only {sdf.count()} [{time.time()-t0:.1f}s]")
                continue
            odf = con.sql(osql[k]).df()
            errs = compare(sdf, odf)
        except Exception as exc:  # noqa: BLE001 — report, keep driving
            errs = [f"exception: {exc!r}"]
        if errs:
            bad.append(k)
            print(f"{k}: FAIL {errs[:3]} [{time.time()-t0:.1f}s]")
        else:
            print(f"{k}: ok [{time.time()-t0:.1f}s]")
    print(f"checked {len(keys)} keys, {len(bad)} failures: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
