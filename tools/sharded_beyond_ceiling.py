"""Sharded IVF serving at an L the closure can't hold — part (b) of the
r11 verdict's item 4 (part (a) is tools/sharded_serving_ab.py).

This is the true-scale recipe fit_fine_df's docstring describes, executed
end-to-end on production code with the fine centroid level NEVER held as a
single driver-side array:

  1. _sample_df + _lloyd_hier_df(iters=0): the L-row fine table
     (list_id, centroid) as a DataFrame (iters=0 = init slice; Lloyd
     iterations don't change the serving SHAPE being measured, and at this
     L each iteration is minutes — the r8 fit A/B already proved the
     iterated sharded fit bit-equal at the Ls where both paths run).
  2. The level-0 sub-fit + membership via the same production pieces the
     sharded fit iteration uses (_fit_centroids_df, _coarse_members_df,
     _upper_levels_from): upper hierarchy driver-sized (~L/HIER_BRANCH),
     fine membership as a (group_id, list_id, centroid) DataFrame.
  3. Fine table persisted to parquet and read back — the shape a real
     deployment serves from.
  4. Serving: _sharded_scores_levels + the rank windows (the exact
     assign_sharded / probe_sharded tails) over a corpus batch and the
     256-query batch, each materialized through a parquet sink, timed.

--try-closure additionally collects the fine level into a single numpy
array (possible on THIS 128 GiB box; the point is what it costs) and runs
the closure pandas_udf assignment with the identical hierarchy for an
equality + cost comparison: the closure payload pickles into every python
worker, so its real cost is payload x workers, which is exactly why
SHARDED_MODEL_BYTES caps the closure path at 512 MB.

Usage: python tools/sharded_beyond_ceiling.py DIR L [N_ASSIGN] [--try-closure]
  e.g. python tools/sharded_beyond_ceiling.py /tmp/enn_scale/sfdistinct2m 1500000 100000
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from elastik_nearest_neighbors_spark.session import get_spark
from elastik_nearest_neighbors_spark.constants import (
    HIER_BRANCH,
    IVF_NPROBE,
    SHARDED_MODEL_BYTES,
)
from elastik_nearest_neighbors_spark.operators.ivf import (
    IvfModel,
    _fit_centroids_df,
    _lloyd_hier_df,
    _sample_df,
    _sharded_scores_levels,
    _upper_levels_from,
)

OUT = "/tmp/enn_beyond_ceiling"


def _timed_write(df, path: str) -> float:
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.time()
    df.write.mode("overwrite").parquet(path)
    return time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1]
    L = int(sys.argv[2])
    n_assign = int(sys.argv[3]) if len(sys.argv) > 3 and sys.argv[3].isdigit() else 100_000
    try_closure = "--try-closure" in sys.argv

    spark = get_spark()
    report: dict = {"L": L, "n_assign": n_assign}

    t0 = time.time()
    xdf, n = _sample_df(spark, sf_dir, L)
    cdf = _lloyd_hier_df(spark, xdf, n, min(L, n), iters=0)
    report["fine_rows"] = min(L, n)
    report["t_fine_table"] = round(time.time() - t0, 1)

    # level-0 sub-fit + membership — ALL production pieces now. r12 ran
    # membership with an approximate hierarchical assign because the
    # exact _coarse_members_df was a flat O(L · L/32 · D) pass (~4.5
    # PFLOP at L=1.5M — hours, the then-remaining fit ceiling). r13's
    # _argmin_rounded_pruned removed it: _coarse_members_df keeps its
    # exact rounded-argmin contract bit-for-bit while running log-depth
    # (ball-pruned branch-and-bound), so this step-up exercises the real
    # fit membership at L=1.5M.
    t0 = time.time()
    k = min(L, n)
    k_next = max(2, math.ceil(k / HIER_BRANCH))
    pts = cdf.select(
        F.col("list_id").cast("long").alias("idx"), F.col("centroid").alias("v")
    )
    sub = _fit_centroids_df(pts, k, k_next, 2)
    t_subfit = time.time() - t0
    t0 = time.time()
    from elastik_nearest_neighbors_spark.operators.ivf import _coarse_members_df

    sub_kept, fine = _coarse_members_df(cdf, sub)
    fine = fine.localCheckpoint()
    levels = [(sub_kept, [])] + _upper_levels_from(sub_kept)
    report["t_sub_fit"] = round(t_subfit, 1)
    report["t_membership_exact"] = round(time.time() - t0, 1)
    report["t_upper_fit"] = round(t_subfit + time.time() - t0, 1)
    report["upper_closure_bytes"] = int(sum(c.nbytes for c, _m in levels))
    report["fine_payload_bytes"] = int(k * 64 * 8)
    report["closure_ceiling_bytes"] = SHARDED_MODEL_BYTES

    # persist the fine table — the serving-time shape
    t0 = time.time()
    fine.write.mode("overwrite").parquet(f"{OUT}/fine")
    fine_served = spark.read.parquet(f"{OUT}/fine")
    report["t_fine_persist"] = round(time.time() - t0, 1)

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    corpus = emb.where(F.col("vec_id") < n_assign)
    queries = emb.where(F.col("vec_id") < 256)

    # assign_sharded's tail over the explicit (levels, fine) pair
    scored = _sharded_scores_levels(corpus, levels, fine_served, "embedding", "vec_id")
    assign = (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("center_dist", "list_id")).alias("m"))
        .select(
            "vec_id",
            F.col("m.list_id").alias("list_id"),
            F.col("m.center_dist").alias("center_dist"),
        )
    )
    report["t_assign_sharded"] = round(_timed_write(assign, f"{OUT}/assign"), 1)

    w = Window.partitionBy("vec_id").orderBy(F.asc("center_dist"), F.asc("list_id"))
    qscored = _sharded_scores_levels(
        queries, levels, fine_served, "embedding", "vec_id", per_group_k=IVF_NPROBE
    )
    probe = (
        qscored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= IVF_NPROBE)
        .select(F.col("vec_id").alias("query_id"), "list_id")
    )
    report["t_probe_sharded"] = round(_timed_write(probe, f"{OUT}/probe"), 1)

    if try_closure:
        # strawman: the same model as a driver array + closure pandas_udf,
        # with the IDENTICAL hierarchy (members reassembled from the fine
        # table) so outputs are comparable bit-for-bit
        t0 = time.time()
        rows = cdf.orderBy("list_id").collect()
        cent = np.array([r.centroid for r in rows], dtype=np.float64)
        mem_rows = fine_served.select("group_id", "list_id").collect()
        members = [[] for _ in range(len(sub_kept))]
        for r in mem_rows:
            members[r.group_id].append(r.list_id)
        lvl0 = (sub_kept, [np.array(sorted(m), dtype=np.int64) for m in members])
        model = IvfModel(cent, levels=[lvl0] + levels[1:])
        report["t_closure_collect"] = round(time.time() - t0, 1)
        report["closure_model_bytes"] = int(model.model_bytes)
        a = model.assign_udf()(F.col("embedding"))
        cassign = corpus.select(F.col("vec_id"), a.alias("a")).select(
            "vec_id",
            F.col("a.list_id").alias("list_id"),
            F.col("a.center_dist").alias("center_dist"),
        )
        try:
            report["t_assign_closure"] = round(
                _timed_write(cassign, f"{OUT}/assign_closure"), 1
            )
            sa = spark.read.parquet(f"{OUT}/assign")
            ca = spark.read.parquet(f"{OUT}/assign_closure")
            report["assign_mismatch"] = (
                ca.join(
                    sa.withColumnRenamed("list_id", "l2").withColumnRenamed(
                        "center_dist", "d2"
                    ),
                    "vec_id",
                    "full",
                )
                .where(
                    (F.col("list_id") != F.col("l2"))
                    | (F.col("center_dist") != F.col("d2"))
                    | F.col("list_id").isNull()
                    | F.col("l2").isNull()
                )
                .count()
            )
        except Exception as e:  # the expected outcome past the ceiling
            report["closure_error"] = f"{type(e).__name__}: {e}"[:300]

    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
