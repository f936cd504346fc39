"""Bucket-pair generation for the blocking-based similarity family.

Every near-duplicate operator here (LSH buckets, minhash bands, simhash
bands) reduces to the same shape: explode items into (item, bucket) rows,
self-join on the bucket, emit distinct unordered pairs. That self-join is
the one genuinely quadratic step in the engine — a bucket of m members
emits m·(m−1)/2 pairs — so this is where the 100 TB skew guard lives:

- buckets larger than `max_bucket` are dropped BEFORE the self-join
  (see constants.MAX_BUCKET for the rationale; deterministic, mirrored
  exactly by the DuckDB oracles);
- the bucket-size aggregation partial-aggregates map-side and the
  kept⋈sizes join is co-partitioned with the following self-join (all hash
  on the bucket key), so the cap costs one extra stage over the same
  shuffle, not a new shuffle of the data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import MAX_BUCKET


def capped_bucket_pairs(
    exploded: DataFrame,
    key_cols: Sequence[str],
    id_col: str,
    a: str = "doc_a",
    b: str = "doc_b",
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """Distinct unordered id pairs (a < b) sharing ≥1 bucket.

    `exploded` must hold one row per (id, bucket) — true for LSH table
    hashes (one per table), minhash bands and simhash bands (one per band).
    `max_bucket=None` disables the cap (exact blocking).
    """
    keys = list(key_cols)
    if max_bucket is not None:
        # cap via broadcast ANTI-join on the HOT-bucket list: buckets above
        # the cap are pathological by definition, so the list is tiny at any
        # scale — it broadcasts, the kept rows never shuffle for the cap,
        # and the self-join below keeps its exchange untouched. (A window
        # count was tried: it rides the same exchange but pays a full sort
        # of the exploded rows; the agg branch here partial-aggregates
        # map-side and reuses the self-join's shuffle via ReusedExchange.)
        hot = (
            exploded.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .where(F.col("_bsz") > max_bucket)
            .select(*keys)
        )
        exploded = exploded.join(F.broadcast(hot), keys, "left_anti")
    aa = exploded.select(F.col(id_col).alias(a), *keys)
    bb = exploded.select(F.col(id_col).alias(b), *keys)
    return aa.join(bb, keys).where(F.col(a) < F.col(b)).select(a, b).distinct()
