"""Generate an embeddings table of genuinely DISTINCT vectors for the
graph-family step-up bench.

Why this exists (r5): tools/scale_up.py replicates embedding vectors
VERBATIM, so every /tmp/enn_scale dir holds only the 2000 distinct
vectors of sf0.1 — step-ups there measure duplicate mass (now handled by
the r5 duplicate-collapse paths), not content diversity. The quantizer
hierarchy and lists-∝-distinct design need a DIVERSE axis to be measured
honestly: this writes n distinct 64-dim vectors (deterministic seed,
standard-normal like the testdata's weak cluster structure), plus
symlinks for the other tables so bench.py can point at the directory.

Usage: python tools/gen_diverse_vectors.py DST N [SEED]
  e.g. python tools/gen_diverse_vectors.py /tmp/enn_scale/sfdiv10 2000000
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents",
]


def main() -> None:
    dst, n = sys.argv[1], int(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 1234
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    writer = None
    chunk = 200_000
    for start in range(0, n, chunk):
        m = min(chunk, n - start)
        vecs = rng.standard_normal((m, 64))
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(start, start + m), type=pa.int64()),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
                "label": pa.array(
                    (np.arange(start, start + m) % 8).astype(np.int32), type=pa.int32()
                ),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(
                os.path.join(dst, "embeddings.parquet"), t.schema
            )
        writer.write_table(t, row_group_size=100_000)
    if writer:
        writer.close()
    for tbl in TABLES:
        link = os.path.join(dst, f"{tbl}.parquet")
        if not os.path.exists(link):
            os.symlink(f"/tmp/enn_scale/sf10/{tbl}.parquet", link)
    print(f"wrote {n} distinct vectors to {dst}")


if __name__ == "__main__":
    main()
