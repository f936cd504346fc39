"""Deterministic scale-up generator for the step-up bench.

Replicates a testdata sf directory R× into DST with join-consistent id
offsets (copy i shifts every key domain by i·stride), so every foreign-key
relationship, aggregation group structure, and dup/near-dup relationship of
the original is preserved per copy while totals grow linearly. Dimension
tables (region, nation) are NOT replicated — exactly how a real warehouse
scales. Document text gets a per-copy suffix so cross-copy docs are
near-duplicates (not byte-identical clones), keeping the minhash/banding
workload realistic instead of degenerate. Embedding vectors are copied
verbatim: the fixed query batch (vec_id < N_QUERIES, all in copy 0) then
searches an R× denser index — the serving-scale axis we want to measure.

Usage: python tools/scale_up.py SRC DST R [TABLES]
  e.g. python tools/scale_up.py /root/testdata/sf0.1 /tmp/enn_scale/sf1 10
       python tools/scale_up.py /root/testdata/sf0.1 /tmp/enn_scale/sf100 1000 embeddings,events
TABLES (optional, comma-separated) restricts generation to those tables —
the per-table output is independent and deterministic, so a restricted run
produces byte-identical files to the same tables of a full run (the
tools/README.md recipes rebuild the per-round scale dirs this way).

Writes one parquet per table with 100k-row row groups (splittable scans).
Pure DuckDB SQL — no Spark session needed to generate.
"""

from __future__ import annotations

import os
import sys

import duckdb

# per-table integer key offsets (column -> per-copy stride); strides are far
# above any source id so copies never collide
OFFSETS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
DIMS = ["region", "nation"]


def _copy_select(table: str, cols: list[tuple[str, str]], i: int) -> str:
    off = OFFSETS[table]
    parts = []
    for name, _type in cols:
        if name in off:
            parts.append(f"{name} + {i * off[name]} AS {name}")
        elif table == "documents" and name == "text" and i > 0:
            parts.append(f"text || ' copy{i}' AS text")
        elif table == "documents" and name == "n_chars":
            # keep the n_chars == strlen(text) invariant on every copy
            suffix = 0 if i == 0 else len(f" copy{i}")
            parts.append(f"n_chars + {suffix} AS n_chars")
        else:
            parts.append(name)
    return "SELECT " + ", ".join(parts) + " FROM src"


def scale(src: str, dst: str, r: int, tables: list[str] | None = None) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table in tables if tables else DIMS + list(OFFSETS):
        sp = os.path.join(src, f"{table}.parquet")
        dp = os.path.join(dst, f"{table}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{sp}'")
        if table in DIMS:
            body = "SELECT * FROM src"
        else:
            cols = [
                (row[0], row[1])
                for row in con.execute("DESCRIBE SELECT * FROM src").fetchall()
            ]
            body = " UNION ALL ".join(_copy_select(table, cols, i) for i in range(r))
        con.execute(
            f"COPY ({body}) TO '{dp}' (FORMAT PARQUET, ROW_GROUP_SIZE 100000)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dp}'").fetchone()[0]
        print(f"{table}: {n} rows -> {dp}", file=sys.stderr)


if __name__ == "__main__":
    src, dst, r = sys.argv[1], sys.argv[2], int(sys.argv[3])
    tables = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    scale(src, dst, r, tables)
