"""Local replica of the driver's t2 correctness gate: run a Spark query and
its DuckDB oracle on the same parquet, compare row count + schema (column
names) + order-insensitive values."""

from __future__ import annotations

import math
import os
import struct

import duckdb
import pandas as pd

from elastik_nearest_neighbors_spark import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # the DRIVER's gate sorts object columns as-is and dies on
            # unhashable cells (ndarray/list) — replicate that hard failure
            # here instead of papering over it with str() (the round-1
            # mismatch: local green, driver red)
            head = df[c].dropna()
            if len(head) and isinstance(head.iloc[0], (list, tuple, set, dict)) or (
                len(head) and type(head.iloc[0]).__module__ == "numpy" and getattr(head.iloc[0], "ndim", 0) > 0
            ):
                raise TypeError(
                    f"column {c!r} holds array-typed cells — not canonicalizable "
                    "by the driver gate; emit flat scalars (long format / join to string)"
                )
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(
    spark_df, oracle_df: pd.DataFrame, rel_tol: float | None = None
) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass).

    Floats compare BIT-EXACT by default (so −0.0 ≠ 0.0 and last-ulp rounding
    differences fail, exactly like the driver's stringified value-hash gate —
    the r2 lesson: a 1e-9 tolerance here let sq8_quantize ship local-green and
    fail the driver). Pass rel_tol ONLY where the oracle documents why the
    output is inherently inexact."""
    errs: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        errs.append(f"schema: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}")
        return errs
    if len(sp) != len(oracle_df):
        errs.append(f"rows: spark={len(sp)} oracle={len(oracle_df)}")
        return errs
    a, b = _canon(sp), _canon(oracle_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            for i, (x, y) in enumerate(zip(av.astype(float), bv.astype(float))):
                if math.isnan(x) and math.isnan(y):
                    continue
                if rel_tol is None:
                    ok = struct.pack("<d", x) == struct.pack("<d", y)
                else:
                    ok = x == y or math.isclose(x, y, rel_tol=rel_tol, abs_tol=1e-9)
                if not ok:
                    errs.append(f"col {c} row {i}: spark={x!r} oracle={y!r}")
                    break
        else:
            neq = av.astype(str).values != bv.astype(str).values
            if neq.any():
                i = int(neq.argmax())
                errs.append(f"col {c} row {i}: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}")
    return errs
