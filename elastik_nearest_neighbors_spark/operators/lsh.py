"""Multi-table hyperplane LSH — the reference's core index structure.

Reference semantics (EsAknn `_aknn_create` / `_aknn_index`, public API):
given `nb_tables` T, `nb_bits_per_table` B and a sample of 2·T·B vectors,
each hyperplane is built from a *pair* of sample vectors: normal = a − b,
passing through the midpoint (a+b)/2. A vector's bit is which side of the
hyperplane it falls on; B bits form one table's integer hash; a vector gets
T hashes. Candidate retrieval is then term-matching on (table, hash).

Spark-first re-expression:
- the model is tiny (T·B·(D+1) float64 ≈ KB) → plain numpy on the driver,
  closed over by an Arrow-batched pandas_udf (one matmul per batch — the
  vectorized fast path; no per-row Python).
- the index is a DataFrame (id, hashes array<bigint>[T]); the exploded
  (id, tbl, hash) form feeds bucket joins. At 100 TB the index build is a
  single narrow pass (no shuffle); persist partitioned by (tbl, hash % n)
  for partition-pruned lookups.

Determinism contract (mirrored in oracles.py DuckDB SQL): all math in
float64; margin = dot(v, normal) − dot(midpoint, normal) is rounded to
DIST_ROUND decimals before the sign test, so float sum-order noise can
never flip a bit between engines.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..constants import DIST_ROUND, LSH_BITS, LSH_TABLES


class LshModel:
    """T×B midpoint-hyperplane LSH model (reference `_aknn_create`)."""

    def __init__(self, normals: np.ndarray, offsets: np.ndarray, tables: int, bits: int):
        self.tables = tables
        self.bits = bits
        self.normals = np.asarray(normals, dtype=np.float64).reshape(tables * bits, -1)
        self.offsets = np.asarray(offsets, dtype=np.float64).reshape(tables * bits)

    # -- fitting ------------------------------------------------------------
    @classmethod
    def from_sample(cls, sample: np.ndarray, tables: int = LSH_TABLES, bits: int = LSH_BITS) -> "LshModel":
        """Sample rows pair up (0,1), (2,3), …: normal = a−b through midpoint."""
        sample = np.asarray(sample, dtype=np.float64)
        need = 2 * tables * bits
        if sample.shape[0] < need:
            raise ValueError(f"need {need} sample vectors, got {sample.shape[0]}")
        a, b = sample[0:need:2], sample[1:need:2]
        normals = a - b
        offsets = np.einsum("ij,ij->i", (a + b) / 2.0, normals)
        return cls(normals, offsets, tables, bits)

    @classmethod
    def fit_df(
        cls,
        df: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        tables: int = LSH_TABLES,
        bits: int = LSH_BITS,
    ) -> "LshModel":
        """Deterministic fit: the sample is the first 2·T·B rows by id.

        Only the tiny sample is collected; scale-independent.
        """
        n = 2 * tables * bits
        rows = (
            df.select(id_col, vec_col).where(F.col(id_col) < n).orderBy(id_col).collect()
        )
        return cls.from_sample(np.array([r[1] for r in rows]), tables, bits)

    # -- hashing ------------------------------------------------------------
    def hash_udf(self):
        normals, offsets = self.normals, self.offsets
        tables, bits = self.tables, self.bits
        weights = (1 << np.arange(bits, dtype=np.int64))

        @pandas_udf("array<bigint>")
        def _hash(vecs: pd.Series) -> pd.Series:
            v = np.array(vecs.tolist(), dtype=np.float64)
            margin = np.round(v @ normals.T - offsets, DIST_ROUND)
            bit = (margin > 0).reshape(len(vecs), tables, bits)
            hashes = (bit * weights).sum(axis=2).astype(np.int64)
            return pd.Series(list(hashes))

        # r13 (opt guide §4.4): every consumer explodes the hash array, and
        # Catalyst's InferFiltersFromGenerate pushes the inferred
        # size(hashes)>0 filter below the parallelizing repartition — which
        # duplicates this UDF (one copy under the exchange, i.e. running on
        # the UN-repartitioned scan, plus the real one above). Marking it
        # non-deterministic forbids that duplication; the function is in
        # fact deterministic, so results are unchanged.
        return _hash.asNondeterministic()

    def with_hashes(self, df: DataFrame, vec_col: str = "embedding", out: str = "hashes") -> DataFrame:
        return df.withColumn(out, self.hash_udf()(F.col(vec_col)))

    def probe_hash_udf(self, n_flips: int):
        """Multi-probe hashes: per table, the base hash followed by
        `n_flips` variants flipping the lowest-|margin| bits in turn (the
        buckets the vector most nearly fell into — Lv et al.'s probing
        sequence, depth 1). Output is a flat array of T·(1+n_flips)
        hashes, table-major, so `pos // (1+n_flips)` recovers the table.
        Ties on equal rounded |margin| break on the lower bit index (the
        stable argsort), mirrored by the oracle's (|margin|, bit) struct
        sort."""
        normals, offsets = self.normals, self.offsets
        tables, bits = self.tables, self.bits
        weights = 1 << np.arange(bits, dtype=np.int64)

        @pandas_udf("array<bigint>")
        def _probe(vecs: pd.Series) -> pd.Series:
            v = np.array(vecs.tolist(), dtype=np.float64)
            margin = np.round(v @ normals.T - offsets, DIST_ROUND)
            m3 = margin.reshape(len(v), tables, bits)
            hashes = ((m3 > 0) * weights).sum(axis=2).astype(np.int64)
            order = np.argsort(np.abs(m3), axis=2, kind="stable")
            step = 1 + n_flips
            out = np.empty((len(v), tables * step), dtype=np.int64)
            out[:, ::step] = hashes
            for p in range(n_flips):
                out[:, p + 1 :: step] = hashes ^ (
                    np.int64(1) << order[:, :, p].astype(np.int64)
                )
            return pd.Series(list(out))

        # same InferFiltersFromGenerate duplication as hash_udf (§4.4)
        return _probe.asNondeterministic()

    def subset(self, tables: int) -> "LshModel":
        """First-`tables` prefix of this model — a valid smaller model (each
        table's hyperplanes are independent), used by the recall sweep to
        evaluate the T axis without refitting."""
        n = tables * self.bits
        return LshModel(self.normals[:n], self.offsets[:n], tables, self.bits)

    def subset_bits(self, bits: int) -> "LshModel":
        """First-`bits` hyperplanes of EACH table — the B axis of the recall
        sweep. Because hashes are LSB-first bit-packed (bit i weighs 2^i),
        this model's hash equals the full model's `hash % 2**bits`, which is
        how the Spark sweep derives every B point from one hash pass."""
        n3 = self.normals.reshape(self.tables, self.bits, -1)[:, :bits, :]
        o2 = self.offsets.reshape(self.tables, self.bits)[:, :bits]
        return LshModel(
            n3.reshape(self.tables * bits, -1), o2.reshape(-1), self.tables, bits
        )

    # -- persistence (reference stores the model as an ES doc) --------------
    def to_json(self) -> str:
        return json.dumps(
            {
                "tables": self.tables,
                "bits": self.bits,
                "normals": self.normals.tolist(),
                "offsets": self.offsets.tolist(),
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "LshModel":
        d = json.loads(s)
        return cls(np.array(d["normals"]), np.array(d["offsets"]), d["tables"], d["bits"])


def explode_hashes(df: DataFrame, id_col: str, id_alias: str) -> DataFrame:
    """(id, hashes[T]) → (id_alias, tbl, hash) for bucket joins."""
    return df.select(
        F.col(id_col).alias(id_alias), F.posexplode("hashes").alias("tbl", "hash")
    )


def build_index(
    df: DataFrame, model: LshModel, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """`_aknn_index`: vectors → (id, hashes). Narrow, shuffle-free pass."""
    return model.with_hashes(df, vec_col).select(id_col, vec_col, "hashes")
