"""Property-based tests (hypothesis): the pure column expressions must agree
with a plain-Python reference on arbitrary inputs, not just the testdata."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from elastik_nearest_neighbors_spark.constants import FINGERPRINT_BASE, MERSENNE_P

words = st.text(alphabet="abcdefg", min_size=1, max_size=6)
token_lists = st.lists(words, min_size=3, max_size=30)


def _py_h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_shingles(toks: list[str], n: int = 3) -> list[str]:
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _py_fingerprint(toks: list[str]) -> int:
    acc = 0
    for t in toks:
        acc = (acc * FINGERPRINT_BASE + (_py_h60(t) % 1_000_000_007)) % MERSENNE_P
    return acc


class TestAgainstPythonReference:
    """One Spark job per class (batched rows), not per hypothesis example."""

    def test_shingles_and_fingerprint(self, spark):
        import pyspark.sql.functions as F

        from elastik_nearest_neighbors_spark.functions.text import (
            fingerprint,
            md5_hash60,
            word_shingles,
        )

        # collect a deterministic batch of hypothesis-style cases
        cases: list[list[str]] = []

        @settings(max_examples=60, deadline=None)
        @given(token_lists)
        def collect(toks):
            cases.append(toks)

        collect()
        df = spark.createDataFrame([(" ".join(t),) for t in cases], ["text"])
        toks = F.split("text", " ")
        out = df.select(
            "text",
            word_shingles(toks).alias("sh"),
            fingerprint(toks).alias("fp"),
            md5_hash60(F.col("text")).alias("h"),
        ).collect()
        for row in out:
            pytoks = row.text.split(" ")
            assert list(row.sh) == _py_shingles(pytoks), pytoks
            assert row.fp == _py_fingerprint(pytoks), pytoks
            assert row.h == _py_h60(row.text)
