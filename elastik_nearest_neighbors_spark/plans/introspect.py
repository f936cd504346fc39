"""Physical-plan introspection helpers.

The scale contract of every operator ("filter reaches the scan", "small side
broadcasts", "partition pruning happens") is asserted in tests via these
helpers rather than eyeballed — a regression that silently turns a broadcast
join into a sort-merge join or drops a pushed filter fails CI.
"""

from __future__ import annotations

import io as _io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = _io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans (flattened)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        inner = m.group(1).strip()
        if inner:
            out.extend(s.strip() for s in inner.split(","))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df)):
        inner = m.group(1).strip()
        if inner:
            out.extend(s.strip() for s in inner.split(","))
    return out


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin", formatted_plan(df)))


def shuffle_count(df: DataFrame) -> int:
    return len(re.findall(r"\bExchange\b|\bAQEShuffleRead\b", formatted_plan(df)))
