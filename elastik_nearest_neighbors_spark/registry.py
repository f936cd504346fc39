"""Query registry: the single source of truth wiring SURVEY §2 keys to
(Spark callable, DuckDB oracle SQL). `__spark_entry__.py` re-exports this."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import oracles
from .operators import analytics

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {
    "q1_pricing_summary": analytics.q1_pricing_summary,
    "q3_shipping_priority": analytics.q3_shipping_priority,
    "q6_revenue_delta": analytics.q6_revenue_delta,
    "events_hourly": analytics.events_hourly,
    "events_sessionize": analytics.events_sessionize,
}

_ORACLES: dict[str, Callable[[], str]] = {
    "q1_pricing_summary": oracles.q1_pricing_summary,
    "q3_shipping_priority": oracles.q3_shipping_priority,
    "q6_revenue_delta": oracles.q6_revenue_delta,
    "events_hourly": oracles.events_hourly,
    "events_sessionize": oracles.events_sessionize,
}


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return {k: fn() for k, fn in _ORACLES.items()}
