"""Table loading. Parquet-first: columnar scans give Catalyst predicate
pushdown and column pruning for free — .explain() on any operator here should
show PushedFilters/ReadSchema limited to what the query needs."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from . import TABLES
from .session import configure

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ORACLE_SF_DIR = "/root/testdata/sf0.01"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) columns arrive as long (see session.configure);
    # convert to micro-precision timestamps, matching DuckDB truncation.
    for field, col in (("ts", "ts"), ("o_orderdate", "o_orderdate"), ("l_shipdate", "l_shipdate")):
        if field in df.columns and isinstance(df.schema[field].dataType, LongType):
            # integer `div`, not `/` — float division loses precision at 1e18 ns
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{field} div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
