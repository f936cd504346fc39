"""Structured Streaming operators (SURVEY §2 #8).

The reference ingests vectors continuously (Kafka consumer → batched
`_aknn_index` calls). Spark-first equivalent: `readStream` file source →
the same vectorized LSH hash UDF → `writeStream` parquet index. The hash
pass is stateless/narrow, so streaming and batch share the exact operator.

`streaming_events_hourly` is the streaming twin of analytics.events_hourly:
watermarked tumbling-window aggregation (late data handled by the 1h
watermark at scale; availableNow here drains the backlog and stops).

These entries are rows-only in the correctness gate (no oracle SQL): the
semantics are covered by their batch twins; what's verified here is the
streaming plumbing itself.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from ..constants import DEC
from ..operators.lsh import LshModel, build_index
from ..session import configure


def streaming_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream vectors in, hash incrementally, append to a parquet index."""
    configure(spark)
    batch = io.table(spark, sf_dir, "embeddings")
    model = LshModel.fit_df(batch)
    src = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )
    hashed = build_index(src, model).select("vec_id", "hashes")
    out = tempfile.mkdtemp(prefix="enn_stream_idx_")
    q = (
        hashed.writeStream.format("parquet")
        .option("path", f"{out}/data")
        .option("checkpointLocation", f"{out}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(f"{out}/data")


def streaming_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked hourly tumbling-window counts over the events stream."""
    configure(spark)
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # ts arrives as nanos-long (see session.configure) — same conversion as io.table
    ev = src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
    )
    name = f"enn_stream_hourly_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(
        f"""SELECT date_format(win.start, 'yyyy-MM-dd HH:mm:ss') AS hour_ts,
                   event_type, n_events, sum_value
            FROM {name}"""
    )
