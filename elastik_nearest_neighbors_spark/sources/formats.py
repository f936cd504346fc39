"""Vector ingestion formats.

The reference's pipeline moves vectors as JSON messages (Kafka → `_aknn_index`
bodies with `_id` + `_aknn_vector`). The Spark-native equivalents here read
the same logical record from JSON-lines or CSV into the canonical
(vec_id bigint, embedding array<float>) frame the indexers consume.

Schemas are explicit — schema inference is a full extra pass over the data
and non-deterministic under drift, so it is never used. The JSON reader
accepts the reference's field names (`_id`, `_aknn_vector`) or the native
ones. CSV carries the vector as a delimited string (arrays aren't a CSV
type); the split+cast happens in one narrow projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

VEC_JSON_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("_id", LongType()),
        StructField("_aknn_vector", ArrayType(FloatType())),
    ]
)

VEC_CSV_SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("embedding_csv", StringType())]
)


def read_vectors_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines vectors; accepts native or reference (`_id`/`_aknn_vector`)
    field names, normalized to (vec_id, embedding)."""
    raw = spark.read.schema(VEC_JSON_SCHEMA).json(path)
    return raw.select(
        F.coalesce(F.col("vec_id"), F.col("_id")).alias("vec_id"),
        F.coalesce(F.col("embedding"), F.col("_aknn_vector")).alias("embedding"),
    )


def read_vectors_csv(spark: SparkSession, path: str, delim: str = ";") -> DataFrame:
    """CSV vectors: (vec_id, "v1;v2;..."), vector split+cast in one narrow
    projection."""
    raw = spark.read.schema(VEC_CSV_SCHEMA).option("header", "true").csv(path)
    return raw.select(
        "vec_id",
        F.transform(F.split("embedding_csv", delim), lambda x: x.cast("float")).alias(
            "embedding"
        ),
    )


def read_vectors_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC vectors — the other columnar format a lakehouse deployment mixes
    with parquet; arrays are native, so this is a plain typed scan (column
    pruning and predicate pushdown work the same as parquet)."""
    return spark.read.orc(path).select("vec_id", "embedding")


def write_vectors_orc(df: DataFrame, path: str) -> None:
    df.select("vec_id", "embedding").write.mode("overwrite").orc(path)


def write_vectors_json(df: DataFrame, path: str) -> None:
    df.select("vec_id", "embedding").write.mode("overwrite").json(path)


def write_vectors_csv(df: DataFrame, path: str, delim: str = ";") -> None:
    df.select(
        "vec_id", F.array_join(F.col("embedding").cast("array<string>"), delim).alias("embedding_csv")
    ).write.mode("overwrite").option("header", "true").csv(path)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Raw binary ingestion via Spark's `binaryFile` source — how an
    image/audio corpus lands in the engine before multimodal featurization
    (operators/multimodal.featurize_binary consumes exactly this shape).

    The source is splittable by FILE (each file one row), reads lazily, and
    pushes the glob down to the listing, so a 100 TB media lake is scanned
    with per-file parallelism and no decode on the scan path. Output:
    (path, n_bytes, payload binary) — metadata columns stay cheap;
    `payload` (the file content) is only materialized for rows that survive
    downstream pruning."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.col("path"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("payload"),
    )
