"""Kafka source/sink wiring for the event stream (SURVEY §2.9 upgrade path).

The engine's streaming operators (windowed_event_counts, sessionize,
user_totals_stateful, dedup_events_stream) are source-agnostic — they take a
typed event DataFrame. This module provides the Kafka binding: the same typed
stream from a Kafka topic instead of the parquet directory, so swapping the
source is a one-line change at the pipeline entry.

The spark-sql-kafka connector jar is not bundled with plain pyspark; this
container has no broker either. All constructors therefore gate behind
:func:`kafka_available` and raise a clear error otherwise — the DataFrame
transformations themselves (value -> from_json -> typed columns) are built
and unit-tested against a batch DataFrame with the same (key, value, ...)
shape Kafka delivers, so the parsing logic is verified even where the
connector can't run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Matches /root/testdata events.parquet (TESTDATA.md) after the ts cast used
# in streaming.events.stream_events.
EVENT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts", T.StringType()),  # ISO-8601 in the JSON payload
    ]
)


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector classes are on the JVM
    classpath (jar shipped via --packages on a real deployment)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def parse_event_payload(raw: DataFrame) -> DataFrame:
    """Kafka record -> typed event row.

    ``raw`` has Kafka's wire schema (key binary, value binary, topic,
    partition, offset, timestamp, ...). Pure column expressions — reused
    verbatim by the unit test with a batch stand-in DataFrame.

    The ISO wall-clock string parses to TIMESTAMP_NTZ (session-independent),
    then becomes the watermark-compatible instant the same way the parquet
    stream does (timeutil.as_instant) — wall clock read as UTC.
    """
    from ..functions.timeutil import as_instant

    return (
        raw.select(F.col("value").cast("string").alias("json"))
        .select(F.from_json("json", EVENT_JSON_SCHEMA).alias("e"))
        .select(
            F.col("e.event_id").alias("event_id"),
            F.col("e.user_id").alias("user_id"),
            F.col("e.event_type").alias("event_type"),
            F.col("e.value").alias("value"),
            F.to_timestamp_ntz(F.col("e.ts")).alias("ts"),
        )
        .withColumn("ts", as_instant("ts"))
    )


def stream_events_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """readStream from a Kafka topic -> the same typed event stream that
    ``streaming.events.stream_events`` yields from parquet.

    At 100 TB/day scale this is the real ingest edge: one Kafka partition
    maps to one Spark task; watermarks + the downstream stateful operators
    are unchanged from the file-source path.
    """
    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka connector not on classpath; submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "(file-source path: streaming.events.stream_events)"
        )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_event_payload(raw)


def write_events_kafka(
    events: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """writeStream sink to Kafka: typed rows serialized to JSON values keyed
    by user_id (stable partitioning by user preserves per-user order)."""
    if not kafka_available(events.sparkSession):
        raise RuntimeError(
            "spark-sql-kafka connector not on classpath; see stream_events_kafka"
        )
    payload = events.select(
        F.col("user_id").cast("string").alias("key"),
        F.to_json(F.struct("event_id", "user_id", "event_type", "value", "ts")).alias(
            "value"
        ),
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
