"""Kafka source wiring for the events stream — the production swap-in
for the file source in streaming/queries.py.

The container has no Kafka broker and no spark-sql-kafka package, so
the builder is import/availability-gated: it constructs the standard
``readStream.format("kafka")`` pipeline (value JSON -> typed events
schema, same downstream operators) when the connector is on the
classpath, and raises a clear EngineError otherwise. Every query in
streaming/queries.py accepts the resulting DataFrame unchanged — the
source swap is the ONLY difference between the test harness and a
production deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from http_datafusion_spark.errors import EngineError

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — classpath probe
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:  # noqa: BLE001 — any JVM error means "not available"
        return False


def read_events_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Events stream from Kafka: value is the JSON events record.

    Raises EngineError when the Kafka connector isn't installed —
    callers in this container use the file-source path instead
    (streaming/queries.py::read_events_stream).
    """
    if not kafka_available(spark):
        raise EngineError(
            "Kafka connector not on the classpath; add the spark-sql-kafka-0-10 "
            "package to use read_events_kafka (the file-source path in "
            "streaming/queries.py covers local runs)"
        )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return (
        raw.select(F.from_json(F.col("value").cast("string"), EVENTS_SCHEMA).alias("e"))
        .select("e.*")
    )
