"""Structured Streaming event-time windowing: stream result == batch result.

The reference has no streaming (SURVEY §2.9); this pins the engine's
watermark + tumbling-window capability for late-data pipelines: the same
windowed aggregation computed over the events table as a file stream and
as a batch query must agree exactly once the stream drains.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_windowed_stream_equals_batch(spark, tmp_path):
    batch = spark.read.parquet(f"{SF}/events.parquet")
    schema = batch.schema

    agg_cols = [
        F.col("window.start").cast("string").alias("w_start"),
        "event_type",
        F.col("n"),
        F.round("total", 4).alias("total"),
    ]

    def windowed(df):
        return (
            df.withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.window("ts", "6 hours"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
            .select(agg_cols)
        )

    # the sf dir holds other tables' parquet too -> pathGlobFilter; parquet
    # timestamps surface as NTZ, event-time windowing needs TIMESTAMP
    q = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(agg_cols)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {tuple(r) for r in spark.sql("SELECT * FROM win_out").collect()}
    want = {tuple(r) for r in windowed(batch).collect()}
    assert got == want
    assert len(want) > 0
