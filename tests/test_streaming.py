"""Structured Streaming behavior tests beyond the oracle-checked
aggregations: append-mode watermark emission, streaming dedup within
watermark, and the custom stateful per-user operator.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from http_datafusion_spark.streaming.queries import read_events_stream, run_to_memory
from http_datafusion_spark.streaming.stateful import user_profile_stream
from http_datafusion_spark.plans.tables import load_tables


def test_append_mode_emits_only_closed_windows(spark, sf_dir):
    # In append mode a window is emitted only once the watermark passes
    # its end; with a single input batch the watermark advances once, so
    # emitted windows must be a strict prefix of the complete set.
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    appended = run_to_memory(agg, "append")
    complete_n = (
        load_tables(spark, sf_dir, "events")["events"]
        .groupBy(F.floor(F.unix_timestamp("ts") / 300))
        .count()
        .count()
    )
    n_appended = appended.count()
    assert 0 < n_appended < complete_n  # tail windows held back by watermark


def test_drop_duplicates_within_watermark(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    doubled = stream.union(stream)  # every event twice
    deduped = doubled.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(["event_id"])
    out = run_to_memory(deduped.groupBy().agg(F.count(F.lit(1)).alias("n")), "complete")
    total = load_tables(spark, sf_dir, "events")["events"].count()
    assert out.collect()[0].n == total  # duplicates collapsed back to originals


def test_stateful_user_profile(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    out = run_to_memory(user_profile_stream(stream), "update")
    profiles = {r.user_id: r for r in out.collect()}
    batch = load_tables(spark, sf_dir, "events")["events"]
    expected = {
        r.user_id: (r.n, round(r.total, 4))
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(profiles) == set(expected)
    for uid, (n, total) in expected.items():
        assert profiles[uid].n_events == n
        assert profiles[uid].total_value == pytest.approx(total, abs=1e-3)
        assert profiles[uid].max_gap_sec >= 0
