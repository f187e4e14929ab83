"""Streaming extension test: the watermarked windowed aggregate drained with
AvailableNow must equal the batch twin exactly (decimal sums are order-
independent, so stream/batch parity is bit-exact)."""

from __future__ import annotations

from bag_parser_spark.plans.catalog import registry
from bag_parser_spark.streaming.events import run_stream_to_memory

SF = "/root/testdata/sf0.01"


def test_stream_matches_batch(spark):
    run_stream_to_memory(spark, f"{SF}/events.parquet", "ev_win_test")
    stream_rows = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("ev_win_test").collect()
    }
    batch = registry()["events_windowed_agg"].fn(spark, SF)
    batch_rows = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0
