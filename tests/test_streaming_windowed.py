"""Native streaming operators: watermarked windowed agg (append semantics,
late-data drop) and the applyInPandasWithState per-user accumulator —
each asserted against its BATCH TWIN on the same rows."""

import datetime
import os

from pyspark.sql import functions as F

from docling_ocr_qwen3vl_spark.sources.tables import load_table
from docling_ocr_qwen3vl_spark.streaming.windowed import (
    start_user_totals_stream,
    start_windowed_stream,
    windowed_event_counts,
)


def _win_rows(df):
    return sorted(
        (r.window_start, r.event_type, r.n_events, r.total_value)
        for r in df.collect()
    )


def test_windowed_stream_matches_batch_and_drops_late_rows(spark, sf_dir, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_dir, "events")
    events.write.mode("overwrite").parquet(in_dir)
    max_ts = events.agg(F.max("ts")).collect()[0][0]

    q = start_windowed_stream(spark, in_dir, ckpt, "win1", output_dir=out_dir)
    q.awaitTermination(120)

    # a sentinel far past the data advances the watermark beyond every
    # original window, forcing them all to emit on the next run
    sentinel_ts = max_ts + datetime.timedelta(days=10)
    spark.createDataFrame(
        [(10**9, sentinel_ts, -1, "sentinel", 0.0, "{}")],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("append").parquet(in_dir)
    q2 = start_windowed_stream(spark, in_dir, ckpt, "win2", output_dir=out_dir)
    q2.awaitTermination(120)

    got = spark.read.parquet(out_dir).filter(F.col("event_type") != "sentinel")
    want = windowed_event_counts(events)
    assert _win_rows(got) == _win_rows(want)

    # LATE DATA: an event older than the watermark must be dropped — the
    # bounded-state contract — so the emitted windows do not change
    min_ts = events.agg(F.min("ts")).collect()[0][0]
    spark.createDataFrame(
        [(10**9 + 1, min_ts, -2, "late", 99.0, "{}")],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("append").parquet(in_dir)
    q3 = start_windowed_stream(spark, in_dir, ckpt, "win3", output_dir=out_dir)
    q3.awaitTermination(120)
    got3 = spark.read.parquet(out_dir).filter(
        ~F.col("event_type").isin("sentinel", "late")
    )
    assert _win_rows(got3) == _win_rows(want)


def test_stateful_user_totals_match_batch(spark, sf_dir, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_dir, "events")
    # 10 files -> 2 micro-batches at maxFilesPerTrigger=8, so state carries
    # across batches and update mode emits a row per (user, batch-seen)
    events.repartition(10).write.mode("overwrite").parquet(in_dir)

    q = start_user_totals_stream(spark, in_dir, ckpt, "totals1")
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM totals1").collect()
    # monotone counter: the max-n row per user is the final state
    final = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.total_value)
    want = {
        r.user_id: (r.n_events, r.total_value)
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .collect()
    }
    assert set(final) == set(want)
    for uid in want:
        assert final[uid][0] == want[uid][0], uid
        assert abs(final[uid][1] - want[uid][1]) < 1e-6, uid


def test_event_dedup_stream_drops_redelivered_rows(spark, sf_dir, tmp_path):
    """At-least-once source: re-delivering recent events (inside the
    watermark horizon) must not duplicate output rows."""
    from docling_ocr_qwen3vl_spark.streaming.windowed import start_event_dedup_stream

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_dir, "events")
    events.write.mode("overwrite").parquet(in_dir)

    q = start_event_dedup_stream(spark, in_dir, ckpt, out_dir)
    q.awaitTermination(120)
    n_unique = events.select("event_id").distinct().count()
    assert spark.read.parquet(out_dir).count() == n_unique

    # redeliver the most recent 30 minutes of events (inside the 1 h
    # watermark horizon) — a typical upstream retry
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    recent = events.filter(
        F.col("ts") > F.lit(max_ts) - F.expr("INTERVAL 30 MINUTES")
    )
    assert recent.count() > 0
    recent.write.mode("append").parquet(in_dir)
    q2 = start_event_dedup_stream(spark, in_dir, ckpt, out_dir)
    q2.awaitTermination(120)

    out = spark.read.parquet(out_dir)
    assert out.count() == n_unique                      # no duplicates added
    assert out.select("event_id").distinct().count() == n_unique
