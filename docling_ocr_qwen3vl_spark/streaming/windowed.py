"""Native Structured-Streaming operators: watermarked windowed aggregation,
a custom stateful per-key accumulator (applyInPandasWithState), and
at-least-once source dedup (dropDuplicatesWithinWatermark).

The reference is strictly batch (SURVEY.md §2.5); these are the additive
streaming operators a continuously-fed event/telemetry table needs.  Both
have BATCH TWINS so the driver's DuckDB oracle can certify the semantics
(`windowed_event_counts` / `user_running_totals` in queries.py), and the
streaming tests assert stream output == batch twin on the same rows.

Scale notes: the windowed agg is a standard partial-agg + state-store
pattern — state is bounded by (watermark horizon x key cardinality), and
late rows beyond the watermark are dropped instead of growing state
forever.  The stateful operator keeps one row of state per user; Spark
hash-partitions groups across executors, so state scales horizontally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _event_stream(spark, input_dir: str, watermark: str | None = None):
    """File-source stream of event parquet drops (shared by every operator
    below); optional event-time watermark."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    return stream.withWatermark("ts", watermark) if watermark else stream


def windowed_event_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type: count + exact value sum.

    Works on a batch OR streaming DataFrame (same plan both modes — that is
    the point).  Money math in DECIMAL: double sums depend on partition
    addition order and would break both the oracle hash-compare and
    batch-vs-stream equality."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def start_windowed_stream(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    queryName: str,
    watermark: str = "2 hours",
    available_now: bool = True,
    output_dir: str | None = None,
):
    """Watermarked streaming version of ``windowed_event_counts``.

    Append mode: a window row is emitted exactly once, when the watermark
    (max event time - ``watermark``) passes the window end — late rows
    inside the horizon still count; rows later than that are dropped
    (bounded state, the north-star property at 100 TB/day event volumes).
    Memory sink for tests; production sinks parquet/Iceberg the same way.
    """
    events = _event_stream(spark, input_dir, watermark)
    writer = (
        windowed_event_counts(events)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if output_dir is not None:  # parquet sink survives query restarts
        writer = writer.format("parquet").option("path", output_dir)
    else:
        writer = writer.format("memory").queryName(queryName)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Custom stateful operator: per-user running totals via applyInPandasWithState
# ---------------------------------------------------------------------------

# STATE SCHEMA v2 (was "n long, total double"): resuming a checkpoint
# written by the v1 accumulator is NOT supported — Spark's state-store
# schema check fails the query at start; restart with a fresh
# checkpointLocation (the parquet/memory sink is the durable output, and
# re-processing is idempotent for availableNow batch-style runs)
STATE_SCHEMA = "n long, total_micros long"
OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"


def _update_user_state(key, pdf_iter, state):
    """One state row per user: (event count, value sum), updated per batch.

    Money math in integer MICRO-units, exactly like the batch twin's
    DECIMAL(18,6) sum: each double is quantized half-up at 6 dp (Spark's
    double->decimal cast uses the shortest round-trip repr, which
    Decimal(repr(v)) reproduces) and summed as an exact integer, so the
    total is independent of micro-batch boundaries and addition order —
    a raw float accumulator + Python round() (banker's) could flip the
    4-dp rounding vs the batch result.  Emits the user's CURRENT totals
    once per batch in which the user appears (update semantics)."""
    from decimal import ROUND_HALF_UP, Decimal

    micro = Decimal("0.000001")
    n, total_micros = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        for v in pdf["value"]:
            total_micros += int(
                Decimal(repr(float(v))).quantize(micro, ROUND_HALF_UP).scaleb(6)
            )
    state.update((n, total_micros))
    total = float(
        Decimal(total_micros).scaleb(-6).quantize(Decimal("0.0001"), ROUND_HALF_UP)
    )
    import pandas as pd

    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def start_user_totals_stream(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    queryName: str,
    available_now: bool = True,
):
    """Custom stateful streaming aggregate (applyInPandasWithState):
    running per-user event count + value sum across micro-batches."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = _event_stream(spark, input_dir)
    totals = events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_event_dedup_stream(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Streaming dedup for at-least-once sources: re-delivered events are
    dropped by key within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps one state row per event_id for
    ``watermark`` of event time and then expires it — bounded state, which
    unbounded ``dropDuplicates`` cannot promise at 100 TB/day.  The
    contract is dedup WITHIN the horizon: a duplicate arriving later than
    the watermark may pass (by then the upstream retry window is long
    closed).  Parquet sink so output accumulates across restarts."""
    events = _event_stream(spark, input_dir, watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    writer = (
        events.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
