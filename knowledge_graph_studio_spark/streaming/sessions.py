"""Streaming sessionization: Spark's native session windows + watermark.

The batch twin is ``operators/events.sessionize`` (lag/cumsum windows); this
module is the continuously-running form a live activity stream needs, built
on the engine primitives the brief names — ``withWatermark`` for late data
and ``F.session_window`` for gap-merged session state. State per user is
bounded by (watermark retention x open sessions); closed sessions emit in
append mode once the watermark passes their end, so the sink only ever sees
FINAL session rows (exactly the semantics a downstream table wants).

Emission caveat (inherent to append mode, worth knowing when testing):
sessions whose end lies within ``watermark`` of the stream's maximum event
time are still open-state when a finite run drains — a later run (or more
data) emits them. ``run_streaming_sessions`` therefore reports what the
watermark has FINALIZED, which on an unbounded stream is everything
eventually.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_sessions(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """events (streaming OR batch DF) -> one row per closed session:
    (user_col, session_start, session_end, n_events). On a batch DF the
    same expression computes ALL sessions (no watermark gating), which is
    what the parity test exploits.

    A TIMESTAMP_NTZ event-time column (what parquet inference yields for
    naive timestamps) is cast to TIMESTAMP first: streaming watermarks
    REQUIRE the instant type ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]
    otherwise). The cast applies the session timezone uniformly, so gaps —
    and therefore session membership — are unchanged; the reported
    window bounds are instants in that timezone."""
    from pyspark.sql import types as T

    if isinstance(events.schema[ts_col].dataType, T.TimestampNTZType):
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), f"{gap_sec} seconds"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )


def run_streaming_sessions(
    spark: SparkSession,
    events_parquet: str,
    workdir: str,
    gap_sec: int = 1800,
    watermark: str = "1 hour",
    max_files_per_trigger: int = 2,
) -> DataFrame:
    """Drive ``streaming_sessions`` over a growing parquet directory with
    Trigger.AvailableNow and a checkpoint, appending finalized sessions to
    ``workdir/sessions``. Re-running after new files land resumes from the
    checkpoint and emits newly-closed sessions exactly once (the
    run_incremental_build pattern). Returns the sessions table read back."""
    schema = spark.read.parquet(events_parquet).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_parquet)
    )
    q = (
        streaming_sessions(src, gap_sec=gap_sec, watermark=watermark)
        .writeStream.outputMode("append")
        .option("checkpointLocation", f"{workdir}/_chk")
        .trigger(availableNow=True)
        .start(f"{workdir}/sessions")
    )
    q.awaitTermination()
    return spark.read.parquet(f"{workdir}/sessions")
