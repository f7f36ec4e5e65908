"""Event-stream operators over the events table (ts-ordered user activity).

The reference has no event analytics (its `events` are Mongo audit rows);
these are the batch analogues of the Structured Streaming ops in
`streaming/` — sessionization is the canonical stateful-window computation
a 100 TB activity log needs, expressed as plain window functions so
Catalyst plans it as one shuffle per user-partitioned window chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ts_us(ts_col: str):
    """Microseconds since epoch as int64 by tz-FREE field extraction — a
    TIMESTAMP_NTZ column yields identical values under ANY session timezone
    (== DuckDB epoch_us on the naive timestamp)."""
    return F.expr(
        f"unix_date(cast({ts_col} as date)) * 86400000000L"
        f" + hour({ts_col}) * 3600000000L + minute({ts_col}) * 60000000L"
        f" + cast(extract(second from {ts_col}) * 1000000 as long)")


def sessionize(
    events: DataFrame,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization -> one row per (user, session):
    (user_col, session_idx, n_events, start_us, end_us, duration_us).
    A new session starts when the gap to the user's previous event exceeds
    ``gap_sec`` (strictly greater), the standard web-analytics 30-min rule.

    Exactness: timestamps are compared in MICROSECONDS as int64, computed
    by tz-FREE field extraction (unix_date + hour/minute/second fields) so
    a TIMESTAMP_NTZ column yields identical values under ANY session
    timezone — the same int64 DuckDB's `epoch_us` produces on the naive
    timestamp. Rows are ordered by (ts_us, id_col) so lag/cumsum are fully
    deterministic, and every output column is an integer — the oracle
    replays bit-for-bit.

    Scale shape: two window functions over ONE user-hash shuffle (lag and
    the running session count share the same partitioning/ordering, so
    Catalyst plans a single Window exchange) + one groupBy on
    (user, session_idx) that is partial-aggregated map-side. A
    pathologically hot user serializes inside its window partition — the
    streaming path (`applyInPandasWithState`) or a (user, day) composite
    key bounds that; the batch default matches every warehouse
    sessionization."""
    us = _ts_us(ts_col)
    w = Window.partitionBy(user_col).orderBy("ts_us", id_col)
    gap_us = gap_sec * 1_000_000
    marked = (
        events.select(user_col, id_col, us.alias("ts_us"))
        .withColumn(
            "_new",
            F.when(
                F.lag("ts_us").over(w).isNull()
                | ((F.col("ts_us") - F.lag("ts_us").over(w)) > gap_us),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("session_idx",
                    F.sum("_new").over(
                        w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        marked.groupBy(user_col, "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
        )
        .select(
            user_col,
            F.col("session_idx").cast("long").alias("session_idx"),
            F.col("n_events").cast("long").alias("n_events"),
            "start_us", "end_us",
            (F.col("end_us") - F.col("start_us")).alias("duration_us"),
        )
    )


def retention_cohorts(
    events: DataFrame,
    period_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention -> (cohort, periods_since, n_users): users are
    cohorted by their FIRST active period (period = floor(days-since-epoch
    / period_days), tz-free integer arithmetic on the date so
    TIMESTAMP_NTZ is session-timezone-proof), and each row counts how many
    of a cohort's users were active again `periods_since` periods later —
    the standard week-N retention triangle.

    Scale shape: distinct (user, period) first (map-side combinable — the
    raw event volume collapses to user-period presence before anything
    else), one min-aggregation per user for the cohort, a user-keyed join
    back (AQE-skew-safe), and a final small groupBy. All int64; oracle
    replays exactly."""
    period = F.expr(
        f"unix_date(cast({ts_col} as date)) div {period_days}").cast("long")
    up = (events.select(F.col(user_col).alias("u"),
                        period.alias("p")).distinct()
          # lazy checkpoint: up feeds both the cohort min-agg and the join
          # back — without the cut the raw event scan + distinct runs twice
          .localCheckpoint(eager=False))
    cohort = up.groupBy("u").agg(F.min("p").alias("c"))
    return (
        up.join(cohort, "u")
        .groupBy(F.col("c").alias("cohort"),
                 (F.col("p") - F.col("c")).alias("periods_since"))
        .agg(F.countDistinct("u").alias("n_users"))
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel conversion -> (step_idx, step, n_users): of the users
    who performed step 0, how many then performed step 1 STRICTLY AFTER it,
    then step 2 after that, ... (first-occurrence semantics: each step's
    anchor is the EARLIEST qualifying event, the standard product-analytics
    definition — greedy-earliest is optimal here, so no backtracking).

    Scale shape: one user-keyed shuffle per step (filter to the step's
    events -> join the survivors-so-far -> min-aggregate), k steps = k
    slim shuffles over at most |users| rows after the first; the counts
    union into a single k-row action. The slim event projection and each
    step's survivor table are lazily checkpointed — both feed TWO
    consumers (k step filters; the count + the next step's join), and
    without the cuts the unioned result re-derives every prefix chain,
    O(k^2) source scans. Microsecond int64 timestamps via tz-free
    extraction; oracle replays exactly."""
    if not steps:
        raise ValueError("steps must be non-empty")
    us = _ts_us(ts_col)
    e = events.select(F.col(user_col).alias("u"),
                      F.col(type_col).alias("et"), us.alias("t"))
    if len(steps) > 1:  # single-step funnels read the source once anyway
        e = e.localCheckpoint(eager=False)
    counts = []
    cur = None
    for i, step in enumerate(steps):
        se = e.filter(F.col("et") == step).select("u", "t")
        if cur is None:
            cur = se.groupBy("u").agg(F.min("t").alias("t_anchor"))
        else:
            cur = (
                se.join(cur.select("u", F.col("t_anchor").alias("t_prev")),
                        "u")
                .filter(F.col("t") > F.col("t_prev"))
                .groupBy("u").agg(F.min("t").alias("t_anchor"))
            )
        cur = cur.localCheckpoint(eager=False)
        counts.append(
            cur.agg(F.count("*").cast("long").alias("n_users"))
            .select(F.lit(i).cast("long").alias("step_idx"),
                    F.lit(step).alias("step"), "n_users"))
    out = counts[0]
    for c in counts[1:]:
        out = out.union(c)
    return out
