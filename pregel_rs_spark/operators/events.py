"""Event-stream analytics over an ``events(event_id, ts, user_id,
event_type, value, props)`` table — sessionization, windowed rollups, JSON
property extraction.

No reference counterpart (the reference has no window functions or date/json
libraries — SURVEY §2.3); these are the standard event-pipeline operators a
training-data stack needs, expressed as pure Catalyst window/agg plans.

Scale notes:
  * sessionization is ONE shuffle (hash by user_id) + an in-partition sort —
    the canonical "segment by key, order by time" plan; skewed power users
    are bounded by per-user event counts, not corpus size;
  * gap comparisons use integer microseconds (``unix_micros``) so engine and
    oracle agree bit-exactly — no float time math;
  * time rollups use ``date_trunc`` (stable bucketing, partition-prunable on
    a date-partitioned table at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions: a new session starts when the pause since the
    user's previous event exceeds ``gap_minutes``.

    Returns the events with ``session_seq`` (1-based per user, ordered by
    ``(ts, event_id)`` — the ``event_id`` tie-break applies only when the
    column exists) — ``(user_id, session_seq)`` is the session key.
    """
    order = ["ts"] + (["event_id"] if "event_id" in events.columns else [])
    w = Window.partitionBy("user_id").orderBy(*order)
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.lag(
        F.unix_micros(F.col("ts").cast("timestamp"))
    ).over(w)
    boundary = F.when(
        gap_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    return (
        events.withColumn("__b", boundary)
        .withColumn("session_seq", F.sum("__b").over(w))
        .drop("__b")
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session rollup: event count, duration (seconds), total value.

    Returns ``(user_id, session_seq, n_events, duration_s, total_value)``.
    """
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.max(F.unix_micros(F.col("ts").cast("timestamp"))) - F.min(F.unix_micros(F.col("ts").cast("timestamp"))))
            / 1_000_000.0
        ).alias("duration_s"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def hourly_type_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour rollup per event type:
    ``(hour_ts epoch-seconds, event_type, n, total_value)``."""
    return events.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_ts"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def extract_props_key(events: DataFrame, key: str = "k") -> DataFrame:
    """JSON property extraction: ``(event_id, k)`` from the ``props`` JSON
    string — `get_json_object` stays in codegen (no UDF)."""
    return events.select(
        "event_id",
        F.get_json_object(F.col("props"), f"$.{key}").cast("long").alias(key),
    )


def session_bounds(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session bounds rollup — the batch counterpart (and parity oracle)
    of the streaming ``sessionize_stream`` stateful operator.

    Returns ``(user_id, session_start, session_end, n_events,
    total_value)`` — one row per gap-delimited session.
    """
    s = sessionize(events, gap_minutes)
    return (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            # nanvl matches the stream's NaN→0.0 normalization (a NaN value
            # would otherwise poison F.sum and break the documented
            # stream/batch parity contract on edge inputs)
            F.round(F.sum(F.nanvl(F.col("value"), F.lit(0.0))), 6).alias(
                "total_value"
            ),
        )
        .drop("session_seq")
    )


def daily_retention(events: DataFrame) -> DataFrame:
    """Day-over-day user retention — the product-analytics rollup every
    event pipeline ships: per UTC day, the count of active users, the
    count also active the PREVIOUS day, and the retention rate.

    Distinct (user, day) first (one hash agg — the dedup bound is
    users×days, not events), then a self equi-join on (user, day−1) —
    integer day arithmetic (epoch days via floor(epoch_us / 86400e6)) so
    the oracle replays it exactly with no timestamp-zone hazards.  Days
    with no previous-day actives report retained = 0, rate = 0 (the
    first day of a dataset is honestly 0, not NULL).  Returns
    (day, actives, retained, retention_rate round 6) — ``day`` as epoch
    days BIGINT.
    """
    ud = (
        events.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(86400000000)
            ).alias("day"),
        )
        .distinct()
    )
    prev = ud.select("user_id", (F.col("day") + 1).alias("day"))
    ret = ud.join(prev, ["user_id", "day"], "left_semi").groupBy("day").agg(
        F.count(F.lit(1)).alias("retained")
    )
    act = ud.groupBy("day").agg(F.count(F.lit(1)).alias("actives"))
    return (
        act.join(ret, "day", "left")
        .select(
            F.col("day").cast("long").alias("day"),
            F.col("actives").cast("long").alias("actives"),
            F.coalesce("retained", F.lit(0)).cast("long").alias("retained"),
            F.round(
                F.coalesce("retained", F.lit(0)) / F.col("actives"), 6
            ).alias("retention_rate"),
        )
    )
