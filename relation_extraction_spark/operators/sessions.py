"""Gap-based sessionization of event logs: assign a per-user session number
that increments whenever the inter-event gap exceeds a threshold — the
standard log-pipeline primitive for crawl/user activity analysis.

Scale notes (100 TB of events): one shuffle, keyed on the user — the window
partition is bounded by a single user's event count, not the corpus. Gaps
compare integer microseconds (unix_micros ≡ DuckDB epoch_us), so the oracle
reproduces bit-for-bit with no float time arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
    gap_seconds: int = 1800, order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Append ``session_no`` (1-based per user, ordered by ``(ts_col,
    order_cols)``): a new session starts at the first event and whenever
    the gap since the previous event exceeds ``gap_seconds``.

    Boundary semantics: a gap EXACTLY equal to ``gap_seconds`` stays in the
    same session (strict '>'). Structured Streaming's ``session_window``
    (streaming/stream.start_session_stream) splits at that exact gap — an
    event landing on the boundary diverges between the two."""
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    prev = F.lag(ts_col).over(w)
    # .cast("timestamp"): unix_micros rejects TIMESTAMP_NTZ (parquet naive
    # timestamps); the session is UTC-pinned so the cast is an identity
    micros = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    new_session = (
        prev.isNull()
        | (micros(F.col(ts_col)) - micros(prev) > gap_seconds * 1_000_000)
    ).cast("int")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn(
        "session_no", F.sum(new_session).over(run).cast("bigint"))


def session_stats(
    sessions: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
) -> DataFrame:
    """Per-session aggregates over a sessionize() output: event count and
    duration in seconds (floor). Map-side-combinable on (user, session)."""
    return sessions.groupBy(user_col, "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.floor(
            (F.unix_micros(F.max(ts_col).cast("timestamp"))
             - F.unix_micros(F.min(ts_col).cast("timestamp")))
            / 1_000_000
        ).cast("bigint").alias("duration_s"),
    )
