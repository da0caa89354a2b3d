"""Sessionization: split series into sessions at inactivity gaps.

Engine extra (the reference has no session concept — its grid is fixed-
period; SURVEY §2.7). For conversation transcripts this is the natural
segmentation: a conversation that pauses > ``gap`` splits into sessions,
and session-level stats (duration, turn counts, per-role mix) feed the
same tier machinery.

Pure window expressions: new-session marker = (ts − lag(ts)) > gap, then a
running sum assigns session ordinals — one shuffle on the series key,
shared with any other per-series window stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    series_col: str = "conv_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] | None = None,
    out_col: str = "session_idx",
) -> DataFrame:
    """Append a 0-based per-series session ordinal."""
    order = list(order_cols) if order_cols else [ts_col]
    w = Window.partitionBy(series_col).orderBy(*order)
    prev_ts = F.lag(ts_col, 1).over(w)
    # microsecond arithmetic: unix_timestamp() floors to seconds, which
    # shifts gap boundaries on sub-second timestamps
    new_session = (
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(prev_ts.cast("timestamp"))) > gap_seconds * 1_000_000)
    ).cast("long")
    run = Window.partitionBy(series_col).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_col, (F.sum(new_session).over(run) - 1).cast("int"))


def session_stats(
    df: DataFrame,
    gap_seconds: int,
    series_col: str = "conv_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-session rollup: bounds, duration, row count."""
    s = sessionize(df, gap_seconds, series_col, ts_col, order_cols)
    return s.groupBy(series_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        ((F.unix_micros(F.max(ts_col).cast("timestamp")) - F.unix_micros(F.min(ts_col).cast("timestamp"))) / 1_000_000).alias(
            "duration_sec"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
