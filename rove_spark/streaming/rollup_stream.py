"""Structured Streaming: continuous tier rollup + stateful streaming QC.

The reference is request-driven batch over "real-time" data — no streaming
operators at all (SURVEY §2.7; Kafka triggering was out-of-scope,
``docs/requirements.md:5``). The engine adds the streaming shape the
production target describes (~35k obs/min, flag latency < 5 min,
``docs/requirements.md:17,24``):

- ``stream_rollup``: readStream → watermark → tumbling-window aggregate
  with the SAME integer-domain stat columns as the batch 1m tier, so a
  streaming 1m tier cascades into the batch 1h/1d tiers unchanged. Late
  data within the watermark updates its window; windows close when the
  watermark passes (append mode = finalized-window semantics).
- ``stream_step_check``: custom stateful operator via
  ``applyInPandasWithState`` — per-series state carries (last_ts,
  last_value) across micro-batches, so the first row of a batch is checked
  against the last row of the previous batch exactly like the batch
  operator checks against ``lag(1)``. State is tiny (two scalars per
  series) and partitioned by series key — scales with #series, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from rove_spark.model import Flag


def stream_rollup(
    stream_df: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    series_col: str = "conv_id",
    ts_col: str = "ts",
    role_col: str | None = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    aggs: list | None = None,
) -> DataFrame:
    """Streaming 1m-tier aggregate (schema-compatible with the batch tier:
    same stat columns, ``bucket_ts`` = window start).

    ``aggs`` overrides the transcript-shaped stat columns with caller
    aggregate expressions (aliased Columns) — the streaming machinery
    (watermark, tumbling window, incremental group state) is identical
    for any mergeable aggregate set, which is what lets the driver's
    stream≡batch query reuse the batch 1m oracle's value stats."""
    keys = [F.col(series_col), F.window(F.col(ts_col), window).alias("w")]
    if role_col:
        keys.append(F.col(role_col))
    src = stream_df.withWatermark(ts_col, watermark)
    if aggs is None:
        src = src.withColumn("_tl", F.length(text_col).cast("long"))
        aggs = [
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("_tl").alias("text_len_sum"),
            F.min("_tl").alias("text_len_min"),
            F.max("_tl").alias("text_len_max"),
            F.sum(F.col(tool_col).isNotNull().cast("long")).alias("n_tool_calls"),
        ]
    agg = src.groupBy(*keys).agg(*aggs)
    out_cols = [F.col(series_col), F.col("w.start").alias("bucket_ts")]
    if role_col:
        out_cols.append(F.col(role_col))
    stat_cols = [c for c in agg.columns if c not in {series_col, "w", role_col}]
    return agg.select(*out_cols, *stat_cols)


_STEP_STATE = StructType(
    [StructField("last_ts", DoubleType()), StructField("last_value", DoubleType())]
)

# spike needs one row of lookahead: state buffers the not-yet-emittable
# latest point (cur) plus its predecessor (prev)
_SPIKE_STATE = StructType(
    [
        StructField("prev_ts", DoubleType()),
        StructField("prev_value", DoubleType()),
        StructField("cur_ts", DoubleType()),
        StructField("cur_value", DoubleType()),
    ]
)

_STEP_OUT = StructType(
    [
        StructField("series_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("flag_step_check", LongType()),
    ]
)


def stream_step_check(
    stream_df: DataFrame,
    value_col: str,
    max_: float,
    high: float = 2.0,
    series_col: str = "conv_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful streaming step_check: SPEC.md semantics, state = the last
    (ts, value) per series. Rows inside a micro-batch are sorted by ts;
    cross-batch continuity comes from the state store. Flags are computed
    with the same vector arithmetic as the batch check's lag frame (shift
    by one, np.select) — no per-row Python (round 7; the stream operators
    must stay guide-§4 vectorized like every other pandas kernel)."""
    import numpy as np
    import pandas as pd

    def fn(key, pdf_iter, state: GroupState):
        prev_exists = False
        p_v = float("nan")
        if state.exists:
            p_ts, p_v_raw = state.get
            if p_ts is not None:
                prev_exists = True
                p_v = float("nan") if p_v_raw is None else float(p_v_raw)
        chunks = list(pdf_iter)
        batch = (
            pd.concat(chunks).sort_values("_epoch")
            if chunks
            else pd.DataFrame({"_epoch": [], "_v": []})
        )
        T = batch["_epoch"].to_numpy(float)
        V = batch["_v"].to_numpy(float)
        n = len(T)
        if n:
            prev = np.empty(n)
            prev[0] = p_v if prev_exists else np.nan
            prev[1:] = V[:-1]
            no_prev = np.zeros(n, dtype=bool)
            no_prev[0] = not prev_exists
            with np.errstate(invalid="ignore"):
                d = np.abs(V - prev)
                flags = np.select(
                    [no_prev, np.isnan(V) | np.isnan(prev), d >= max_, d >= high],
                    [
                        int(Flag.INCONCLUSIVE),
                        int(Flag.DATA_MISSING),
                        int(Flag.FAIL),
                        int(Flag.WARN),
                    ],
                    default=int(Flag.PASS),
                )
            state.update((float(T[-1]), float(V[-1])))
            yield pd.DataFrame(
                {
                    "series_id": key[0],
                    "ts": pd.to_datetime((T * 1e6).round().astype("int64"), unit="us"),
                    "value": batch["_v"].to_numpy(),
                    "flag_step_check": flags.astype(np.int64),
                }
            )
        else:
            if state.exists:
                state.update(state.get)
            yield pd.DataFrame(columns=[f.name for f in _STEP_OUT])

    prepped = (
        stream_df.withWatermark(ts_col, watermark)
        .filter(F.col(ts_col).isNotNull())  # unordered rows cannot be checked
        .select(
            F.col(series_col).cast("string").alias("_sid"),
            (F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double") / 1e6).alias("_epoch"),
            F.col(value_col).cast("double").alias("_v"),
        )
    )
    return prepped.groupBy("_sid").applyInPandasWithState(
        fn, _STEP_OUT, _STEP_STATE, "append", GroupStateTimeout.NoTimeout
    )


_SPIKE_OUT = StructType(
    [
        StructField("series_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("flag_spike_check", LongType()),
    ]
)


def stream_spike_check(
    stream_df: DataFrame,
    value_col: str,
    max_: float,
    high: float = 2.0,
    series_col: str = "conv_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful streaming spike_check: the 3-point window needs one row of
    LOOKAHEAD, so each point is emitted when its successor arrives; state
    buffers (prev, cur) per series across micro-batches. The stream's
    final point stays pending until more data arrives — exactly the batch
    operator's trailing-context INCONCLUSIVE, deferred instead of
    emitted."""
    import math

    import numpy as np
    import pandas as pd

    def fn(key, pdf_iter, state: GroupState):
        # vectorized lookahead: stitch (state.prev, state.cur) in front of
        # the sorted micro-batch, then flag the interior points with the
        # SAME vector arithmetic as the batch check's lag/lead frame —
        # no per-row Python in the stream path.
        prev_exists = False
        pre_t: list[float] = []
        pre_v: list[float] = []
        if state.exists:
            p_ts, p_v, c_ts, c_v = state.get
            if p_ts is not None and not math.isnan(p_ts):
                prev_exists = True
                pre_t.append(p_ts)
                pre_v.append(p_v if p_v is not None else float("nan"))
            if c_ts is not None and not math.isnan(c_ts):
                pre_t.append(c_ts)
                pre_v.append(c_v if c_v is not None else float("nan"))
        chunks = list(pdf_iter)
        batch = (
            pd.concat(chunks).sort_values("_epoch")
            if chunks
            else pd.DataFrame({"_epoch": [], "_v": []})
        )
        T = np.concatenate([np.asarray(pre_t, float), batch["_epoch"].to_numpy(float)])
        V = np.concatenate([np.asarray(pre_v, float), batch["_v"].to_numpy(float)])
        n = len(T)

        rows_t: list[np.ndarray] = []
        rows_v: list[np.ndarray] = []
        rows_f: list[np.ndarray] = []
        if n >= 2:
            if not prev_exists:
                # seq[0] is the series' first-ever point: no predecessor
                rows_t.append(T[0:1])
                rows_v.append(V[0:1])
                rows_f.append(np.array([int(Flag.INCONCLUSIVE)], dtype=np.int64))
            if n >= 3:
                a, b, c = V[:-2], V[1:-1], V[2:]
                missing = np.isnan(a) | np.isnan(b) | np.isnan(c)
                d1, d2 = b - a, b - c
                with np.errstate(invalid="ignore"):
                    same_side = d1 * d2 > 0
                    m = np.minimum(np.abs(d1), np.abs(d2))
                    flags = np.select(
                        [missing, same_side & (m >= max_), same_side & (m >= high)],
                        [int(Flag.DATA_MISSING), int(Flag.FAIL), int(Flag.WARN)],
                        default=int(Flag.PASS),
                    )
                rows_t.append(T[1:-1])
                rows_v.append(V[1:-1])
                rows_f.append(flags.astype(np.int64))

        new_prev_t = T[-2] if n >= 2 else float("nan")
        new_prev_v = V[-2] if n >= 2 else float("nan")
        new_cur_t = T[-1] if n >= 1 else float("nan")
        new_cur_v = V[-1] if n >= 1 else float("nan")
        state.update((float(new_prev_t), float(new_prev_v), float(new_cur_t), float(new_cur_v)))

        if rows_t:
            t_all = np.concatenate(rows_t)
            df = pd.DataFrame(
                {
                    "series_id": key[0],
                    "ts": pd.to_datetime((t_all * 1e6).round().astype("int64"), unit="us"),
                    "value": np.concatenate(rows_v),
                    "flag_spike_check": np.concatenate(rows_f),
                }
            )
            yield df
        else:
            yield pd.DataFrame(columns=[f.name for f in _SPIKE_OUT])

    prepped = (
        stream_df.withWatermark(ts_col, watermark)
        .filter(F.col(ts_col).isNotNull())  # unordered rows cannot be checked
        .select(
            F.col(series_col).cast("string").alias("_sid"),
            (F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double") / 1e6).alias("_epoch"),
            F.col(value_col).cast("double").alias("_v"),
        )
    )
    return prepped.groupBy("_sid").applyInPandasWithState(
        fn, _SPIKE_OUT, _SPIKE_STATE, "append", GroupStateTimeout.NoTimeout
    )


_FLAT_STATE = StructType(
    [
        StructField("last_value", DoubleType()),
        StructField("run_len", LongType()),
        StructField("rn", LongType()),
    ]
)

_FLAT_OUT = StructType(
    [
        StructField("series_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("flag_flatline_check", LongType()),
    ]
)


def stream_flatline_check(
    stream_df: DataFrame,
    value_col: str,
    max_: int,
    series_col: str = "conv_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful streaming flatline_check (SPEC.md semantics): state carries
    (last_value, current run length, rows seen) per series — constant
    memory, exact continuity across micro-batches. Run lengths are
    computed vectorized (new-run boundaries → running-max start index →
    position in run), no per-row Python (round 7)."""
    import math

    import numpy as np
    import pandas as pd

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            lv, run0, rn0 = state.get
            last = float("nan") if lv is None or math.isnan(lv) else float(lv)
            run0, rn0 = int(run0), int(rn0)
        else:
            last, run0, rn0 = float("nan"), 0, 0
        chunks = list(pdf_iter)
        batch = (
            pd.concat(chunks).sort_values("_epoch")
            if chunks
            else pd.DataFrame({"_epoch": [], "_v": []})
        )
        T = batch["_epoch"].to_numpy(float)
        V = batch["_v"].to_numpy(float)
        n = len(T)
        if not n:
            if state.exists:
                state.update(state.get)
            yield pd.DataFrame(columns=[f.name for f in _FLAT_OUT])
            return
        prev = np.empty(n)
        prev[0] = last
        prev[1:] = V[:-1]
        # a run continues only when both sides are present and equal
        # (NaN != x covers missing rows and the no-last-value start)
        with np.errstate(invalid="ignore"):
            continues = (V == prev) & ~np.isnan(V) & ~np.isnan(prev)
        idx = np.arange(n)
        starts = np.maximum.accumulate(np.where(~continues, idx, -1))
        # starts == -1: still inside the run carried over from state
        run_len = np.where(starts == -1, run0 + idx + 1, idx - starts + 1)
        rn_arr = rn0 + idx + 1
        flags = np.select(
            [np.isnan(V), run_len >= max_ + 1, rn_arr <= max_],
            [int(Flag.DATA_MISSING), int(Flag.FAIL), int(Flag.INCONCLUSIVE)],
            default=int(Flag.PASS),
        )
        final_run = 0 if np.isnan(V[-1]) else int(run_len[-1])
        state.update((float(V[-1]), final_run, int(rn0 + n)))
        yield pd.DataFrame(
            {
                "series_id": key[0],
                "ts": pd.to_datetime((T * 1e6).round().astype("int64"), unit="us"),
                "value": pd.Series(V).where(~np.isnan(V), None),
                "flag_flatline_check": flags.astype(np.int64),
            }
        )

    prepped = (
        stream_df.withWatermark(ts_col, watermark)
        .filter(F.col(ts_col).isNotNull())  # unordered rows cannot be checked
        .select(
            F.col(series_col).cast("string").alias("_sid"),
            (F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double") / 1e6).alias("_epoch"),
            F.col(value_col).cast("double").alias("_v"),
        )
    )
    return prepped.groupBy("_sid").applyInPandasWithState(
        fn, _FLAT_OUT, _FLAT_STATE, "append", GroupStateTimeout.NoTimeout
    )
