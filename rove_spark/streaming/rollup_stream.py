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
    cross-batch continuity comes from the state store."""
    import pandas as pd

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            last_ts, last_value = state.get
        else:
            last_ts, last_value = None, None
        frames = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("_epoch")
            flags = []
            for ts_e, v in zip(pdf["_epoch"], pdf["_v"]):
                if last_ts is None:
                    flags.append(int(Flag.INCONCLUSIVE))
                elif pd.isna(v) or pd.isna(last_value) or last_value is None:
                    flags.append(int(Flag.DATA_MISSING))
                else:
                    d = abs(v - last_value)
                    flags.append(
                        int(Flag.FAIL)
                        if d >= max_
                        else int(Flag.WARN)
                        if d >= high
                        else int(Flag.PASS)
                    )
                last_ts, last_value = float(ts_e), (None if pd.isna(v) else float(v))
            frames.append(
                pd.DataFrame(
                    {
                        "series_id": key[0],
                        "ts": pd.to_datetime((pdf["_epoch"] * 1e6).round().astype("int64"), unit="us"),
                        "value": pdf["_v"],
                        "flag_step_check": flags,
                    }
                )
            )
        state.update((last_ts, last_value if last_value is not None else float("nan")))
        yield pd.concat(frames) if frames else pd.DataFrame(columns=[f.name for f in _STEP_OUT])

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
    memory, exact continuity across micro-batches."""
    import math

    import pandas as pd

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            lv, run_len, rn = state.get
            last = None if lv is None or math.isnan(lv) else lv
        else:
            last, run_len, rn = None, 0, 0
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("_epoch")
            for ts_e, v in zip(pdf["_epoch"], pdf["_v"]):
                val = None if pd.isna(v) else float(v)
                rn += 1
                if val is None:
                    run_len = 0
                    flag = int(Flag.DATA_MISSING)
                else:
                    run_len = run_len + 1 if (last is not None and val == last) else 1
                    if run_len >= max_ + 1:
                        flag = int(Flag.FAIL)
                    elif rn <= max_:
                        flag = int(Flag.INCONCLUSIVE)
                    else:
                        flag = int(Flag.PASS)
                out.append((key[0], float(ts_e), val, flag))
                last = val
        state.update((last if last is not None else float("nan"), run_len, rn))
        if out:
            df = pd.DataFrame(out, columns=["series_id", "ts", "value", "flag_flatline_check"])
            df["ts"] = pd.to_datetime((df["ts"] * 1e6).round().astype("int64"), unit="us")
            yield df
        else:
            yield pd.DataFrame(columns=[f.name for f in _FLAT_OUT])

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
