"""Grid alignment + gap-fill — the signature data-prep operator.

Reference semantics (``/root/reference/met_connectors/src/frost/fetch.rs:
86-148``): every series is placed on a regular time grid
``start + k*period``; missing grid slots become explicit ``None`` cells;
off-grid timestamps are a hard "Misalignment" error (``fetch.rs:104-107,
115-119, 133-137``); leading/trailing context slots are padded.

Spark-first re-expression: per series, build a grid *spine* with
``sequence(grid_floor(min_ts), max_ts, period)`` + ``explode``, then
left-join observations on exact grid timestamps. Slots with no observation
get NULL signal columns (the ``None`` gap analog). Off-grid rows are routed
to an ``on_grid = false`` marker instead of erroring (documented divergence:
a 100 TB batch job must quarantine, not abort; rove's per-request error
becomes a per-row INVALID flag downstream).

Scale notes:
- the min/max aggregation and the spine join both hash-partition on
  ``series_id`` — one shuffle each, no driver-side work, no UDFs;
- the spine is generated per (series, calendar chunk), NOT as one
  ``sequence(min_ts, max_ts)`` array per series: a decade-long PT1M series
  would otherwise materialize a ~5M-element array (~40 MB) in a single
  row before explode. The chunk unit auto-scales with the period (day for
  sub-minute, month for sub-hour, year otherwise), bounding any one array
  at ≤ ~90k elements while keeping slot_idx globally consistent (it's
  computed arithmetically from the series origin, not positionally);
- calendar (month / mixed) periods keep the single-sequence path — month
  steps are ≤ 12 slots/year, no blowup possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rove_spark.functions.durations import Duration


def grid_fill(
    df: DataFrame,
    period: Duration,
    series_col: str = "conv_id",
    ts_col: str = "ts",
    keep_cols: list[str] | None = None,
    num_leading: int = 0,
    num_trailing: int = 0,
    anchor: str = "epoch",
    chunk: str | None = "auto",
) -> DataFrame:
    """Align each series onto its regular grid and materialize gaps.

    ``anchor='epoch'`` (default) floors each series' grid origin to the
    epoch-aligned slot (the snap_to_grid convention) — required for grids
    comparable across series. A series whose points are *consistently
    phase-offset* (e.g. hourly at :30) would match no epoch slot and lose
    every row to gaps; such sources should pass ``anchor='series'`` to
    grid from their own first timestamp (the reference's convention — its
    grid starts at the first observation, ``fetch.rs:86-101``). Run
    ``find_misaligned`` first either way: partially off-grid rows are
    quarantine material, not silently droppable.

    Returns one row per (series, grid slot) with:
    - all ``keep_cols`` from the matching observation (NULL on gaps),
    - ``is_gap`` boolean,
    - ``slot_idx`` long (k in start + k*period).

    ``num_leading``/``num_trailing`` extend the grid before min_ts / after
    max_ts with context slots (reference pads leading/trailing ``None``s,
    ``fetch.rs:102-122,140-144``).

    ``chunk`` bounds spine-array size for second-based periods (see module
    scale notes): ``'auto'`` picks day/month/year by period, an explicit
    ``'day'``/``'month'``/``'year'`` pins it, ``None`` restores the single
    sequence-per-series path. Chunked ≡ unchunked by construction (slot
    partition is exact; tested), so this is purely a memory-shape knob.
    """
    if period.is_calendar and period.seconds and anchor == "epoch":
        # a mixed step has no well-defined epoch-aligned slot (the k-th
        # slot depends on the whole walk, not a modulus); the reference's
        # own convention for these grids is first-observation origin
        raise ValueError(
            "mixed month+second periods have no epoch anchor; pass "
            "anchor='series' (the reference's first-observation origin)"
        )
    keep_cols = keep_cols if keep_cols is not None else [
        c for c in df.columns if c not in (series_col, ts_col)
    ]

    interval = F.expr(period.interval_sql())
    obs = df.select(
        series_col,
        ts_col,
        *keep_cols,
        F.lit(True).alias("_observed"),
    )

    bounds = obs.groupBy(series_col).agg(
        F.min(ts_col).alias("_min_ts"), F.max(ts_col).alias("_max_ts")
    )
    # anchor the spine (see docstring): 'epoch' floors the origin to the
    # shared grid so a stray off-grid first obs cannot shift the whole
    # spine and silently drop on-grid observations; 'series' keeps the
    # reference's first-observation origin for phase-offset sources.
    if anchor == "epoch":
        if period.is_calendar:
            bounds = bounds.withColumn("_min_ts", F.date_trunc("month", "_min_ts"))
        else:
            sec = period.seconds
            epoch = F.unix_timestamp("_min_ts")
            bounds = bounds.withColumn(
                "_min_ts", F.timestamp_seconds(epoch - F.pmod(epoch, F.lit(sec)))
            )
    elif anchor != "series":
        raise ValueError(f"anchor must be 'epoch' or 'series', got {anchor!r}")
    if num_leading:
        bounds = bounds.withColumn("_min_ts", F.col("_min_ts") - interval * num_leading)
    if num_trailing:
        bounds = bounds.withColumn("_max_ts", F.col("_max_ts") + interval * num_trailing)

    if period.is_calendar or chunk is None:
        # calendar steps are coarse (≤12 slots/year) — single sequence
        spine = bounds.select(
            series_col,
            F.posexplode(F.sequence("_min_ts", "_max_ts", interval)).alias("slot_idx", ts_col),
        )
    else:
        sec = period.seconds
        if chunk == "auto":
            unit = "day" if sec < 60 else ("month" if sec < 3600 else "year")
        elif chunk in ("day", "month", "year"):
            unit = chunk
        else:
            raise ValueError(f"chunk must be 'auto', 'day', 'month', 'year' or None, got {chunk!r}")
        cint = F.expr(f"INTERVAL 1 {unit}")

        # exact integer microsecond arithmetic throughout: unix_timestamp
        # floors to whole seconds, which would shift a sub-second series
        # origin (anchor='series') and silently turn EVERY observation
        # into a gap (CLAUDE.md's second-flooring hazard — caught in the
        # round-3 review). unix_micros rejects TIMESTAMP_NTZ, so cast
        # (value-preserving under the UTC session) first.
        def us(c):
            return F.unix_micros(c.cast("timestamp"))

        # exact floor/ceil division on longs for the full 2⁶³ µs domain:
        # x - pmod(x, y) is the floor multiple for any sign of x, and the
        # divide runs in decimal(38,0) — a plain `/` goes through double,
        # whose 2⁻⁵³ relative rounding can truncate the quotient one low
        # past 2⁵³ µs ≈ 285 y (the exactly-divisible numerator makes the
        # decimal quotient integral, so no scale rounding either)
        def fdiv(x, y):
            return ((x - F.pmod(x, y)).cast("decimal(38,0)") / y).cast("long")

        def cdiv(x, y):
            return -fdiv(-x, y)

        sec_us = sec * 1_000_000
        chunks = bounds.select(
            series_col,
            us(F.col("_min_ts")).alias("_min_u"),
            us(F.col("_max_ts")).alias("_max_u"),
            F.explode(
                F.sequence(F.date_trunc(unit, "_min_ts"), F.col("_max_ts"), cint)
            ).alias("_cstart"),
        )
        cs_u = us(F.col("_cstart"))
        ce_u = us(F.col("_cstart") + cint)
        # slots are min_ts + k*sec; this chunk owns k ∈ [k0, k1]:
        # k0 = first slot ≥ chunk start (ceil division; negatives only at
        # the first chunk, clamped to 0), k1 = last slot < chunk end and
        # ≤ max_ts — consecutive chunks partition the k range exactly
        k0 = F.greatest(
            F.lit(0).cast("long"), cdiv(cs_u - F.col("_min_u"), F.lit(sec_us))
        )
        k1 = F.least(
            fdiv(ce_u - F.lit(1) - F.col("_min_u"), F.lit(sec_us)),
            fdiv(F.col("_max_u") - F.col("_min_u"), F.lit(sec_us)),
        )
        # F.sequence(k0, k1) DESCENDS when k1 < k0 — guard empty chunks
        slots = F.when(k1 >= k0, F.sequence(k0, k1)).otherwise(
            F.array().cast("array<bigint>")
        )
        ts_type = df.schema[ts_col].dataType
        spine = (
            chunks.select(series_col, "_min_u", F.explode(slots).alias("slot_idx"))
            .select(
                series_col,
                "slot_idx",
                F.timestamp_micros(F.col("_min_u") + F.col("slot_idx") * F.lit(sec_us))
                .cast(ts_type)
                .alias(ts_col),
            )
        )

    out = spine.join(obs, on=[series_col, ts_col], how="left")
    out = out.withColumn("is_gap", F.col("_observed").isNull()).drop("_observed")
    return out


def snap_to_grid(
    df: DataFrame,
    period: Duration,
    ts_col: str = "ts",
) -> DataFrame:
    """Pre-pass for possibly-misaligned sources: mark each row ``on_grid``
    and add ``grid_ts`` = the slot floor. Rows off-grid keep their data but
    are flaggable as INVALID downstream (divergence from the reference's
    hard Misalignment error, ``fetch.rs:133-137`` — documented in SPEC.md).
    """
    if period.is_calendar and period.seconds:
        raise ValueError(
            "snap_to_grid needs a modulus; mixed month+second grids have "
            "none — validate such sources against an explicit grid_fill spine"
        )
    if period.is_calendar:
        grid_ts = F.date_trunc("month", F.col(ts_col))
    else:
        sec = period.seconds
        epoch = F.unix_timestamp(F.col(ts_col))
        grid_ts = F.timestamp_seconds((epoch - F.pmod(epoch, F.lit(sec))))
    return df.withColumn("grid_ts", grid_ts).withColumn(
        "on_grid", F.col(ts_col) == F.col("grid_ts")
    )


def find_misaligned(
    df: DataFrame,
    period: Duration,
    series_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Quarantine report for the reference's two hard errors
    (``fetch.rs:104-107,115-119,133-137``): rows off the grid and
    duplicate (series, grid-slot) observations. Returns the offending rows
    with a ``reason`` column — callers route them to an INVALID sink
    instead of aborting (SPEC.md divergence note). Run it BEFORE
    ``grid_fill``: duplicates would otherwise fan out the spine join."""
    snapped = snap_to_grid(df, period, ts_col=ts_col)
    off_grid = snapped.filter(~F.col("on_grid")).select(
        series_col, ts_col, F.lit("off_grid").alias("reason")
    )
    dupes = (
        snapped.groupBy(series_col, "grid_ts")
        .count()
        .filter(F.col("count") > 1)
        .select(
            series_col,
            F.col("grid_ts").alias(ts_col),
            F.lit("duplicate_slot").alias("reason"),
        )
    )
    return off_grid.unionByName(dupes)


def fill_forward(
    df: DataFrame,
    value_col: str,
    series_col: str = "conv_id",
    ts_col: str = "ts",
    out_col: str | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Last-observation-carried-forward over gaps (engine extra; rove keeps
    gaps as None — this is for rollup consumers that want dense series).
    Pass ``order_cols`` with a tiebreaker when ``ts`` isn't unique."""
    w = (
        Window.partitionBy(series_col)
        .orderBy(*(order_cols or [ts_col]))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col or f"{value_col}_ff", F.last(value_col, ignorenulls=True).over(w))
