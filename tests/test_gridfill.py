"""Grid alignment + gap-fill goldens — mirrors the reference's alignment
tests (``/root/reference/met_connectors/src/frost/fetch.rs:231-361``):
exact slot contents, gap materialization, leading/trailing padding, and
off-grid handling (our divergence: flag, don't error)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from rove_spark.functions.durations import parse_iso8601
from rove_spark.operators.gridfill import fill_forward, grid_fill, snap_to_grid

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
PT1M = parse_iso8601("PT1M")


def _obs(spark, slots, series="s1"):
    rows = [(series, T0 + dt.timedelta(minutes=k), float(10 + k)) for k in slots]
    return spark.createDataFrame(rows, "conv_id string, ts timestamp, value float")


def test_gapfill_golden(spark):
    # observations at minutes 0,1,3,6 → gaps at 2,4,5
    df = _obs(spark, [0, 1, 3, 6])
    out = grid_fill(df, PT1M).orderBy("ts").collect()
    assert [r.slot_idx for r in out] == [0, 1, 2, 3, 4, 5, 6]
    assert [r.is_gap for r in out] == [False, False, True, False, True, True, False]
    assert [r.value for r in out] == [10.0, 11.0, None, 13.0, None, None, 16.0]
    assert out[0].ts == T0 and out[6].ts == T0 + dt.timedelta(minutes=6)


def test_leading_trailing_padding(spark):
    # reference pads context slots before/after the QC window
    # (fetch.rs:102-122,140-144)
    df = _obs(spark, [2, 3])
    out = grid_fill(df, PT1M, num_leading=2, num_trailing=1).orderBy("ts").collect()
    assert len(out) == 5
    assert out[0].ts == T0 and out[0].is_gap
    assert out[1].is_gap
    assert not out[2].is_gap and not out[3].is_gap
    assert out[4].is_gap  # trailing pad


def test_multi_series_independent_grids(spark):
    a = _obs(spark, [0, 2], series="a")
    b = _obs(spark, [5, 6], series="b")
    out = grid_fill(a.unionByName(b), PT1M)
    got = {(r.conv_id, r.slot_idx): r.is_gap for r in out.collect()}
    assert got == {
        ("a", 0): False,
        ("a", 1): True,
        ("a", 2): False,
        ("b", 0): False,
        ("b", 1): False,
    }


def test_snap_to_grid_flags_misalignment(spark):
    rows = [
        ("s1", T0, 1.0),
        ("s1", T0 + dt.timedelta(seconds=90), 2.0),  # off-grid for PT1M
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, value float")
    out = snap_to_grid(df, PT1M).orderBy("ts").collect()
    assert out[0].on_grid and out[0].grid_ts == T0
    assert not out[1].on_grid
    assert out[1].grid_ts == T0 + dt.timedelta(minutes=1)


def test_hourly_grid(spark):
    rows = [
        ("s1", T0, 1.0),
        ("s1", T0 + dt.timedelta(hours=3), 2.0),
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, value float")
    out = grid_fill(df, parse_iso8601("PT1H")).orderBy("ts").collect()
    assert len(out) == 4
    assert [r.is_gap for r in out] == [False, True, True, False]


def test_fill_forward(spark):
    df = _obs(spark, [0, 1, 3, 6])
    gridded = grid_fill(df, PT1M)
    out = fill_forward(gridded, "value").orderBy("ts").collect()
    assert [r.value_ff for r in out] == [10.0, 11.0, 11.0, 13.0, 13.0, 13.0, 16.0]


def test_gridfill_plan_has_no_udfs(spark):
    """The whole prep stage must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython nodes in the physical plan."""
    df = _obs(spark, [0, 1, 3])
    plan = grid_fill(df, PT1M)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_calendar_month_grid(spark):
    """Calendar-aware periods (RelativeDuration months,
    duration.rs:67-68): month-step grids via INTERVAL MONTH sequence."""
    rows = [
        ("s1", dt.datetime(2024, 1, 1), 1.0),
        ("s1", dt.datetime(2024, 4, 1), 2.0),
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, value float")
    out = grid_fill(df, parse_iso8601("P1M")).orderBy("ts").collect()
    assert [r.ts.month for r in out] == [1, 2, 3, 4]
    assert [r.is_gap for r in out] == [False, True, True, False]


def test_find_misaligned(spark):
    from rove_spark.operators.gridfill import find_misaligned

    rows = [
        ("s1", T0, 1.0),
        ("s1", T0 + dt.timedelta(seconds=90), 2.0),  # off grid
        ("s2", T0, 3.0),
        ("s2", T0 + dt.timedelta(seconds=10), 4.0),  # off grid AND same slot as prev
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, value float")
    got = {(r.conv_id, r.reason) for r in find_misaligned(df, PT1M).collect()}
    assert ("s1", "off_grid") in got
    assert ("s2", "off_grid") in got
    assert ("s2", "duplicate_slot") in got
    assert ("s1", "duplicate_slot") not in got


def test_mixed_calendar_grid(spark):
    """P1MT1H: slots walk +1 month +1 hour from the first observation
    (RelativeDuration composition, duration.rs:67-69). Observations on the
    walk land in slots; off-walk months are gaps."""
    import pytest

    period = parse_iso8601("P1MT1H")
    pts = [
        dt.datetime(2024, 1, 15, 6, 0),   # slot 0
        dt.datetime(2024, 2, 15, 7, 0),   # slot 1
        # slot 2 (2024-03-15 08:00) missing → gap
        dt.datetime(2024, 4, 15, 9, 0),   # slot 3
    ]
    rows = [("c1", t, float(i)) for i, t in enumerate(pts)]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, value float")
    out = grid_fill(df, period, anchor="series").orderBy("ts").collect()
    assert [r.ts for r in out] == [
        dt.datetime(2024, 1, 15, 6, 0),
        dt.datetime(2024, 2, 15, 7, 0),
        dt.datetime(2024, 3, 15, 8, 0),
        dt.datetime(2024, 4, 15, 9, 0),
    ]
    assert [r.is_gap for r in out] == [False, False, True, False]
    assert [r.slot_idx for r in out] == [0, 1, 2, 3]
    # epoch anchor is undefined for mixed steps: loud error, not silence
    with pytest.raises(ValueError, match="epoch anchor"):
        grid_fill(df, period)
    with pytest.raises(ValueError, match="modulus"):
        snap_to_grid(df, period)


def test_chunked_spine_equals_unchunked(spark):
    """Round-2 verdict item 3: the per-(series, calendar-chunk) spine must
    produce EXACTLY the single-sequence spine — same slots, same slot_idx,
    same gaps — for every chunk unit and for sparse multi-chunk series."""
    # 3 sparse observations spanning ~2.5 years of PT1H grid, plus a
    # second series spanning 3 days of PT30S, plus leading/trailing pads
    rows = [
        ("long", dt.datetime(2020, 1, 15, 7), 1.0),
        ("long", dt.datetime(2021, 6, 2, 13), 2.0),
        ("long", dt.datetime(2022, 7, 30, 22), 3.0),
        ("fine", dt.datetime(2020, 3, 1, 0, 0, 30), 4.0),
        ("fine", dt.datetime(2020, 3, 3, 23, 59, 30), 5.0),
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, v double")
    for per, unit in [("PT1H", "year"), ("PT30S", "day"), ("PT1H", "month")]:
        period = parse_iso8601(per)
        sub = df.filter(F.col("conv_id") == ("long" if per == "PT1H" else "fine"))
        for kwargs in [dict(), dict(num_leading=2, num_trailing=3), dict(anchor="series")]:
            chunked = grid_fill(sub, period, chunk=unit, **kwargs)
            plain = grid_fill(sub, period, chunk=None, **kwargs)
            a = sorted(map(tuple, chunked.select("conv_id", "slot_idx", "ts", "v", "is_gap").collect()))
            b = sorted(map(tuple, plain.select("conv_id", "slot_idx", "ts", "v", "is_gap").collect()))
            assert a == b, (per, unit, kwargs, len(a), len(b))
            n = len(a)
            assert n > 1000  # genuinely multi-chunk
            assert [r[1] for r in a] == list(range(n))  # slot_idx dense 0..n-1


def test_chunked_spine_subsecond_origin(spark):
    """Round-3 review: a sub-second series origin (anchor='series') must
    not be floored to whole seconds — every on-grid obs still joins."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0, 500000)
    rows = [("s", t0 + dt.timedelta(hours=k), float(k)) for k in range(0, 60, 7)]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, v double")
    for unit in ("day", None):
        out = grid_fill(df, parse_iso8601("PT1H"), anchor="series", chunk=unit)
        got = out.orderBy("slot_idx").collect()
        assert len(got) == 57  # slots 0..56 inclusive (span = 56 h)
        assert sum(not r.is_gap for r in got) == len(rows)  # nothing lost
        assert got[0].ts == t0 and got[0].v == 0.0
