"""Regression tests for review-found defects: resume boundary context,
long dedup chains, buddy FAIL/ISOLATED precedence, off-grid spine anchor."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from rove_spark.config import parse_pipeline
from rove_spark.model import Flag
from rove_spark.plans.engine import Engine

PIPE = """
[[step]]
name = "step_check"
[step.step_check]
max = 50.0
"""


def test_resume_preserves_cross_day_context(tmp_path, spark):
    """A step anomaly exactly at a day boundary must be flagged identically
    whether the second day is computed fresh or in a resumed run (the
    check needs the previous day's last row as lag context)."""
    t0 = dt.datetime(2024, 1, 1, 23, 58)
    rows = [
        ("c1", t0, 10.0),
        ("c1", t0 + dt.timedelta(minutes=1), 10.5),  # 23:59 day 1
        ("c1", t0 + dt.timedelta(minutes=2), 200.0),  # 00:00 day 2 — step FAIL
        ("c1", t0 + dt.timedelta(minutes=3), 200.5),
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, text_len double")
    eng = Engine(spark, pipelines={"p": parse_pipeline("p", PIPE)})

    # resumed: day 1 first, then day 2
    d1 = df.filter(F.to_date("ts") == "2024-01-01")
    eng.run_job(d1, "p", tmp_path / "resumed", input_fingerprint="f")
    eng.run_job(df, "p", tmp_path / "resumed", input_fingerprint="f")
    # fresh: both days at once
    eng.run_job(df, "p", tmp_path / "fresh", input_fingerprint="f")

    def fails(d):
        t = spark.read.parquet(str(tmp_path / d / "tier_1m"))
        return {
            (r.conv_id, r.bucket_ts): r.n_fail_step_check
            for r in t.collect()
        }

    assert fails("resumed") == fails("fresh")
    # and the boundary FAIL is actually present
    assert sum(fails("fresh").values()) == 1


def test_dedup_chain_converges(spark):
    """An 8-doc chain (only consecutive pairs near-dup) must collapse to
    one cluster — requires propagation to convergence, not a fixed round
    count."""
    from rove_spark.operators.dedup import dedup_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "id_a long, id_b long"
    )
    ids = spark.createDataFrame([(i,) for i in range(1, 9)], "doc_id long")
    labels = {r.doc_id: r.cluster_id for r in dedup_components(pairs, ids).collect()}
    assert set(labels.values()) == {1}


def test_buddy_fail_not_overwritten_by_isolated():
    """Two mutual buddies that both FAIL must stay FAIL in later
    iterations (not flip to ISOLATED once the pool empties)."""
    from rove_spark.operators.spatial import buddy_check_kernel

    lat = np.array([60.0, 60.001, 60.002])
    lon = np.array([10.0, 10.001, 10.002])
    # [0, 60, 100]: iteration 1 FAILs both extremes (z = 4.0 and 2.33);
    # iteration 2 leaves only the middle station usable (cnt < num_min ⇒
    # ISOLATED) — the FAILed extremes must NOT be downgraded to ISOLATED
    values = np.array([0.0, 60.0, 100.0])
    flags = buddy_check_kernel(
        values, lat, lon, np.zeros(3),
        radius=5000.0, num_min=2, threshold=2.0, min_std=1.0, num_iterations=3,
    )
    assert list(flags) == [Flag.FAIL, Flag.ISOLATED, Flag.FAIL]


def test_gridfill_epoch_anchor_keeps_on_grid_obs(spark):
    """A series whose earliest row is off-grid must not shift the spine:
    later on-grid observations stay joined (epoch-anchored grid)."""
    from rove_spark.functions.durations import parse_iso8601
    from rove_spark.operators.gridfill import grid_fill

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("s1", t0 + dt.timedelta(minutes=30), 1.0),  # off-grid for PT1H
        ("s1", t0 + dt.timedelta(hours=1), 2.0),
        ("s1", t0 + dt.timedelta(hours=2), 3.0),
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, value float")
    out = grid_fill(df, parse_iso8601("PT1H")).orderBy("ts").collect()
    vals = [r.value for r in out]
    assert 2.0 in vals and 3.0 in vals  # on-grid obs survive
    assert out[0].ts == t0  # spine anchored at the epoch-aligned floor


def test_gridfill_series_anchor_for_phase_offset(spark):
    """A consistently phase-offset series (hourly at :30) keeps all rows
    with anchor='series' (reference convention); with the default epoch
    anchor it would match no slot."""
    from rove_spark.functions.durations import parse_iso8601
    from rove_spark.operators.gridfill import grid_fill

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [("s1", t0 + dt.timedelta(hours=k), float(k)) for k in (0, 1, 3)]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, value float")
    out = grid_fill(df, parse_iso8601("PT1H"), anchor="series").orderBy("ts").collect()
    assert [r.value for r in out] == [0.0, 1.0, None, 3.0]
    assert out[0].ts == t0
