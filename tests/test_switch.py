"""DataSwitch routing + spec pushdown; point-in-polygon goldens and
plan-quality assertions (pushdown reaches the parquet scan)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from rove_spark.functions.durations import parse_iso8601
from rove_spark.functions.geo import point_in_polygon
from rove_spark.sources.switch import DataSwitch, SpaceSpec, TimeSpec
from rove_spark.sources.synthetic import synthetic_transcripts

SQUARE = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
TRIANGLE = [(0.0, 0.0), (4.0, 0.0), (0.0, 4.0)]


def test_point_in_polygon_golden(spark):
    pts = [
        (1, 5.0, 5.0, True),  # center
        (2, 15.0, 5.0, False),  # right of square
        (3, -1.0, 5.0, False),
        (4, 9.999, 9.999, True),
        (5, 5.0, 10.5, False),
    ]
    df = spark.createDataFrame([(i, x, y) for i, x, y, _ in pts], "id int, x double, y double")
    got = {r.id: r.inside for r in df.withColumn("inside", point_in_polygon("x", "y", SQUARE)).collect()}
    assert got == {i: e for i, x, y, e in pts}
    # triangle: hypotenuse boundary behavior is half-open but interior exact
    df2 = spark.createDataFrame([(1, 1.0, 1.0), (2, 3.0, 3.0)], "id int, x double, y double")
    got2 = {r.id: r.inside for r in df2.withColumn("inside", point_in_polygon("x", "y", TRIANGLE)).collect()}
    assert got2 == {1: True, 2: False}


def test_switch_routing_and_specs(spark):
    sw = DataSwitch()
    sw.register("transcripts", lambda: synthetic_transcripts(spark, n_conv=10, avg_turns=30))
    with pytest.raises(KeyError, match="InvalidDataSource"):
        sw.fetch("nope")

    full = sw.fetch("transcripts")
    ids = sw.fetch("transcripts", space_spec=SpaceSpec.one("conv-1", "conv-2"))
    assert {r.conv_id for r in ids.select("conv_id").distinct().collect()} == {"conv-1", "conv-2"}

    lo = dt.datetime(2024, 1, 2)
    hi = dt.datetime(2024, 1, 3)
    tfilt = sw.fetch("transcripts", time_spec=TimeSpec(lo, hi))
    rows = tfilt.agg(F.min("ts"), F.max("ts")).first()
    assert rows[0] >= lo and rows[1] <= hi
    assert tfilt.count() < full.count()


def test_switch_context_widening(spark):
    """Leading/trailing context widens the fetched range by k·resolution
    (fetch.rs:199-209 analog)."""
    src = synthetic_transcripts(spark, n_conv=5, avg_turns=50)
    sw = DataSwitch()
    sw.register("t", lambda: src)
    t0 = src.agg(F.min("ts")).first()[0]
    lo = t0 + dt.timedelta(minutes=10)
    hi = t0 + dt.timedelta(minutes=20)
    base = sw.fetch("t", time_spec=TimeSpec(lo, hi, parse_iso8601("PT1M")))
    widened = sw.fetch(
        "t", time_spec=TimeSpec(lo, hi, parse_iso8601("PT1M")), num_leading=10, num_trailing=5
    )
    bmin, bmax = base.agg(F.min("ts"), F.max("ts")).first()
    wmin, wmax = widened.agg(F.min("ts"), F.max("ts")).first()
    assert wmin < bmin and wmin >= lo - dt.timedelta(minutes=10)
    assert wmax >= bmax


def test_polygon_spec(spark):
    from rove_spark.operators.spatial import with_synthetic_coords

    sw = DataSwitch()
    sw.register(
        "t",
        lambda: with_synthetic_coords(synthetic_transcripts(spark, n_conv=50, avg_turns=5)),
    )
    box = [(8.0, 58.0), (9.5, 58.0), (9.5, 61.0), (8.0, 61.0)]  # (lon, lat)
    inside = sw.fetch("t", space_spec=SpaceSpec.poly(box))
    rows = inside.select("lon", "lat").collect()
    assert 0 < len(rows)
    assert all(8.0 <= r.lon <= 9.5 for r in rows)


def test_time_pushdown_reaches_parquet(tmp_path, spark):
    """P1 parity: the time predicate must appear in PushedFilters of the
    parquet scan, not as a post-scan filter only."""
    synthetic_transcripts(spark, n_conv=5, avg_turns=20).write.parquet(str(tmp_path / "t"))
    sw = DataSwitch()
    sw.register("t", lambda: spark.read.parquet(str(tmp_path / "t")))
    out = sw.fetch("t", time_spec=TimeSpec(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "ts" in plan.split("PushedFilters:")[1][:200]


def test_declared_resolution_filter(spark):
    """P4 (fetch.rs:31-37): series declaring a resolution different from
    the requested grid are dropped; equivalence is semantic (PT1H ==
    PT60M); unparseable or NULL declarations are mismatches; sources
    without the metadata column are untouched."""
    src = synthetic_transcripts(spark, n_conv=8, avg_turns=20)
    declared = (
        F.when(F.col("conv_id").isin("conv-0", "conv-1"), F.lit("PT1H"))
        .when(F.col("conv_id") == "conv-2", F.lit("PT60M"))  # equivalent
        .when(F.col("conv_id") == "conv-3", F.lit("PT10M"))  # mismatch
        .when(F.col("conv_id") == "conv-4", F.lit("garbage"))  # unparseable
        .otherwise(F.lit(None).cast("string"))  # undeclared
    )
    tagged = src.withColumn("declared_resolution", declared)
    sw = DataSwitch()
    sw.register("t", lambda: tagged)
    lo, hi = tagged.agg(F.min("ts"), F.max("ts")).first()
    spec = TimeSpec(lo, hi, parse_iso8601("PT1H"))
    got = {
        r.conv_id
        for r in sw.fetch("t", time_spec=spec).select("conv_id").distinct().collect()
    }
    assert got == {"conv-0", "conv-1", "conv-2"}
    # no resolution requested -> no filtering
    all_ids = sw.fetch("t", time_spec=TimeSpec(lo, hi)).select("conv_id").distinct().count()
    assert all_ids == 8
    # source without the metadata column -> untouched
    sw.register("bare", lambda: src)
    assert sw.fetch("bare", time_spec=spec).select("conv_id").distinct().count() == 8
