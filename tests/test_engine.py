"""Engine orchestration: TOML pipeline → composed stages; long-format melt;
checkpointed tier job with resume + invalidation semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from rove_spark.config import parse_pipeline
from rove_spark.model import Flag
from rove_spark.operators.signals import derive_signals
from rove_spark.plans.engine import Engine, flag_name_column, melt_flags
from rove_spark.sources.synthetic import synthetic_transcripts

PIPE = """
[[step]]
name = "special_values_check"
[step.special_value_check]
special_values = [-999.0]

[[step]]
name = "range_check"
[step.range_check]
min = 0.0
max = 5000.0

[[step]]
name = "step_check"
[step.step_check]
max = 500.0

[[step]]
name = "spike_check"
[step.spike_check]
max = 400.0

[[step]]
name = "flatline_check"
[step.flatline_check]
max = 10
"""


def _engine(spark, toml=PIPE, **kw):
    return Engine(spark, pipelines={"ta": parse_pipeline("ta", toml)}, **kw)


def _signals(spark, **kw):
    df = synthetic_transcripts(spark, n_conv=20, avg_turns=40, **kw)
    return derive_signals(df)


def test_run_pipeline_appends_flag_columns(spark):
    eng = _engine(spark)
    out = eng.run_pipeline(_signals(spark), "ta", value_col="text_len")
    for c in eng.flag_columns("ta"):
        assert c in out.columns, c
    # anomalies in the synthetic data must trip step/spike
    fails = out.filter(F.col("flag_step_check") == int(Flag.FAIL)).count()
    assert fails > 0


def test_unknown_pipeline_raises(spark):
    import pytest

    with pytest.raises(KeyError, match="TestNotInPipelines"):
        _engine(spark).run_pipeline(_signals(spark), "nope", value_col="text_len")


def test_aux_source_steps(spark):
    toml = """
[[step]]
name = "climate_range_check"
[step.range_check_dynamic]
source = "clim"
on = ["role"]

[[step]]
name = "model_check"
[step.model_consistency_check]
model_source = "hirlam"
threshold = 1000.0
on = ["conv_id", "ts"]
"""
    df = _signals(spark)
    clim = spark.createDataFrame(
        [("user", 0.0, 1200.0), ("assistant", 0.0, 1200.0), ("tool", 0.0, 1200.0)],
        "role string, lo double, hi double",
    )
    model = df.select("conv_id", "ts", (F.col("text_len") + 1.0).alias("model_value"))
    eng = _engine(spark, toml=toml, aux_sources={"clim": clim, "hirlam": model})
    out = eng.run_pipeline(df, "ta", value_col="text_len")
    rows = out.select("flag_climate_range_check", "flag_model_check").collect()
    assert all(r.flag_model_check == Flag.PASS for r in rows)  # |v−(v+1)| ≤ 1000
    assert any(r.flag_climate_range_check == Flag.FAIL for r in rows)  # anomalies > 1200


def test_buddy_step_through_engine(spark):
    from rove_spark.operators.spatial import with_synthetic_coords

    toml = """
[[step]]
name = "buddy_check"
[step.buddy_check]
radii = [500000.0]
nums_min = [2]
threshold = 30.0
"""
    df = with_synthetic_coords(_signals(spark))
    # one shared time slice so every conversation is a buddy candidate
    df = df.withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    df = df.groupBy("conv_id", "ts", "lat", "lon", "elev").agg(
        F.avg("text_len").alias("text_len")
    )
    eng = _engine(spark, toml=toml)
    out = eng.run_pipeline(df, "ta", value_col="text_len")
    flags = {r[0] for r in out.select("flag_buddy_check").collect()}
    assert flags <= {Flag.PASS, Flag.FAIL, Flag.ISOLATED}


def test_melt_flags_long_format(spark):
    eng = _engine(spark)
    out = eng.run_pipeline(_signals(spark), "ta", value_col="text_len")
    names = [s.name for s in eng.pipelines["ta"].steps]
    long = melt_flags(out, names)
    assert long.columns == ["identifier", "time", "test", "flag"]
    n_wide = out.count()
    assert long.count() == n_wide * len(names)
    named = long.withColumn("flag_name", flag_name_column())
    assert {r.flag_name for r in named.select("flag_name").distinct().collect()} <= set(
        Flag.names()
    )


def test_run_job_checkpoint_resume(tmp_path, spark):
    eng = _engine(spark)
    df = _signals(spark)
    days = sorted(
        r.d for r in df.select(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("d")).distinct().collect()
    )
    assert len(days) >= 3

    # partial run: pretend the job died after the first two days
    part = df.filter(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").isin(days[:2]))
    r1 = eng.run_job(part, "ta", tmp_path / "out", input_fingerprint="fp1")
    assert r1["computed"] == days[:2]

    # resume with the full input: the remaining days are computed, plus
    # the adjacent done day is re-materialized (its trailing-edge flags
    # only become decidable now that the next day exists)
    r2 = eng.run_job(df, "ta", tmp_path / "out", input_fingerprint="fp1")
    assert r2["computed"] == days[1:]
    assert r2["recomputed_context"] == [days[1]]
    assert r2["skipped"] == [days[0]]

    # third run: everything is done
    r3 = eng.run_job(df, "ta", tmp_path / "out", input_fingerprint="fp1")
    assert r3["computed"] == []
    assert r3["skipped"] == days

    # resumed output ≡ from-scratch output
    r_fresh = eng.run_job(df, "ta", tmp_path / "fresh", input_fingerprint="fp1")
    assert r_fresh["computed"] == days
    for tier in ("1m", "1h", "1d"):
        a = spark.read.parquet(str(tmp_path / "out" / f"tier_{tier}"))
        b = spark.read.parquet(str(tmp_path / "fresh" / f"tier_{tier}"))
        cols = sorted(a.columns)
        ca = sorted(tuple(str(x) for x in r) for r in a.select(*cols).collect())
        cb = sorted(tuple(str(x) for x in r) for r in b.select(*cols).collect())
        assert ca == cb, tier

    # manifest carries lineage + metrics
    from rove_spark.plans.checkpoint import CheckpointManifest

    recs = CheckpointManifest(tmp_path / "out" / "_checkpoint.json").records()
    assert set(recs) == set(days)
    any_rec = recs[days[0]]
    assert any_rec["lineage"]["pipeline"] == "ta"
    assert any_rec["metrics"]["rows_1m"] > 0


def test_run_job_backfill_reflags_following_day(tmp_path, spark):
    """Out-of-order arrival: run the LATER days first, then backfill the
    first day. The already-done following day must be re-materialized
    (its head-of-day lag flags were INCONCLUSIVE without day 1) and the
    final tiers must equal a from-scratch run — the round-1 advice gap."""
    eng = _engine(spark)
    df = _signals(spark)
    dcol = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    days = sorted(r.d for r in df.select(dcol.alias("d")).distinct().collect())
    assert len(days) >= 3

    # later days arrive first
    late = df.filter(dcol.isin(days[1:]))
    r1 = eng.run_job(late, "ta", tmp_path / "out", input_fingerprint="fp1")
    assert r1["computed"] == days[1:]

    # day 1 backfills: day 2 (done, following) must be recomputed too
    r2 = eng.run_job(df, "ta", tmp_path / "out", input_fingerprint="fp1")
    assert days[1] in r2["recomputed_context"]
    assert sorted(r2["computed"]) == sorted({days[0], days[1]})

    # resumed-out-of-order ≡ from-scratch, byte-identical tier contents
    r_fresh = eng.run_job(df, "ta", tmp_path / "fresh", input_fingerprint="fp1")
    assert r_fresh["computed"] == days
    for tier in ("1m", "1h", "1d"):
        a = spark.read.parquet(str(tmp_path / "out" / f"tier_{tier}"))
        b = spark.read.parquet(str(tmp_path / "fresh" / f"tier_{tier}"))
        cols = sorted(a.columns)
        ca = sorted(tuple(str(x) for x in r) for r in a.select(*cols).collect())
        cb = sorted(tuple(str(x) for x in r) for r in b.select(*cols).collect())
        assert ca == cb, tier


def test_run_job_resume_with_interleaved_backfill_writer(tmp_path, spark):
    """Round-3 verdict item 8 — the one lifecycle shape not yet
    kill-tested: a SECOND writer backfills days into the same out_dir
    between one writer's partial run and its resume, so adjacent-day
    reflags cross BOTH writers' resume boundaries and both append to the
    same manifest. Final tiers must be byte-identical to a from-scratch
    run over the merged input."""
    df = _signals(spark)
    dcol = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    days = sorted(r.d for r in df.select(dcol.alias("d")).distinct().collect())
    assert len(days) >= 4

    # writer 1 dies after the first two days
    w1 = _engine(spark)
    r1 = w1.run_job(df.filter(dcol.isin(days[:2])), "ta", tmp_path / "out", input_fingerprint="fp1")
    assert r1["computed"] == days[:2]

    # a backfill writer lands day 3 before writer 1 resumes: its reflag
    # (day 2, done by writer 1) crosses writer 1's resume boundary
    w2 = _engine(spark)
    r2 = w2.run_job(df.filter(dcol.isin(days[:3])), "ta", tmp_path / "out", input_fingerprint="fp1")
    assert r2["recomputed_context"] == [days[1]]
    assert sorted(r2["computed"]) == sorted({days[1], days[2]})

    # writer 1 resumes with the full input: only the tail is left, and
    # its reflag (day 3, done by the OTHER writer) crosses writer 2's
    # boundary — manifest entries from both writers interleave
    r3 = w1.run_job(df, "ta", tmp_path / "out", input_fingerprint="fp1")
    assert days[2] in r3["recomputed_context"]
    assert set(r3["computed"]) == set(days[3:]) | {days[2]}
    assert r3["skipped"] == days[:2]

    # merged interleaved history ≡ from-scratch, byte-identical tiers
    r_fresh = _engine(spark).run_job(df, "ta", tmp_path / "fresh", input_fingerprint="fp1")
    assert r_fresh["computed"] == days
    for tier in ("1m", "1h", "1d"):
        a = spark.read.parquet(str(tmp_path / "out" / f"tier_{tier}"))
        b = spark.read.parquet(str(tmp_path / "fresh" / f"tier_{tier}"))
        cols = sorted(a.columns)
        ca = sorted(tuple(str(x) for x in r) for r in a.select(*cols).collect())
        cb = sorted(tuple(str(x) for x in r) for r in b.select(*cols).collect())
        assert ca == cb, tier

    # every day recorded exactly once in the shared manifest, with lineage
    from rove_spark.plans.checkpoint import CheckpointManifest

    recs = CheckpointManifest(tmp_path / "out" / "_checkpoint.json").records()
    assert set(recs) == set(days)


def test_run_job_param_change_invalidates(tmp_path, spark):
    df = _signals(spark)
    eng1 = _engine(spark)
    r1 = eng1.run_job(df, "ta", tmp_path / "out", input_fingerprint="fp1")
    assert r1["computed"] != []
    # different threshold → different params hash → full recompute
    eng2 = _engine(spark, toml=PIPE.replace("max = 500.0", "max = 400.0"))
    r2 = eng2.run_job(df, "ta", tmp_path / "out", input_fingerprint="fp1")
    assert r2["computed"] == r1["computed"]
    assert r2["skipped"] == []


def test_day_enumeration_from_partition_listing(tmp_path, spark):
    """Day-partitioned input: run_job enumerates days from the directory
    listing (metadata-only) and produces the same tiers as the scan path."""
    from rove_spark.plans.engine import list_day_partitions

    eng = _engine(spark)
    df = _signals(spark)
    dcol = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    inp = str(tmp_path / "inp")
    df.withColumn("day", dcol).write.partitionBy("day").parquet(inp)
    days = sorted(r.d for r in df.select(dcol.alias("d")).distinct().collect())
    assert sorted(list_day_partitions(inp)) == days
    assert list_day_partitions(str(tmp_path / "nope")) is None
    assert list_day_partitions(str(tmp_path)) is None  # no day=* dirs

    back = spark.read.parquet(inp).drop("day")
    r1 = eng.run_job(back, "ta", tmp_path / "listed", input_fingerprint="fp1", input_path=inp)
    assert r1["all"] == days
    r2 = eng.run_job(df, "ta", tmp_path / "scanned", input_fingerprint="fp1")
    for tier in ("1m", "1h", "1d"):
        a = spark.read.parquet(str(tmp_path / "listed" / f"tier_{tier}"))
        b = spark.read.parquet(str(tmp_path / "scanned" / f"tier_{tier}"))
        cols = sorted(a.columns)
        ca = sorted(tuple(str(x) for x in r) for r in a.select(*cols).collect())
        cb = sorted(tuple(str(x) for x in r) for r in b.select(*cols).collect())
        assert ca == cb, tier


def test_homebrew_custom_check(spark, tmp_path):
    """The Check protocol (SURVEY §2.7: researcher-written checks, which
    rove left a closed enum): a custom check registers on the Engine,
    validates in TOML pipelines, dispatches with the step's params, and
    can be a vectorized pandas-UDF stage."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import functions as F

    from rove_spark.config import Pipeline, PipelineStep
    from rove_spark.model import Flag
    from rove_spark.plans.engine import Engine

    def parity_check(df, value_col, series_col, order_cols, out_col, modulus=2):
        # plain column-expression homebrew check
        return df.withColumn(
            out_col,
            F.when(F.col(value_col) % modulus == 0, int(Flag.PASS))
            .otherwise(int(Flag.FAIL))
            .cast("tinyint"),
        )

    def zmad_check(df, value_col, series_col, order_cols, out_col, limit=3.0):
        # pandas-UDF homebrew check through the same grouped machinery
        from rove_spark.operators.util import parallel_groups

        schema = f"{series_col} string, {order_cols[0]} timestamp, {out_col} tinyint"

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            v = pdf[value_col]
            med = v.median()
            mad = (v - med).abs().median() or 1.0
            flags = ((v - med).abs() / mad > limit).map(
                {True: int(Flag.FAIL), False: int(Flag.PASS)}
            )
            return pd.DataFrame(
                {series_col: pdf[series_col], order_cols[0]: pdf[order_cols[0]],
                 out_col: flags.astype("int8")}
            )

        flags = (
            parallel_groups(df.select(series_col, order_cols[0], value_col), series_col)
            .groupBy(series_col)
            .applyInPandas(run, schema)
        )
        return df.join(flags, [series_col, order_cols[0]], "left")

    (tmp_path / "hb.toml").write_text(
        """
[[step]]
name = "parity_check"
[step.parity_check]
modulus = 2

[[step]]
name = "zmad_check"
[step.zmad_check]
limit = 2.5
"""
    )
    rows = [
        ("c1", dt.datetime(2024, 1, 1, 0, i), float(i * 2)) for i in range(8)
    ] + [("c1", dt.datetime(2024, 1, 1, 0, 8), 999.0)]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, v double")
    eng = Engine(
        spark,
        pipeline_dir=tmp_path,
        custom_checks={"parity_check": parity_check, "zmad_check": zmad_check},
    )
    out = eng.run_pipeline(df, "hb", value_col="v").collect()
    by_ts = {r.ts.minute: r for r in out}
    assert by_ts[8].flag_parity_check == 1  # 999 odd
    assert by_ts[2].flag_parity_check == 0
    assert by_ts[8].flag_zmad_check == 1  # 999 is the MAD outlier
    assert all(by_ts[i].flag_zmad_check == 0 for i in range(8))

    # unregistered homebrew types still fail at load (InvalidTestName parity)
    import pytest

    from rove_spark.config import parse_pipeline

    with pytest.raises(ValueError, match="unknown check type"):
        parse_pipeline("x", '[[step]]\nname = "nope_check"\n[step.nope_check]\n')
