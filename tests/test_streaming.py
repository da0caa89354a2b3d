"""Structured Streaming: file-source micro-batches with availableNow —
windowed rollup matches the batch tier for finalized windows; stateful
step_check carries state across restarts (cross-batch lag continuity)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from rove_spark.model import Flag
from rove_spark.operators.rollup import rollup_from_raw
from rove_spark.sources.synthetic import synthetic_transcripts
from rove_spark.streaming.rollup_stream import stream_rollup, stream_step_check

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def _run_stream(sdf, out_dir, ckpt):
    q = (
        sdf.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_rollup_matches_batch(tmp_path, spark):
    src = tmp_path / "src"
    df = synthetic_transcripts(spark, n_conv=20, avg_turns=40)
    df.write.parquet(str(src))

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    rolled = stream_rollup(stream, watermark="5 minutes")
    _run_stream(rolled, tmp_path / "out", tmp_path / "ckpt")

    got = spark.read.parquet(str(tmp_path / "out"))
    batch = rollup_from_raw(df, "1m")
    # every emitted (finalized) window must equal the batch tier row
    keys = ["conv_id", "bucket_ts", "role"]
    joined = got.alias("s").join(batch.alias("b"), on=keys, how="left")
    n = got.count()
    assert n > 0
    mismatches = joined.filter(
        (F.col("s.n_turns") != F.col("b.n_turns"))
        | (F.col("s.text_len_sum") != F.col("b.text_len_sum"))
        | (F.col("s.text_len_min") != F.col("b.text_len_min"))
        | (F.col("s.text_len_max") != F.col("b.text_len_max"))
        | (F.col("s.n_tool_calls") != F.col("b.n_tool_calls"))
        | F.col("b.n_turns").isNull()
    ).count()
    assert mismatches == 0
    # append mode withholds only windows newer than the watermark
    assert n <= batch.count()


def test_stream_step_check_state_across_restarts(tmp_path, spark):
    src = tmp_path / "src"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1)
    rows1 = [("c1", t0 + dt.timedelta(minutes=i), 10.0) for i in range(3)]
    rows2 = [
        ("c1", t0 + dt.timedelta(minutes=3), 100.0),  # big step vs batch-1 tail
        ("c1", t0 + dt.timedelta(minutes=4), 100.5),
    ]
    mk = lambda rows: spark.createDataFrame(rows, "conv_id string, ts timestamp, value double")  # noqa: E731

    def run_batch(rows, out):
        mk(rows).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema("conv_id string, ts timestamp, value double").parquet(
            str(src)
        )
        flagged = stream_step_check(stream, "value", max_=50.0, high=10.0)
        _run_stream(flagged, out, tmp_path / "ckpt")

    run_batch(rows1, tmp_path / "out")
    run_batch(rows2, tmp_path / "out")

    got = {
        r.ts: r.flag_step_check
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert len(got) == 5
    assert got[t0] == Flag.INCONCLUSIVE  # stream head
    assert got[t0 + dt.timedelta(minutes=1)] == Flag.PASS
    assert got[t0 + dt.timedelta(minutes=2)] == Flag.PASS
    # first row of batch 2 compared against last row of batch 1 via state
    assert got[t0 + dt.timedelta(minutes=3)] == Flag.FAIL
    assert got[t0 + dt.timedelta(minutes=4)] == Flag.PASS


@pytest.mark.parametrize("mode", ["append"])
def test_stream_rollup_is_streaming_plan(spark, tmp_path, mode):
    df = synthetic_transcripts(spark, n_conv=2, avg_turns=5)
    src = tmp_path / "s"
    df.write.parquet(str(src))
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    rolled = stream_rollup(stream)
    assert rolled.isStreaming


def test_stream_spike_check_lookahead_across_restarts(tmp_path, spark):
    """Spike needs one row of lookahead: a point is emitted when its
    successor arrives — even when the successor comes in a later
    micro-batch run (state carries prev+cur)."""
    from rove_spark.streaming.rollup_stream import stream_spike_check

    src = tmp_path / "src"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1)
    mk = lambda rows: spark.createDataFrame(rows, "conv_id string, ts timestamp, value double")  # noqa: E731

    def run(rows):
        mk(rows).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema("conv_id string, ts timestamp, value double").parquet(str(src))
        flagged = stream_spike_check(stream, "value", max_=50.0, high=10.0)
        q = (
            flagged.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run([("c1", t0 + dt.timedelta(minutes=i), 10.0) for i in range(3)])  # batch 1
    # batch 2: big spike at minute 3, successor at minute 4 in batch 3
    run([("c1", t0 + dt.timedelta(minutes=3), 100.0)])
    run([("c1", t0 + dt.timedelta(minutes=4), 10.5)])

    got = {r.ts: r.flag_spike_check for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    # minutes 0..3 emitted (4 stays pending until a successor arrives)
    assert set(got) == {t0 + dt.timedelta(minutes=i) for i in range(4)}
    assert got[t0] == Flag.INCONCLUSIVE  # stream head: no predecessor
    assert got[t0 + dt.timedelta(minutes=1)] == Flag.PASS
    assert got[t0 + dt.timedelta(minutes=2)] == Flag.PASS
    assert got[t0 + dt.timedelta(minutes=3)] == Flag.FAIL  # deviates from both


def test_stream_flatline_check(tmp_path, spark):
    from rove_spark.streaming.rollup_stream import stream_flatline_check

    src = tmp_path / "src"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1)
    mk = lambda rows: spark.createDataFrame(rows, "conv_id string, ts timestamp, value double")  # noqa: E731

    def run(rows):
        mk(rows).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema("conv_id string, ts timestamp, value double").parquet(str(src))
        flagged = stream_flatline_check(stream, "value", max_=3)
        q = (
            flagged.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run of 5s split across two batches: the FAIL threshold (run ≥ 4)
    # is crossed by a row in the SECOND batch via carried state
    run([("c1", t0 + dt.timedelta(minutes=i), 5.0) for i in range(3)])
    run([("c1", t0 + dt.timedelta(minutes=3), 5.0), ("c1", t0 + dt.timedelta(minutes=4), 7.0)])

    got = {r.ts: r.flag_flatline_check for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got[t0] == Flag.INCONCLUSIVE
    assert got[t0 + dt.timedelta(minutes=2)] == Flag.INCONCLUSIVE  # rn <= max
    assert got[t0 + dt.timedelta(minutes=3)] == Flag.FAIL  # 4th equal value
    assert got[t0 + dt.timedelta(minutes=4)] == Flag.PASS  # run broken
