"""Cold-tier compaction (round-5 verdict item 1): expiring raw day
partitions are Gorilla-compressed into the SURVEY §1.4 chunk table before
the partition drop, read-through decode reproduces the pre-expiry raw
slice exactly, and a kill crossing the compaction boundary resumes without
re-encoding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rove_spark.operators.rollup import read_cold, retention_compact
from rove_spark.operators.signals import derive_signals
from rove_spark.plans.checkpoint import CheckpointManifest
from rove_spark.sources.synthetic import synthetic_transcripts
from rove_spark.sources.tables import PartitionedTable

def _raw_table(spark, path, n_conv=15, avg_turns=60) -> tuple[PartitionedTable, list[str]]:
    df = derive_signals(synthetic_transcripts(spark, n_conv=n_conv, avg_turns=avg_turns))
    raw = df.select("conv_id", "ts", "text_len").withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    table = PartitionedTable(path, ["day"])
    table.overwrite_partitions(raw, lineage={"test": "retention_compact"})
    return table, table.partition_days()


def _slice_rows(spark, table, days):
    """(conv_id, ts-seconds, value) triples for the given days — the exact
    comparison domain of the codec (epoch-second timestamps, f32 values)."""
    return sorted(
        (r.conv_id, r.ts, float(r.text_len))
        for r in table.read(spark)
        .filter(F.col("day").isin(list(days)))
        .select(
            "conv_id", F.date_trunc("second", "ts").cast("timestamp").alias("ts"), "text_len"
        )
        .collect()
    )


def test_compact_decode_equals_raw(tmp_path, spark):
    raw, days = _raw_table(spark, tmp_path / "raw")
    assert len(days) >= 3
    cutoff = days[2]  # expire the first two days
    expired_rows = _slice_rows(spark, raw, days[:2])

    chunks = PartitionedTable(tmp_path / "cold", ["day"])
    res = retention_compact(
        spark, raw, chunks, cutoff, value_col="text_len", series_col="conv_id"
    )
    assert res["expiring"] == days[:2]
    assert res["compacted"] == days[:2]
    assert res["dropped"] == 2

    # mandated chunk schema (SURVEY §1.4) present on disk
    cdf = chunks.read(spark)
    for col in ("series_id", "chunk_start", "ts_codec", "val_codec", "n_points", "checksum"):
        assert col in cdf.columns, col
    assert set(chunks.partition_days()) == set(days[:2])

    # raw: expired partitions gone, surviving intact
    assert raw.partition_days() == days[2:]

    # read-through decode ≡ the pre-expiry raw slice, value-exact
    decoded = sorted(
        (r.series_id, r.ts, float(r.value))
        for r in read_cold(spark, chunks).filter(~F.col("is_gap")).collect()
    )
    assert decoded == expired_rows


def test_compact_chunk_files_bounded(tmp_path, spark):
    """The chunk write is re-clustered day-aligned: without it the encode
    stage's mixed-day partitions emit one tiny file per (task, day) —
    measured 1,192 files for 30 day-partitions at sf0.01, the small-files
    pathology a cold tier exists to avoid. files_per_day bounds the count
    exactly: <= days * files_per_day data files on disk."""
    raw, days = _raw_table(spark, tmp_path / "raw")
    cutoff = days[-1]  # expire all but the last day
    n_expired = len(days) - 1

    chunks = PartitionedTable(tmp_path / "cold", ["day"])
    retention_compact(
        spark, raw, chunks, cutoff, value_col="text_len", series_col="conv_id"
    )
    files = list((tmp_path / "cold").rglob("*.parquet"))
    assert 0 < len(files) <= n_expired

    raw2, days2 = _raw_table(spark, tmp_path / "raw2")
    chunks2 = PartitionedTable(tmp_path / "cold2", ["day"])
    retention_compact(
        spark, raw2, chunks2, days2[-1], value_col="text_len",
        series_col="conv_id", files_per_day=4,
    )
    files2 = list((tmp_path / "cold2").rglob("*.parquet"))
    assert 0 < len(files2) <= (len(days2) - 1) * 4

    with pytest.raises(ValueError, match="files_per_day"):
        retention_compact(
            spark, raw2, chunks2, days2[-1], value_col="text_len",
            series_col="conv_id", files_per_day=0,
        )


def test_compact_kill_between_write_and_drop_resumes(tmp_path, spark):
    """Kill AFTER the chunk write + manifest mark but BEFORE the raw drop:
    the rerun must re-drop without re-encoding (resumed_skip), and the
    final state must equal a clean single run."""
    raw, days = _raw_table(spark, tmp_path / "raw")
    cutoff = days[2]
    expired_rows = _slice_rows(spark, raw, days[:2])
    chunks = PartitionedTable(tmp_path / "cold", ["day"])
    manifest = CheckpointManifest(tmp_path / "ckpt.json")

    class Boom(RuntimeError):
        pass

    orig = PartitionedTable.expire_days_before
    def killed(self, *a, **kw):
        raise Boom("killed before raw drop")

    PartitionedTable.expire_days_before = killed
    try:
        with pytest.raises(Boom):
            retention_compact(
                spark, raw, chunks, cutoff, value_col="text_len",
                series_col="conv_id", manifest=manifest, fingerprint="fp1",
            )
    finally:
        PartitionedTable.expire_days_before = orig

    # chunks committed, manifest marked, raw NOT yet dropped
    assert set(chunks.partition_days()) == set(days[:2])
    assert {f"compact:{d}" for d in days[:2]} <= manifest.done_partitions("fp1")
    assert raw.partition_days() == days

    res = retention_compact(
        spark, raw, chunks, cutoff, value_col="text_len",
        series_col="conv_id", manifest=manifest, fingerprint="fp1",
    )
    assert res["resumed_skip"] == days[:2]  # no re-encode
    assert res["compacted"] == []
    assert res["dropped"] == 2
    assert raw.partition_days() == days[2:]

    decoded = sorted(
        (r.series_id, r.ts, float(r.value))
        for r in read_cold(spark, chunks).filter(~F.col("is_gap")).collect()
    )
    assert decoded == expired_rows


def test_run_job_raw_retention_compacts_and_resumes(tmp_path, spark):
    """Engine-level lifecycle: run_job with retention={'raw': cutoff}
    compacts expiring input partitions into out/chunks_raw (recorded in
    the job's own checkpoint manifest), drops them, and a second run is a
    pure resume — tiers skipped, compaction skipped, nothing re-encoded."""
    from tests.test_engine import _engine

    raw, days = _raw_table(spark, tmp_path / "raw", n_conv=10, avg_turns=40)
    cutoff = days[1]  # expire just the first day
    expired_rows = _slice_rows(spark, raw, days[:1])

    eng = _engine(spark)
    df = raw.read(spark).drop("day")
    r1 = eng.run_job(
        df, "ta", tmp_path / "out", value_col="text_len",
        input_fingerprint="fp1", input_path=tmp_path / "raw",
        retention={"raw": cutoff},
    )
    assert r1["expired"]["raw"]["compacted"] == days[:1]
    assert r1["expired"]["raw"]["dropped"] == 1
    assert raw.partition_days() == days[1:]

    chunks = PartitionedTable(tmp_path / "out" / "chunks_raw", ["day"])
    decoded = sorted(
        (r.series_id, r.ts, float(r.value))
        for r in read_cold(spark, chunks).filter(~F.col("is_gap")).collect()
    )
    assert decoded == expired_rows

    # resume: tiers all done, compaction already done — nothing recomputed
    df2 = raw.read(spark).drop("day")
    r2 = eng.run_job(
        df2, "ta", tmp_path / "out", value_col="text_len",
        input_fingerprint="fp1", input_path=tmp_path / "raw",
        retention={"raw": cutoff},
    )
    assert r2["computed"] == []
    assert r2["expired"]["raw"]["compacted"] == []
    assert r2["expired"]["raw"]["expiring"] == []  # already dropped from raw


def test_compact_missing_value_col_raises(tmp_path, spark):
    raw, days = _raw_table(spark, tmp_path / "raw", n_conv=5, avg_turns=20)
    chunks = PartitionedTable(tmp_path / "cold", ["day"])
    with pytest.raises(ValueError, match="value column"):
        retention_compact(
            spark, raw, chunks, days[-1], value_col="nope", series_col="conv_id"
        )
