#!/usr/bin/env python3
"""Production-posture streaming state probe: run the windowed 1m tier in
APPEND mode (watermark eviction active) over a TIME-ORDERED multi-file
copy of the events table, several files per micro-batch, and report the
peak state-store rows vs the total window count.

The complete-mode harness used by the stream≡batch driver proofs retains
every window by definition (that's what makes the final-minute windows
comparable to batch); this probe measures the posture a deployment
actually runs: windows close as the watermark passes, so state stays
O(series × open-window span), not O(all windows). BENCH.md records the
result.

Usage: python scripts/stream_state_probe.py [sf_dir] [n_files] [files_per_trigger]
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 24
PER_TRIGGER = int(sys.argv[3]) if len(sys.argv) > 3 else 2


def main() -> None:
    from pyspark.sql import functions as F

    from rove_spark.session import get_spark
    from rove_spark.streaming.rollup_stream import stream_rollup

    spark = get_spark("stream_state_probe")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    ev = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    total_windows = ev.select(
        "user_id", F.date_trunc("minute", "ts").alias("w")
    ).distinct().count()
    n_series = ev.select("user_id").distinct().count()

    # time-ordered multi-file layout: rangePartition by ts so file k holds
    # time slice k; FileStreamSource lists part files in order, so each
    # micro-batch advances event time and the watermark can evict
    src_dir = tempfile.mkdtemp(prefix="rove_state_probe_")
    ev.repartitionByRange(N_FILES, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(src_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", PER_TRIGGER)
        .parquet(src_dir)
    )
    tier = stream_rollup(
        stream,
        series_col="user_id",
        role_col=None,
        watermark="10 minutes",
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        ],
    )
    q = (
        tier.writeStream.format("noop")
        .outputMode("append")  # finalized windows only — eviction active
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    peaks = []
    emitted = 0
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        peaks.append(sum(int(op.get("numRowsTotal", 0)) for op in ops))
        emitted += sum(int(op.get("numRowsRemoved", 0)) for op in ops)
    q.stop()
    print(
        json.dumps(
            {
                "n_batches": len(peaks),
                "n_series": n_series,
                "total_windows": total_windows,
                "peak_state_rows": max(peaks) if peaks else None,
                "state_rows_per_batch": peaks,
                "windows_evicted": emitted,
                "bounded": bool(peaks) and max(peaks) < total_windows / 2,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
