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
import os
import sys
import tempfile
import time
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
    # recentProgress is capped (default 100 updates): a >100-batch run would
    # silently truncate the peak scan, so raise the cap well past any
    # realistic batch count and verify coverage against lastProgress below
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")

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
    # FileStreamSource orders by modification time, and a parallel write
    # leaves near-identical mtimes (tie order unspecified) — stamp strictly
    # increasing mtimes in range-partition order (part-NNNNN index IS the
    # time-slice order under repartitionByRange) so batches provably
    # advance event time instead of racing the watermark
    parts = sorted(Path(src_dir).glob("part-*.parquet"))
    base = time.time() - len(parts) - 60
    for k, f in enumerate(parts):
        os.utime(f, (base + k, base + k))

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
    completed = q.awaitTermination(600)
    progress = list(q.recentProgress)
    last = q.lastProgress
    q.stop()
    peaks = []
    emitted = 0
    dropped_late = 0
    for p in progress:
        ops = p.get("stateOperators") or []
        peaks.append(sum(int(op.get("numRowsTotal", 0)) for op in ops))
        emitted += sum(int(op.get("numRowsRemoved", 0)) for op in ops)
        dropped_late += sum(
            int(op.get("numRowsDroppedByWatermark", 0)) for op in ops
        )
    # validity gates: (a) the run finished, (b) the progress buffer covers
    # every batch (batchId is 0-based), (c) the accounting closes — emitted
    # (evicted-on-finalize) + still-in-state == total distinct windows with
    # zero late-dropped rows. Any gap means the "bound" is an artifact.
    n_total_batches = (int(last["batchId"]) + 1) if last else None
    progress_complete = (
        n_total_batches is not None and len(progress) >= n_total_batches
    )
    final_state = peaks[-1] if peaks else 0
    reconciled = (
        dropped_late == 0 and emitted + final_state == total_windows
    )
    valid = bool(completed and progress_complete and reconciled)
    print(
        json.dumps(
            {
                "n_batches": len(peaks),
                "n_series": n_series,
                "total_windows": total_windows,
                "peak_state_rows": max(peaks) if peaks else None,
                "state_rows_per_batch": peaks,
                "windows_evicted": emitted,
                "final_state_rows": final_state,
                "rows_dropped_late": dropped_late,
                "completed": bool(completed),
                "progress_complete": progress_complete,
                "reconciled": reconciled,
                "bounded": valid
                and bool(peaks)
                and max(peaks) < total_windows / 2,
            }
        )
    )
    if not valid:
        print(
            "WARNING: probe run invalid (timeout, truncated progress, or "
            "unreconciled window accounting) — do not cite these numbers",
            file=sys.stderr,
        )
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
