#!/usr/bin/env python3
"""Incremental-refresh cost evidence: ingesting a small delta into a
built 1m tier must cost O(delta), not O(table) — the whole point of the
continuous-aggregate path at 10^12 turns.

Protocol (same discipline as bench.py / scaling_bench.py):
- base raw (N convs) and delta raw (N/50 convs, same day range) are
  materialized to parquet UNTIMED — the engine is measured on table
  scans, not on synthetic generation;
- timed: (a) full rebuild of the 1m tier over base+delta raw,
  (b) refresh_tier_increment over the delta alone (aggregate + write),
  (c) read_tier merge-on-read over base table + increments;
- best-of-2 per measurement (co-tenant noise, BENCH.md);
- exactness gate: read_tier output row count == full rebuild row count
  (the value-exact contract is driver-oracled; this guards the bench
  itself from measuring a broken config).

Usage: python scripts/incremental_bench.py [n_conv] [avg_turns]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_CONV = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
AVG_TURNS = int(sys.argv[2]) if len(sys.argv) > 2 else 540
DELTA_FRACTION = 50  # delta = N_CONV / DELTA_FRACTION conversations


def main() -> None:
    from pyspark.sql import functions as F

    from rove_spark.operators.rollup import (
        read_tier,
        refresh_tier_increment,
        rollup_from_raw,
    )
    from rove_spark.session import get_spark
    from rove_spark.sources.synthetic import synthetic_transcripts
    from rove_spark.sources.tables import PartitionedTable

    spark = get_spark("incremental_bench")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    base_src = f"/tmp/rove_incbench_base_{N_CONV}_{AVG_TURNS}"
    delta_src = f"/tmp/rove_incbench_delta_{N_CONV}_{AVG_TURNS}"
    if not os.path.exists(base_src):
        synthetic_transcripts(spark, n_conv=N_CONV, avg_turns=AVG_TURNS).write.mode(
            "overwrite"
        ).parquet(base_src)
    if not os.path.exists(delta_src):
        # a fresh conv-id range (suffix keeps ids disjoint from base)
        d = synthetic_transcripts(
            spark, n_conv=max(1, N_CONV // DELTA_FRACTION), avg_turns=AVG_TURNS
        ).withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("-late")))
        d.write.mode("overwrite").parquet(delta_src)

    base_raw = spark.read.parquet(base_src)
    delta_raw = spark.read.parquet(delta_src)
    n_base = base_raw.count()
    n_delta = delta_raw.count()

    def timed(fn) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    # (a) full rebuild over base+delta (what a non-incremental engine pays)
    combined = base_raw.unionByName(delta_raw)
    t_rebuild = timed(
        lambda: rollup_from_raw(combined, "1m")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # base tier table (untimed — it exists before the late data arrives)
    work = Path(tempfile.mkdtemp(prefix="rove_incbench_"))
    base_table = PartitionedTable(work / "tier_1m", ["day"])
    t1m = rollup_from_raw(base_raw, "1m")
    base_table.overwrite_partitions(
        t1m.withColumn("day", F.date_format(F.date_trunc("day", "bucket_ts"), "yyyy-MM-dd"))
    )

    # (b) the incremental ingest: aggregate the DELTA + partitioned write
    def one_ingest(tag: str) -> float:
        inc = PartitionedTable(work / f"inc_{tag}", ["day", "batch"])
        t0 = time.time()
        refresh_tier_increment(inc, delta_raw, "1m", batch_id=f"b-{tag}")
        return time.time() - t0

    t_ingest = round(min(one_ingest("w"), one_ingest("x")), 3)
    inc_table = PartitionedTable(work / "inc_w", ["day", "batch"])

    # (c) merge-on-read over the whole tier
    t_read = timed(
        lambda: read_tier(spark, base_table, inc_table, "1m")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    n_tier_full = rollup_from_raw(combined, "1m").count()
    n_tier_read = read_tier(spark, base_table, inc_table, "1m").count()
    assert n_tier_read == n_tier_full, (n_tier_read, n_tier_full)

    print(
        json.dumps(
            {
                "n_turns_base": n_base,
                "n_turns_delta": n_delta,
                "delta_fraction": round(n_delta / (n_base + n_delta), 4),
                "rebuild_sec": t_rebuild,
                "ingest_sec": t_ingest,
                "read_tier_sec": t_read,
                "ingest_speedup_vs_rebuild": round(t_rebuild / t_ingest, 2),
                "tier_rows": n_tier_full,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
