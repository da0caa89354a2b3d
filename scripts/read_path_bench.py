#!/usr/bin/env python3
"""Read-path cost probe: a FIXED range aggregate against a growing store.

DESIGN.md §5b claims the tier-routed read path is O(answer), not
O(data): ``route_range`` answers interior days from the 1d tier, day
edges from 1h/1m, and touches raw only for sub-minute slivers. This
script MEASURES that claim — the identical ragged ~4.1-day range
aggregate against a 1x store and a 10x store (contiguous time
extension: the extra data is LATER activity of the same series, the
superlinearity_bench protocol), fresh JVM per measured scale:

- routed:  ``range_aggregate(raw, tiers, start, end)``  — should be flat
- direct:  ``range_aggregate(raw, {}, start, end)``     — the SAME code
           forced down the raw-only path (whole range becomes one raw
           "sliver"), i.e. what every query would cost without tiers
- full:    whole-store raw aggregate                    — control: shows
           the store really grew 10x

Rows-read per layer are reported deterministically (counts over the
exact pruned scans the read issues); wall time is the secondary metric
(this sandbox host carries co-tenant load, so each timed op runs twice
and both samples are reported). The probe also asserts routed ≡ direct
row-for-row at both scales (``exceptAll`` both ways) — the in-script
twin of the ``tier_route`` driver oracle.

Prints ONE JSON line. Does NOT rewrite BENCH.md (hand-copy the table
into the round narrative; see the scaling_bench auto-rewrite lesson).

Reproduce: ``python scripts/read_path_bench.py``
(env: ROVE_READPATH_N_CONV, ROVE_READPATH_AVG_TURNS, ROVE_READPATH_SCALES).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Fingerprint written into the store's _built sentinel: a cached /tmp store
# built under different builder params or an older store format is rebuilt
# instead of silently measured. Bump the trailing version on any
# build_tiers/synthetic_transcripts semantics change.
STORE_VERSION = "readpath-store-v1:hot_frac=0,ts-range48,tier-range-bucket_ts"

# Copy-0 span: 7-day conversation-start stagger + max (1.5*avg_turns)
# minutes of turns. 9 days clears it for avg_turns <= 1400.
SHIFT_DAYS = 9

CHILD = r"""
import json, os, sys, time
from datetime import datetime
from pathlib import Path
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from rove_spark.session import get_spark
from rove_spark.operators.rollup import build_tiers, range_aggregate, route_range
from rove_spark.sources.synthetic import synthetic_transcripts

STORE_VERSION = {store_version!r}
phase = sys.argv[1]            # "build" | "measure"
scale = int(sys.argv[2])
store = Path(sys.argv[3])
n_conv = int(sys.argv[4]); avg_turns = int(sys.argv[5])
SHIFT_DAYS = int(sys.argv[6])

spark = get_spark(f"readpath_{{phase}}_{{scale}}", master="local[32]",
                  shuffle_partitions=64)

if phase == "build":
    # sentinel carries the builder fingerprint: a cached store built by an
    # older build_tiers/synthetic_transcripts is rebuilt, not silently
    # measured (bump STORE_VERSION on any builder-semantics change)
    sentinel = store / "_built"
    if sentinel.exists() and sentinel.read_text().strip() == STORE_VERSION:
        print(json.dumps({{"scale": scale, "built": "cached"}})); spark.stop(); sys.exit(0)
    # hot_frac=0: partition skew is salt.py's subject, not the read path's,
    # and hot conversations would stretch copy-0's span past the shift.
    one = synthetic_transcripts(spark, n_conv=n_conv, avg_turns=avg_turns,
                                hot_frac=0.0, n_partitions=64)
    raw = None
    for k in range(scale):
        c = one.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {{k * SHIFT_DAYS}} DAYS"))
        raw = c if raw is None else raw.unionByName(c)
    # ts-clustered files so file-level min/max stats prune the range scans
    raw.repartitionByRange(48 * scale, "ts").write.mode("overwrite").parquet(str(store / "raw"))
    rawdf = spark.read.parquet(str(store / "raw"))
    tiers = build_tiers(rawdf)   # checks=(), text_len_source="text" — the
                                 # same defaults range_aggregate's rollup_fn uses
    for lv, t in tiers.items():
        t.repartitionByRange(max(4, 2 * scale), "bucket_ts").write.mode(
            "overwrite").parquet(str(store / f"tier_{{lv}}"))
    sentinel.write_text(STORE_VERSION)
    print(json.dumps({{"scale": scale, "built": "fresh"}})); spark.stop(); sys.exit(0)

raw = spark.read.parquet(str(store / "raw"))
tiers = {{lv: spark.read.parquet(str(store / f"tier_{{lv}}")) for lv in ("1d", "1h", "1m")}}
start = datetime(2024, 1, 2, 0, 3, 30)
end = datetime(2024, 1, 6, 2, 7, 15)

spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

# --- deterministic rows-read evidence (counts over the exact pruned scans)
rows = {{"tier_rows": 0, "raw_sliver_rows": 0}}
raw_ts = dict(raw.dtypes)["ts"]
for lv, s, e in route_range(start, end):
    if lv == "raw":
        rows["raw_sliver_rows"] += raw.filter(
            (F.col("ts") >= F.lit(s).cast(raw_ts)) & (F.col("ts") < F.lit(e).cast(raw_ts))).count()
    else:
        bt = dict(tiers[lv].dtypes)["bucket_ts"]
        rows["tier_rows"] += tiers[lv].filter(
            (F.col("bucket_ts") >= F.lit(s).cast(bt)) & (F.col("bucket_ts") < F.lit(e).cast(bt))).count()
rows["direct_range_rows"] = raw.filter(
    (F.col("ts") >= F.lit(start).cast(raw_ts)) & (F.col("ts") < F.lit(end).cast(raw_ts))).count()
rows["full_store_rows"] = raw.count()

# --- timed ops: 2 samples each (co-tenant host), noop sink; reps are
# INTERLEAVED across the three ops (routed, direct, full, repeat) so each
# op's samples span the same load windows — the repo's standard protocol
def run_op(mk):
    t0 = time.time()
    mk().write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)

ops = {{
    "routed": lambda: range_aggregate(raw, tiers, start, end),
    "direct": lambda: range_aggregate(raw, {{}}, start, end),
    "full": lambda: raw.groupBy("conv_id").agg(
        F.count("*").alias("n"), F.sum(F.length("text")).alias("tl")),
}}
t = {{name: [] for name in ops}}
for _ in range(2):
    for name, mk in ops.items():
        t[name].append(run_op(mk))
t_routed, t_direct, t_full = t["routed"], t["direct"], t["full"]

# --- routed ≡ direct, row-for-row (the in-script tier_route twin)
routed = range_aggregate(raw, tiers, start, end).localCheckpoint()
direct = range_aggregate(raw, {{}}, start, end).localCheckpoint()
diff = routed.exceptAll(direct).count() + direct.exceptAll(routed).count()
assert diff == 0, f"routed != direct: {{diff}} differing rows"

print(json.dumps({{"scale": scale, **rows, "routed_rows_out": routed.count(),
                   "t_routed": t_routed, "t_direct": t_direct, "t_full": t_full}}))
spark.stop()
"""


def run_child(phase: str, scale: int, store: Path, n_conv: int, avg_turns: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c",
         CHILD.format(repo=str(REPO), store_version=STORE_VERSION), phase, str(scale),
         str(store), str(n_conv), str(avg_turns), str(SHIFT_DAYS)],
        capture_output=True, text=True, timeout=1800, cwd=str(REPO),
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-3000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_conv = int(os.environ.get("ROVE_READPATH_N_CONV", "4000"))
    avg_turns = int(os.environ.get("ROVE_READPATH_AVG_TURNS", "600"))
    scales = [int(s) for s in os.environ.get("ROVE_READPATH_SCALES", "1,10").split(",")]
    results = []
    for s in scales:
        store = Path(f"/tmp/rove_readpath_{n_conv}_{avg_turns}_x{s}")
        store.mkdir(parents=True, exist_ok=True)
        run_child("build", s, store, n_conv, avg_turns)
        results.append(run_child("measure", s, store, n_conv, avg_turns))
    summary = {"n_conv": n_conv, "avg_turns": avg_turns,
               "range": "2024-01-02T00:03:30 .. 2024-01-06T02:07:15", "scales": results}
    if len(results) == 2:
        a, b = results
        summary["store_growth"] = round(b["full_store_rows"] / a["full_store_rows"], 2)
        summary["routed_time_ratio"] = round(min(b["t_routed"]) / min(a["t_routed"]), 2)
        summary["full_time_ratio"] = round(min(b["t_full"]) / min(a["t_full"]), 2)
        summary["rows_read_ratio_routed_vs_direct"] = round(
            b["direct_range_rows"] / max(1, b["tier_rows"] + b["raw_sliver_rows"]), 1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
