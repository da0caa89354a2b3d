#!/usr/bin/env python3
"""Executor-scaling evidence: N vs 4N *executors*, emulated faithfully.

Thread-scaling inside one JVM (scaling_bench.py) conflates executor count
with shared-heap/GC/allocator contention — a real cluster adds *executors*:
separate JVMs, heaps, GC threads, Python worker pools, shuffle dirs, each
owning a disjoint partition range. This bench emulates exactly that:

- the input table is hash-sharded on the series key into 4 disjoint parquet
  shards (the rollup pipeline is series-parallel: every group key contains
  conv_id, so shard runs are independent and their union equals the global
  result — verified in tests);
- N executors  = 1 JVM (local[8], 8g heap) processing ALL shards;
- 4N executors = 4 concurrent JVMs (local[8], 8g heap each), one shard
  each; wall time = the slowest of the four (real cluster semantics).

Efficiency = wall_1jvm / (4 × wall_4jvm). Interleaved repeats, best-of.
Appends the result to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from rove_spark.session import get_spark
from rove_spark.operators import checks
from rove_spark.operators.rollup import build_tiers

path = sys.argv[1]; tag = sys.argv[2]
spark = get_spark(f"exec_{{tag}}", master="local[8]", shuffle_partitions=16,
                  extra_conf={{"spark.driver.memory": "8g"}})
spark.range(1_000_000).selectExpr("sum(id)").collect()
df = spark.read.parquet(path)
df = df.select("conv_id", "ts", "role", "tool", F.length("text").cast("float").alias("text_len"))
n = df.count()
t0 = time.time()
f1 = checks.step_check(df, "text_len", max_=500.0)
f1 = checks.spike_check(f1, "text_len", max_=400.0)
f1 = checks.range_check(f1, "text_len", min_=0.0, max_=5000.0)
tiers = build_tiers(f1, checks=["step_check", "spike_check", "range_check"], text_len_source="text_len")
u = None
for name, t in tiers.items():
    tt = t.withColumn("tier", F.lit(name))
    u = tt if u is None else u.unionByName(tt)
u.write.format("noop").mode("overwrite").save()
print(json.dumps({{"n": n, "elapsed": round(time.time() - t0, 3)}}))
spark.stop()
"""


def _spawn(path: str, tag: str) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-c", CHILD.format(repo=str(REPO)), path, tag],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=str(REPO),
    )


def _result(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate(timeout=1200)
    line = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def ensure_shards(src: str, shard_dir: Path, n_shards: int = 4) -> None:
    if shard_dir.exists() and any(shard_dir.glob("shard=*/*.parquet")):
        return
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from rove_spark.session import get_spark

    spark = get_spark("shard", master="local[32]")
    df = spark.read.parquet(src)
    df.withColumn("shard", F.pmod(F.xxhash64("conv_id"), F.lit(n_shards))).write.mode(
        "overwrite"
    ).partitionBy("shard").parquet(str(shard_dir))
    spark.stop()


def main() -> None:
    n_conv = int(os.environ.get("ROVE_SCALING_N_CONV", "16000"))
    avg_turns = int(os.environ.get("ROVE_SCALING_AVG_TURNS", "800"))
    repeats = int(os.environ.get("ROVE_SCALING_REPEATS", "3"))
    src = f"/tmp/rove_scaling_input_{n_conv}_{avg_turns}"
    shard_dir = Path(f"{src}_shards")
    if not Path(src).exists():
        raise SystemExit(f"pre-generate the input first (scaling_bench.py): {src}")
    ensure_shards(src, shard_dir)

    one_jvm: list[dict] = []
    four_jvm: list[dict] = []
    for _ in range(repeats):
        # N executors: one JVM, full input
        t0 = time.time()
        r = _result(_spawn(str(shard_dir), "single"))
        one_jvm.append({"n": r["n"], "wall": r["elapsed"], "tps": round(r["n"] / r["elapsed"], 1)})
        # 4N executors: 4 concurrent JVMs, one shard each
        t0 = time.time()
        procs = [_spawn(str(shard_dir / f"shard={i}"), f"s{i}") for i in range(4)]
        rs = [_result(p) for p in procs]
        wall = max(r["elapsed"] for r in rs)
        n_total = sum(r["n"] for r in rs)
        four_jvm.append({"n": n_total, "wall": wall, "tps": round(n_total / wall, 1)})

    best1 = max(one_jvm, key=lambda r: r["tps"])
    best4 = max(four_jvm, key=lambda r: r["tps"])
    eff = best4["tps"] / (4 * best1["tps"])
    summary = {
        "mode": "shared-nothing JVMs (executor emulation)",
        "one_executor_local8": best1,
        "four_executors_local8_each": best4,
        "scaling_efficiency": round(eff, 3),
        "criterion": "≥ 0.8",
        "pass": eff >= 0.8,
        "samples": {"one": [r["tps"] for r in one_jvm], "four": [r["tps"] for r in four_jvm]},
    }
    print(json.dumps(summary))

    bench_md = REPO / "BENCH.md"
    text = bench_md.read_text() if bench_md.exists() else "# BENCH\n"
    marker = "## Executor scaling (shared-nothing JVMs)"
    if marker in text:
        text = text.split(marker)[0]
    text += f"""{marker}

The faithful N vs 4N *executor* emulation: executors are separate JVMs
with their own heap/GC/Python pools over disjoint series shards (the
pipeline is series-parallel, so shard union ≡ global run). 1 JVM
(local[8], 8g) over the full {best1['n']:,}-turn table vs 4 concurrent
identical JVMs over 4 hash-disjoint shards:

| cluster size | wall (s) | throughput (turns/s) |
|---|---|---|
| N = 1 executor | {best1['wall']} | {best1['tps']:,} |
| 4N = 4 executors | {best4['wall']} | {best4['tps']:,} |

**Scaling efficiency {summary['scaling_efficiency']}
(criterion ≥ 0.8: {"PASS" if summary['pass'] else "FAIL"}).**
Samples (turns/s): one={summary['samples']['one']},
four={summary['samples']['four']}.

Reproduce: `python scripts/executor_scaling_bench.py`.
"""
    bench_md.write_text(text)


if __name__ == "__main__":
    main()
