"""Superlinearity probe (round-4 verdict item 5): run the most expensive
queries at 1x and 10x sf0.1-shaped inputs and report observed scaling
ratios — the cheapest way to catch a hidden O(n^2) before the design
meets a real 100x.

Scaling axis is TIME/CORPUS GROWTH, matching how 100 TB actually arrives:
- events: 10 copies with timestamps shifted by k*(span+1 day) — a
  CONTIGUOUS time extension (event_ids offset too). Series count and
  per-slice station density stay constant, the number of time slices /
  series length grows 10x. A healthy spatial check or codec should
  scale ~linearly; density growth would instead grow buddy pair-volume
  quadratically BY DESIGN (more neighbors in radius = more work per the
  check's semantics), which would not distinguish algorithmic
  superlinearity. Contiguity matters: a first cut shifted by 400 days
  and the gap-filled grid spine (min..max per series) ballooned to ~56x
  slots of mostly gaps, misreading as a 17x gorilla "superlinearity".
- documents: 10 copies with doc_ids offset and a per-copy text marker
  (distinct texts scale 10x; near-dup cluster structure replicates
  per copy), so LSH bucket COUNT grows 10x at ~constant bucket size.

Protocol: one timing per fresh JVM (subprocess), sizes interleaved
best-of-N (CLAUDE.md: co-tenant noise makes single samples +-50%).
Writes the table to stdout; paste/refresh into BENCH.md.

Usage: python scripts/superlinearity_bench.py [--reps 2] [--queries a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASE = Path("/tmp/rove_superlin")
COPIES = 10
QUERIES = [
    "dedup_clusters",
    "buddy_check",
    "sct",
    "simhash_neardup",
    "gorilla_roundtrip",
    # round 6: the full cold-tier lifecycle (raw write → compact → drop →
    # decode) — now the suite's most expensive query; ~10× compacted days
    # at 10× input on the contiguous axis
    "retention_compact",
]
# stateful streams (round-5 verdict item 5): timed like the rest, plus the
# peak state-store row count from lastProgress — state must track
# O(series)/O(open windows), never O(rows)
STREAM_QUERIES = [
    "rollup_1m_stream",
    "step_check_stream",
    "spike_check_stream",
    "flatline_check_stream",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from rove_spark.session import get_spark
import rove_spark.plans.driver_queries as dq

qname, sf_dir = sys.argv[1], sys.argv[2]
spark = get_spark("superlin")
q = dq.queries()[qname]
t0 = time.time()
n = q(spark, sf_dir).count()
out = {"q": qname, "sf_dir": sf_dir, "sec": round(time.time() - t0, 3), "rows": n}
if dq.LAST_STREAM_STATE_ROWS is not None:
    out["state_rows"] = dq.LAST_STREAM_STATE_ROWS
print(json.dumps(out))
spark.stop()
"""


def generate(copies: int, out_dir: Path) -> None:
    """Write scaled events/documents; symlink the untouched tables."""
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from rove_spark.session import get_spark

    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("superlin_gen")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_ev = ev.count()
    n_docs = docs.count()
    # contiguous extension: shift each copy by the base span + 1 day
    bounds = ev.agg(
        F.min(F.col("ts").cast("timestamp")).alias("mn"),
        F.max(F.col("ts").cast("timestamp")).alias("mx"),
    ).first()
    span_days = (bounds["mx"] - bounds["mn"]).days + 1
    k = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("k")
    ev_scaled = (
        ev.select("*", k)
        .select(
            (F.col("event_id") + F.col("k") * F.lit(n_ev)).alias("event_id"),
            (F.col("ts") + F.make_interval(days=F.col("k") * F.lit(span_days))).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    )
    docs_scaled = (
        docs.select("*", k)
        .select(
            (F.col("doc_id") + F.col("k") * F.lit(n_docs)).alias("doc_id"),
            # per-copy marker: distinct texts scale with copies, near-dup
            # structure replicates per copy instead of collapsing
            F.concat(F.col("text"), F.lit(" v"), F.col("k").cast("string")).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
    )
    ev_scaled.coalesce(8).write.mode("overwrite").parquet(str(out_dir / "events.parquet"))
    docs_scaled.coalesce(4).write.mode("overwrite").parquet(str(out_dir / "documents.parquet"))
    for t in ("embeddings", "region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        dst = out_dir / f"{t}.parquet"
        if not dst.exists():
            os.symlink(f"{SF_DIR}/{t}.parquet", dst)
    spark.stop()


def run_one(qname: str, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, qname, sf_dir],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"{qname}@{sf_dir} produced no result: {out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default=",".join(QUERIES + STREAM_QUERIES))
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()
    queries = args.queries.split(",")

    one_x = BASE / "x1"
    ten_x = BASE / "x10"
    if not args.skip_gen or not (ten_x.exists() and one_x.exists()):
        # 1x goes through the same writer so parquet layout is comparable
        print("generating scaled inputs ...", flush=True)
        generate(1, one_x)
        generate(COPIES, ten_x)

    samples: dict[tuple[str, str], list[float]] = {}
    state_rows: dict[tuple[str, str], int] = {}
    for rep in range(args.reps):
        for q in queries:
            for label, d in (("1x", one_x), ("10x", ten_x)):
                r = run_one(q, str(d))
                samples.setdefault((q, label), []).append(r["sec"])
                extra = ""
                if "state_rows" in r:
                    state_rows[(q, label)] = max(
                        state_rows.get((q, label), 0), r["state_rows"]
                    )
                    extra = f", state={r['state_rows']}"
                print(f"rep{rep} {q} {label}: {r['sec']}s ({r['rows']} rows{extra})", flush=True)

    print("\n| query | 1x best (s) | 10x best (s) | ratio | state 1x→10x | verdict |")
    print("|---|---|---|---|---|---|")
    results = {}
    for q in queries:
        b1 = min(samples[(q, "1x")])
        b10 = min(samples[(q, "10x")])
        ratio = b10 / b1
        verdict = "~linear" if ratio <= 13 else ("CHECK" if ratio <= 20 else "SUPERLINEAR")
        srow = ""
        if (q, "1x") in state_rows or (q, "10x") in state_rows:
            srow = (
                f"{state_rows.get((q, '1x'), '?')} → "
                f"{state_rows.get((q, '10x'), '?')}"
            )
        results[q] = {"x1": b1, "x10": b10, "ratio": round(ratio, 2), "verdict": verdict}
        if srow:
            results[q]["state_rows"] = srow
        print(f"| {q} | {b1:.2f} | {b10:.2f} | {ratio:.1f}x | {srow or '—'} | {verdict} |")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
