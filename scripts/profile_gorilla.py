"""Stage decomposition of gorilla_roundtrip (noop-sink per stage) plus a
single-threaded decode microbenchmark — sizes the decode opportunity
before touching the codec (guide §1)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rove_spark.plans.driver_queries import PT1H, _events, _utc  # noqa: E402
from rove_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("profile_gorilla", master=f"local[{cpus}]")
    _utc(spark)

    from rove_spark.operators.gorilla import compress_series, decompress_series
    from rove_spark.operators.gridfill import grid_fill

    def build(stop):
        ev = _events(spark, sf_dir)
        hourly = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("ts")).agg(
            F.avg("value").alias("hv")
        )
        if stop == "hourly":
            return hourly
        g = grid_fill(hourly, PT1H, series_col="user_id", keep_cols=["hv"])
        if stop == "grid":
            return g
        chunks = compress_series(g, "hv", series_col="user_id", chunk="day")
        if stop == "compress":
            return chunks
        back = decompress_series(chunks, value_col="hv")
        if stop == "decompress":
            return back
        return back.groupBy(F.col("series_id").cast("bigint").alias("user_id")).agg(
            F.count(F.lit(1)).alias("n_slots"),
            F.sum((~F.col("is_gap")).cast("long")).alias("n_present"),
        )

    stages = ["hourly", "grid", "compress", "decompress", "full"]
    samples = {s: [] for s in stages}
    for rep in range(3):
        for s in stages:
            spark.sparkContext.setJobDescription(f"gorilla:{s} rep{rep}")
            t0 = time.time()
            noop(build(s))
            samples[s].append(round(time.time() - t0, 3))
    print("stage mins:", {s: min(v) for s, v in samples.items()})
    print("samples:", samples)

    # single-threaded decode microbench over the REAL chunk table
    chunks = build("compress").collect()
    from rove_spark.operators.gorilla import decode_chunk_masked, decode_timestamps, decode_values

    t0 = time.time()
    npts = 0
    for row in chunks:
        ts, vals, pres = decode_chunk_masked(
            {
                "n_points": row.n_points,
                "ts_codec": row.ts_codec,
                "val_codec": row.val_codec,
                "presence": row.presence,
            }
        )
        npts += len(ts)
    dt = time.time() - t0
    print(f"decode: {len(chunks)} chunks, {npts} pts, {dt:.2f}s single-thread "
          f"({npts/dt/1e6:.2f} Mpts/s)")
    t0 = time.time()
    for row in chunks:
        decode_timestamps(row.ts_codec)
    print(f"  ts-only:  {time.time()-t0:.2f}s")
    t0 = time.time()
    for row in chunks:
        decode_values(row.val_codec)
    print(f"  val-only: {time.time()-t0:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
