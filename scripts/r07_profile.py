"""Round-7 stage-decomposition profiles for the hot spatial queries
(guide §1: find where the time actually goes before changing anything).
Times sub-plans of q_sct / q_buddy_check with the noop sink.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rove_spark.operators import spatial  # noqa: E402
from rove_spark.plans import driver_queries as dq  # noqa: E402
from rove_spark.session import get_spark  # noqa: E402


def t(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label:40s} {time.time() - t0:7.3f}s", flush=True)


def main():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("r07_profile", master=f"local[{cpus}]")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import pandas as pd  # noqa

    def _identity(pdf):
        return pdf

    spark.range(0, 64, 1, 64).withColumn("k", F.col("id") % 64).groupBy("k").applyInPandas(
        _identity, "id long, k long"
    ).count()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    ev = dq._events(spark, sf)
    print("events rows:", ev.count())

    # ---- sct decomposition ----
    daily = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("ts")).agg(
        F.avg("value").alias("dv")
    )
    located = spatial.with_synthetic_coords_portable(daily, series_col="user_id")
    print("daily rows:", located.count(), "users:", located.select("user_id").distinct().count())
    t("sct: daily+coords", located)

    base = located.select(
        F.col("user_id").cast("string").alias("series_id"),
        F.col("ts"),
        F.col("dv").cast("double").alias("value"),
        F.col("lat").cast("double"),
        F.col("lon").cast("double"),
        F.coalesce(F.col("elev"), F.lit(0.0)).cast("double").alias("elev"),
    )
    grouped, keys = spatial._celled(base, dq.SCT_CELL_DEG, halo_deg=150_000.0 / 111_000.0)
    print("celled rows:", grouped.count(), "groups:", grouped.select(*keys).distinct().count())
    t("sct: celled expansion", grouped)

    # identity kernel: shuffle + Arrow + python overhead only
    import numpy as np  # noqa

    def run_id(pdf):
        keep = ~pdf["is_halo"].to_numpy(bool)
        return pd.DataFrame(
            {"series_id": pdf["series_id"][keep], "ts": pdf["ts"][keep],
             "flag_sct": np.zeros(int(keep.sum()), dtype=np.int8)}
        )

    from rove_spark.operators.util import parallel_groups

    ident = parallel_groups(grouped, *keys).groupBy(*keys).applyInPandas(
        run_id, "series_id string, ts timestamp, flag_sct tinyint"
    )
    t("sct: group+identity kernel", ident)

    for name, fn in [
        ("sct: FULL q_sct", dq.q_sct),
        ("sct: FULL q_sct_isolated", dq.q_sct_isolated),
        ("buddy: FULL q_buddy_check", dq.q_buddy_check),
    ]:
        t(name, fn(spark, sf))

    # ---- buddy decomposition ----
    hourly = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("ts")).agg(
        F.avg("value").alias("hv")
    )
    hl = spatial.with_synthetic_coords_portable(hourly, series_col="user_id")
    print("hourly rows:", hl.count())
    t("buddy: hourly+coords", hl)

    bbase = hl.select(
        F.col("user_id").cast("string").alias("series_id"),
        "ts",
        F.col("hv").cast("double").alias("value"),
        F.col("lat").cast("double"),
        F.col("lon").cast("double"),
        F.coalesce(F.col("elev"), F.lit(0.0)).cast("double").alias("elev"),
        F.monotonically_increasing_id().alias("_rid"),
    ).localCheckpoint(eager=False)
    bg, bkeys = spatial._celled(
        bbase, dq.BUDDY_CELL_DEG, halo_deg=dq.BUDDY_RADIUS / 111_000.0
    )
    print("buddy celled rows:", bg.count())
    import math

    cos_ref = math.cos(math.radians(60.0))
    home_cell = F.concat_ws(
        ":",
        F.floor(F.col("lon") * cos_ref / dq.BUDDY_CELL_DEG).cast("int"),
        F.floor(F.col("lat") / dq.BUDDY_CELL_DEG).cast("int"),
    )
    home = bbase.withColumn("cell", home_cell)
    nbr = bg.select(
        *bkeys,
        F.col("series_id").alias("_bsid"),
        F.col("value").alias("_bv"),
        F.col("lat").alias("_blat"),
        F.col("lon").alias("_blon"),
    )
    pairs = home.join(nbr, bkeys)
    print("buddy pair rows:", pairs.count())
    t("buddy: raw pair join", pairs.select("series_id", "ts", "_bv"))

    spark.stop()


if __name__ == "__main__":
    main()
