"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pipeline slice (grid-fill → QC checks → tier
rollup — all JVM-side, zero UDFs) on sf0.001. ``queries``/``oracle_sql``
expose every implemented operator with its DuckDB twin; implementations
live in ``rove_spark.plans.driver_queries``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from rove_spark.session import _export_pythonpath  # noqa: E402

# executor Python workers must import rove_spark even when the driver's
# session was created elsewhere (grouped-UDF closures reference the package)
_export_pythonpath()

from pyspark.sql import functions as F  # noqa: E402

from rove_spark.functions.durations import parse_iso8601  # noqa: E402
from rove_spark.operators import checks  # noqa: E402
from rove_spark.operators.gridfill import grid_fill  # noqa: E402
from rove_spark.plans import driver_queries  # noqa: E402
from rove_spark.sources.tables import read_table  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events → hourly per-user series → grid gap-fill →
    step/spike/range QC → per-user daily rollup with flag densities."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    hourly = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("ts")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )
    g = grid_fill(hourly, parse_iso8601("PT1H"), series_col="user_id",
                  keep_cols=["n_events", "value_cents"])
    g = g.withColumn("hourly_value", F.col("value_cents").cast("double") / 100.0)
    flagged = checks.step_check(
        g, "hourly_value", max_=5000.0, high=1000.0, series_col="user_id", order_cols=["ts"]
    )
    flagged = checks.spike_check(
        flagged, "hourly_value", max_=4000.0, high=1000.0, series_col="user_id", order_cols=["ts"]
    )
    flagged = checks.range_check(flagged, "hourly_value", min_=0.0, max_=100000.0)
    day = flagged.groupBy("user_id", F.date_trunc("day", "ts").alias("bucket_ts")).agg(
        F.count(F.lit(1)).alias("n_slots"),
        F.sum(F.col("is_gap").cast("long")).alias("n_gaps"),
        F.sum(F.coalesce("n_events", F.lit(0))).alias("n_events"),
        F.sum((F.col("flag_step_check") == 1).cast("long")).alias("n_fail_step"),
        F.sum((F.col("flag_spike_check") == 1).cast("long")).alias("n_fail_spike"),
        F.sum((F.col("flag_range_check") == 1).cast("long")).alias("n_fail_range"),
    )
    return day.orderBy("user_id", "bucket_ts")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query above."""
    return driver_queries.oracle_sql()
