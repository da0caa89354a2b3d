"""spread_scan: scale-adaptive pre-map repartition (round 7)."""

from pyspark.sql import functions as F

from rove_spark.operators.util import spread_scan


def test_spread_scan_widens_deficient_scan(spark):
    df = spark.range(0, 1000, 1, 1).withColumn("v", F.col("id") * 2)
    assert df.rdd.getNumPartitions() == 1
    out = spread_scan(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism * 2
    # rows identical (round-robin repartition only moves them)
    assert out.exceptAll(df).count() == 0 and df.exceptAll(out).count() == 0


def test_spread_scan_noop_when_already_parallel(spark):
    n = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, n)
    out = spread_scan(df)
    # no repartition inserted: the frame is returned as-is
    assert out is df
