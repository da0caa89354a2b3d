"""Synthetic transcript source: schema, determinism (partition-invariant),
skew/gap/anomaly knobs."""

from __future__ import annotations

from pyspark.sql import functions as F

from rove_spark.sources.synthetic import synthetic_transcripts


def test_schema(spark):
    df = synthetic_transcripts(spark, n_conv=5, avg_turns=10)
    assert [f.name for f in df.schema.fields] == [
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    ]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["turn_idx"] == "int"
    assert types["ts"] == "timestamp"


def test_deterministic_across_parallelism(spark):
    a = synthetic_transcripts(spark, n_conv=20, avg_turns=20, n_partitions=1)
    b = synthetic_transcripts(spark, n_conv=20, avg_turns=20, n_partitions=7)
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb


def test_hot_keys_skew(spark):
    df = synthetic_transcripts(spark, n_conv=100, avg_turns=20, hot_frac=0.02, hot_multiplier=50)
    counts = df.groupBy("conv_id").count().collect()
    sizes = sorted((r["count"] for r in counts), reverse=True)
    assert sizes[0] > 10 * sizes[len(sizes) // 2]  # heavy head vs median


def test_gaps_exist_on_grid(spark):
    df = synthetic_transcripts(spark, n_conv=10, avg_turns=50, gap_rate=0.2, period_s=60)
    # all timestamps are on the 60s grid
    off = df.filter(F.unix_timestamp("ts") % 60 != 0).count()
    assert off == 0
    # gap rate roughly honored: observed turns < max turn_idx+1 per conv
    per = df.groupBy("conv_id").agg(
        F.count("*").alias("n"), (F.max("turn_idx") + 1).alias("span")
    )
    row = per.agg(F.sum("n").alias("n"), F.sum("span").alias("span")).first()
    assert 0.7 < row.n / row.span < 0.95


def test_roles_and_tools(spark):
    df = synthetic_transcripts(spark, n_conv=20, avg_turns=40)
    roles = {r.role for r in df.select("role").distinct().collect()}
    assert roles == {"user", "assistant", "tool", "system"}  # FIXTURES.md F1 domain
    # exactly one system turn per conversation, at turn 0
    sys_turns = df.filter(F.col("role") == "system")
    assert sys_turns.filter(F.col("turn_idx") != 0).count() == 0
    assert df.filter((F.col("role") == "tool") & F.col("tool").isNull()).count() == 0
    assert df.filter((F.col("role") == "user") & F.col("tool").isNotNull()).count() == 0
