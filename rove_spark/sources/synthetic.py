"""Deterministic synthetic transcript generator (Spark-native, no driver loops).

Analog of the reference's ``TestDataSource`` (``/root/reference/src/lib.rs:
144-213``): deterministic formula data for tests and benches. Ours produces
the BASELINE.json ``input_hint`` schema

    (conv_id: string, turn_idx: int, role: string, text: string,
     tool: string, ts: timestamp)

entirely from column expressions over ``spark.range`` — every cell is a pure
hash of (seed, conv, turn), so the table is identical regardless of
parallelism or partitioning, and generation scales linearly on a cluster
(narrow ops only; the single explode is the only row-amplifying step).

Knobs model what the engine must survive at 100 TB:
- ``gap_rate``: fraction of grid slots with no turn (gap-fill exercise);
- ``hot_frac``/``hot_multiplier``: a few conversations are 100x longer
  (hot-key skew for salting tests);
- ``anomaly_rate``: occasional huge ``text`` (spike/step/range exercise);
- ``flatline_rate``: occasional runs of identical text lengths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_BASE = 1704067200  # 2024-01-01T00:00:00Z, on every grid


def _h(seed: int, *cols, mod: int):
    """Deterministic uniform int in [0, mod): xxhash64 of (seed, cols)."""
    return F.pmod(F.xxhash64(F.lit(seed), *cols), F.lit(mod))


def synthetic_transcripts(
    spark: SparkSession,
    n_conv: int = 100,
    avg_turns: int = 40,
    period_s: int = 60,
    seed: int = 42,
    gap_rate: float = 0.1,
    hot_frac: float = 0.01,
    hot_multiplier: int = 50,
    anomaly_rate: float = 0.02,
    flatline_rate: float = 0.05,
    n_partitions: int | None = None,
) -> DataFrame:
    """Build the transcript table. Deterministic for a given arg tuple."""
    n_hot = max(0, int(n_conv * hot_frac))
    convs = spark.range(0, n_conv, 1, n_partitions or spark.sparkContext.defaultParallelism)
    # per-conversation turn budget: jittered around avg, hot convs inflated
    convs = convs.select(
        F.col("id").alias("conv_n"),
        (
            F.lit(avg_turns)
            + _h(seed + 1, F.col("id"), mod=max(1, avg_turns))
            - avg_turns // 2
        ).alias("base_turns"),
    ).select(
        "conv_n",
        F.when(F.col("conv_n") < n_hot, F.col("base_turns") * hot_multiplier)
        .otherwise(F.col("base_turns"))
        .alias("n_turns"),
    )
    turns = convs.select(
        "conv_n",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    # drop ~gap_rate of slots → timestamp gaps on the conversation's grid
    gap_mod = 1_000_000
    turns = turns.filter(_h(seed + 2, "conv_n", "turn_idx", mod=gap_mod) >= int(gap_rate * gap_mod))

    role = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 1, F.lit("user"))
        .when(_h(seed + 3, "conv_n", "turn_idx", mod=5) == 0, F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )
    tool = F.when(
        (role == "tool") | ((role == "assistant") & (_h(seed + 4, "conv_n", "turn_idx", mod=4) == 0)),
        F.concat(F.lit("tool_"), _h(seed + 5, "conv_n", "turn_idx", mod=8).cast("string")),
    ).otherwise(F.lit(None).cast("string"))

    # text: deterministic filler whose *length* is the QC signal.
    # normal lengths ~ N(40, jitter); anomalies are ~30x longer (spikes);
    # flatline runs repeat an identical length for a stretch of turns.
    base_len = 20 + _h(seed + 6, "conv_n", "turn_idx", mod=40)
    flat_len = 20 + _h(seed + 7, "conv_n", F.floor(F.col("turn_idx") / 16), mod=40)
    in_flat_run = _h(seed + 8, "conv_n", F.floor(F.col("turn_idx") / 16), mod=1_000_000) < int(
        flatline_rate * 1_000_000
    )
    is_anomaly = _h(seed + 9, "conv_n", "turn_idx", mod=1_000_000) < int(anomaly_rate * 1_000_000)
    text_len = (
        F.when(is_anomaly, base_len * 30).when(in_flat_run, flat_len).otherwise(base_len)
    )
    text = F.concat(
        F.lit("c"),
        F.col("conv_n").cast("string"),
        F.lit("t"),
        F.col("turn_idx").cast("string"),
        F.lit(" "),
        F.repeat(F.lit("x"), text_len),
    )

    conv_start = F.lit(EPOCH_BASE) + _h(seed + 10, "conv_n", mod=7 * 24 * 3600 // period_s) * period_s
    ts = F.timestamp_seconds(conv_start + F.col("turn_idx") * period_s)

    return turns.select(
        F.concat(F.lit("conv-"), F.col("conv_n").cast("string")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
