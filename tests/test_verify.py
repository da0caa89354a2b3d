"""Text-equality verifier: holds across the real pipeline; detects
mutation, loss, duplication, reordering, and cross-turn text swaps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rove_spark.operators.verify import assert_text_equality, verify_text_equality
from rove_spark.sources.synthetic import synthetic_transcripts


def _df(spark):
    return synthetic_transcripts(spark, n_conv=15, avg_turns=30)


def test_invariant_holds_through_pipeline(spark):
    from rove_spark.operators import checks
    from rove_spark.operators.signals import derive_signals

    df = _df(spark)
    out = derive_signals(df)
    out = checks.step_check(out, "text_len", max_=500.0)
    out = checks.spike_check(out, "text_len", max_=400.0)
    out = checks.range_check(out, "text_len", min_=0.0, max_=5000.0)
    assert verify_text_equality(df, out).count() == 0
    assert_text_equality(df, out)  # no raise


def test_detects_mutation(spark):
    df = _df(spark)
    bad = df.withColumn(
        "text", F.when(F.col("turn_idx") == 3, F.concat(F.col("text"), F.lit("!"))).otherwise(F.col("text"))
    )
    offenders = verify_text_equality(df, bad)
    assert offenders.count() > 0
    with pytest.raises(AssertionError, match="text equality violated"):
        assert_text_equality(df, bad)


def test_detects_row_loss_and_duplication(spark):
    df = _df(spark)
    lost = df.filter(~((F.col("conv_id") == "conv-3") & (F.col("turn_idx") == 5)))
    assert {r.conv_id for r in verify_text_equality(df, lost).collect()} == {"conv-3"}
    duped = df.unionByName(df.filter((F.col("conv_id") == "conv-4") & (F.col("turn_idx") == 2)))
    assert {r.conv_id for r in verify_text_equality(df, duped).collect()} == {"conv-4"}


def test_detects_cross_turn_swap(spark):
    rows = [("c", 0, "alpha"), ("c", 1, "beta")]
    a = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    b = spark.createDataFrame(
        [("c", 0, "beta"), ("c", 1, "alpha")], "conv_id string, turn_idx int, text string"
    )
    offenders = verify_text_equality(a, b).collect()
    assert len(offenders) == 1 and offenders[0].order_or_text_diff


def test_row_order_of_dataframe_is_irrelevant(spark):
    df = _df(spark)
    shuffled = df.orderBy(F.rand(7))
    assert verify_text_equality(df, shuffled).count() == 0
