"""Dialogue-integrity checks: exact flags on hand-built conversations,
composition with the tier rollup, and the shared-window plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rove_spark.model import Flag
from rove_spark.operators.dialogue import orphan_tool_check, role_alternation_check
from rove_spark.operators.rollup import rollup_from_raw


@pytest.fixture(scope="module")
def conv(spark):
    # (conv, turn, role, tool): c1 is a clean call/result exchange;
    # c2 has a repeated user turn and an orphaned tool result
    rows = [
        ("c1", 0, "user", None),
        ("c1", 1, "assistant", "tool_3"),  # tool call
        ("c1", 2, "tool", "tool_3"),       # paired result
        ("c1", 3, "assistant", None),
        ("c2", 0, "user", None),
        ("c2", 1, "user", None),           # alternation violation
        ("c2", 2, "tool", None),           # orphaned result (prev has no call)
        ("c2", 3, "system", None),
        ("c2", 4, "system", None),         # system may repeat: PASS
        ("c2", 5, None, None),             # NULL role
        ("c2", 6, "user", None),           # successor of a NULL role
        ("c3", 0, "tool", "tool_1"),       # result at conversation head
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )


def _flags(df, col):
    return {(r.conv_id, r.turn_idx): r[col] for r in df.collect()}


def test_role_alternation_exact(spark, conv):
    got = _flags(role_alternation_check(conv), "flag_role_alternation_check")
    assert got[("c1", 0)] == Flag.INCONCLUSIVE  # head
    assert got[("c1", 1)] == Flag.PASS
    assert got[("c2", 1)] == Flag.FAIL          # user after user
    assert got[("c2", 2)] == Flag.PASS          # tool not in alternating set
    assert got[("c2", 4)] == Flag.PASS          # system repeat is legal
    assert got[("c2", 5)] == Flag.DATA_MISSING
    assert got[("c2", 6)] == Flag.DATA_MISSING  # comparison undecidable
    assert got[("c3", 0)] == Flag.INCONCLUSIVE


def test_orphan_tool_exact(spark, conv):
    got = _flags(orphan_tool_check(conv), "flag_orphan_tool_check")
    assert got[("c1", 2)] == Flag.PASS          # paired with the call at turn 1
    assert got[("c2", 2)] == Flag.FAIL          # prev turn carried no call
    assert got[("c3", 0)] == Flag.FAIL          # head result: orphaned by def.
    assert got[("c1", 0)] == Flag.PASS          # non-tool turns pass
    assert got[("c2", 5)] == Flag.DATA_MISSING


def test_chained_tool_results_pass(spark):
    """A second consecutive result is paired with the previous result row
    (which itself carries the tool marker) — chained results after one
    call are legal."""
    rows = [
        ("c", 0, "assistant", "tool_0"),
        ("c", 1, "tool", "tool_0"),
        ("c", 2, "tool", "tool_0"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )
    got = _flags(orphan_tool_check(df), "flag_orphan_tool_check")
    assert got[("c", 1)] == Flag.PASS and got[("c", 2)] == Flag.PASS


def test_composes_with_tier_rollup(spark, conv):
    """Dialogue flags feed flag densities like any QC check."""
    df = conv.withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("turn_idx"))
    ).withColumn("text", F.lit("x"))
    flagged = orphan_tool_check(role_alternation_check(df))
    tier = rollup_from_raw(
        flagged, "1d", role_col=None,
        checks=["role_alternation_check", "orphan_tool_check"],
    )
    out = {r.conv_id: r for r in tier.collect()}
    assert out["c2"].n_fail_role_alternation_check == 1
    assert out["c2"].n_fail_orphan_tool_check == 1
    assert out["c1"].n_fail_orphan_tool_check == 0


def test_shared_window_single_exchange(spark, conv):
    """Both checks ride ONE exchange+sort (the temporal-check contract)."""
    both = orphan_tool_check(role_alternation_check(conv))
    plan = both._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "PythonUDF" not in plan
