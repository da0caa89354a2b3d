"""Local replica of the driver's correctness gate: run each ``queries()``
entry on Spark at sf0.01 and compare against its ``oracle_sql()`` twin in
DuckDB — row count, column names, and exact (order-insensitive) values."""

from __future__ import annotations

import math
from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [p.stem for p in Path(SF_DIR).glob("*.parquet")]


def _duck():
    # 2GB cap replicates the driver harness's DuckDB memory budget: an
    # oracle that would OOM the driver (round-3 sct_iter) fails here first.
    con = duckdb.connect(config={"memory_limit": "2GB"})
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


QUERIES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert len(spark_rows) > 0  # rows-only check
        return
    con = _duck()
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count mismatch"
    a, b = _canon(spark_cols, spark_rows), _canon(duck_cols, duck_rows)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
    assert a == b, f"{name}: first mismatches {[(a[i], b[i]) for i in mism]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None


def test_sct_oracle_depth_guard_fires():
    """An undersplit KD leaf must raise a named oracle-depth error, not
    silently drop rows into a hash mismatch (ADVICE r4): levels=1 covers
    only 3*2=6 stations, far below sf0.01's 150."""
    from rove_spark.plans.driver_queries import _sql_sct_small

    con = _duck()
    with pytest.raises(duckdb.Error, match="too shallow"):
        con.execute(_sql_sct_small(levels=1))


def test_sct_mid_exercises_both_solve_branches():
    """sct_mid's hash-green is only meaningful if the KD split actually
    produces BOTH leaf sizes: 3-boxes (closed-form 3×3) and 4-boxes (the
    generated 4×4 adjugate). Probe the oracle's own fin CTE — at sf0.01
    the mix is ~516 rows in 3-leaves / ~3152 in 4-leaves."""
    from rove_spark.plans.driver_queries import _sql_sct_mid

    sql = _sql_sct_mid()
    idx = sql.rfind("SELECT h.user_id")
    probe = sql[:idx] + "SELECT bk, count(*) AS n FROM fin GROUP BY bk"
    con = _duck()
    sizes = dict(con.execute(probe).fetchall())
    assert sizes.get(3, 0) > 0, sizes
    assert sizes.get(4, 0) > 0, sizes
    assert max(sizes) <= 4, sizes


def test_sct_deep_exercises_generated_5box_branch():
    """sct_deep's num_max=5 KD split must actually produce 5-station
    leaves (the generated adjk(5) branch) alongside 4s — not vacuously
    green via the smaller solvers."""
    from rove_spark.plans.driver_queries import _sql_sct_deep

    sql = _sql_sct_deep()
    idx = sql.rfind("SELECT h.user_id")
    probe = sql[:idx] + "SELECT bk, count(*) AS n FROM fin GROUP BY bk"
    con = _duck()
    sizes = dict(con.execute(probe).fetchall())
    assert sizes.get(5, 0) > 0, sizes
    assert sizes.get(4, 0) > 0, sizes
    assert max(sizes) <= 5, sizes


# Every distinct operator family must sit inside the driver's 50-entry
# cap every round. Fixed entries are named directly; a rotating family is
# named by its ROTATION_GROUPS entry — any member of the group satisfies
# it (members are same-family by construction).
MUST_VERIFY_FIXED = {
    "step_check", "spike_check", "flatline_check",
    "range_check_dynamic", "model_consistency_check",
    "pipeline_toml",
    "rollup_1m_stream", "step_check_stream",
    "spike_check_stream", "flatline_check_stream",
    "hll_tier", "verify_digests",
    "buddy_check", "sct",
    "csv_snapshot", "polygon_filter",
    "dedup_exact", "dedup_clusters", "minhash_neardup", "simhash_neardup",
    "embedding_neardup",
    "ivf_knn_partial",
    "langid", "quality_score", "token_stats",
    "pii_scan", "repetition_stats", "multimodal_features",
    "zscore_check",
    "topk_users", "cube_rollup",
    "tpch_shipping", "tpch_pricing", "inactive_users",
    "tpch_region_volume", "skew_salted_agg",
}


def test_driver_cap_window_covers_every_family():
    """The driver harness records only the FIRST 50 queries() entries
    (round-4 verdict item 1: three relational queries silently fell out).
    Guard the invariant structurally: exactly 50 head entries, every
    fixed must-verify family inside them, every rotation group holding
    exactly one head slot with the epoch-determined pick, and everything
    past the cap is exactly the benched rotation members."""
    from rove_spark.plans.driver_queries import ROTATION_GROUPS, rotation_epoch

    q = list(entry_mod.queries())
    head, tail = set(q[:50]), q[50:]
    assert len(q[:50]) == 50
    assert MUST_VERIFY_FIXED <= head, f"fell past the cap: {sorted(MUST_VERIFY_FIXED - head)}"
    epoch = rotation_epoch()
    benched = set()
    for group in ROTATION_GROUPS:
        pick = group[epoch % len(group)]
        assert pick in head, f"rotation pick {pick} not in head (epoch {epoch})"
        others = [m for m in group if m != pick]
        assert head.isdisjoint(others), f"group {group}: >1 member in head"
        benched.update(others)
    assert set(tail) == benched, f"tail != benched rotation members: {tail}"


def test_rotation_cycles_every_member_through_cap(monkeypatch):
    """Determinism + liveness of the rotation (round-5 verdict item 2):
    under epoch override, the head is always exactly 50 with all fixed
    families present, and over len(group) consecutive epochs EVERY
    rotation member holds the slot at least once — no query is
    permanently benched."""
    from rove_spark.plans.driver_queries import ROTATION_GROUPS

    seen: dict[str, set[str]] = {g[0]: set() for g in ROTATION_GROUPS}
    for epoch in range(6):
        monkeypatch.setenv("ROVE_ROTATION_EPOCH", str(epoch))
        q = list(entry_mod.queries())
        head = set(q[:50])
        assert len(q[:50]) == 50
        assert MUST_VERIFY_FIXED <= head
        for g in ROTATION_GROUPS:
            picks = [m for m in g if m in head]
            assert picks == [g[epoch % len(g)]]
            seen[g[0]].add(picks[0])
    for g in ROTATION_GROUPS:
        assert seen[g[0]] == set(g), f"members never rotated in: {g}"
