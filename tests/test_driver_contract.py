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


def test_driver_cap_window_covers_every_family():
    """The driver harness records only the FIRST 50 queries() entries
    (round-4 verdict item 1: three relational queries silently fell out).
    Guard the invariant structurally: exactly 50 head entries, every
    must-verify operator family inside them, and everything past the cap
    is an explicitly-subsumed redundancy."""
    q = list(entry_mod.queries())
    head, tail = set(q[:50]), q[50:]
    must_verify = {
        # one representative per distinct operator family
        "step_check", "spike_check", "flatline_check", "range_check",
        "range_check_dynamic", "model_consistency_check",
        "gapfill_mixed", "asof_join", "pipeline_toml",
        "rollup_1m", "rollup_1d", "rollup_1m_stream", "step_check_stream",
        "spike_check_stream", "flatline_check_stream",
        "histogram_tier", "hll_tier", "retention_plan", "retention_drop",
        "gorilla_roundtrip", "verify_digests",
        "buddy_check", "sct", "sct_iter",
        "csv_snapshot", "polygon_filter",
        "dedup_exact", "dedup_clusters", "minhash_neardup", "simhash_neardup",
        "embedding_neardup",
        "ivf_knn", "ivf_knn_partial",
        "langid", "quality_score", "token_stats", "fingerprints",
        "pii_scan", "repetition_stats", "multimodal_features",
        "stratified_sample", "zscore_check",
        "sessionize", "topk_users", "cube_rollup",
        "tpch_shipping", "tpch_pricing", "inactive_users",
        "tpch_region_volume", "skew_salted_agg",
    }
    assert must_verify <= head, f"fell past the cap: {sorted(must_verify - head)}"
    allowed_tail = {
        "gapfill", "knn_cosine", "special_value_check", "rollup_flag_density",
        "sct_small", "sct_isolated", "rollup_1h", "rollup_by_type",
        "fill_forward", "hash_sample",
    }
    assert set(tail) <= allowed_tail, f"non-redundant query in tail: {tail}"
