"""Cross-engine property fuzzing: random series (gaps, ties, edge values)
→ Spark check operators vs the DuckDB oracle SQL — semantics must agree on
EVERY row, not just the fixed driver tables. Catches edge-case divergence
(NULL handling, tie ordering, boundary comparisons) that golden fixtures
can miss."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from rove_spark.operators import checks

STEP_MAX, STEP_HIGH = 5.0, 2.0
FLAT_MAX = 2


def _random_series(seed: int, n_series: int = 6, n_rows: int = 220) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    sid = rng.integers(0, n_series, n_rows)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 5000, n_rows), unit="m"
    )
    # quantized values → ties and flatline runs; ~12% NULLs → gaps
    vals = np.round(rng.normal(10, 4, n_rows) / 2) * 2.0
    vals[rng.random(n_rows) < 0.12] = np.nan
    df = pd.DataFrame(
        {
            "sid": [f"s{i}" for i in sid],
            "row_id": np.arange(n_rows),
            "ts": ts,
            # real NULLs (not NaN) so the DATA_MISSING path is exercised
            "value": pd.array(vals, dtype="Float64"),
        }
    )
    return df


def _duck(pdf: pd.DataFrame, sql: str) -> dict:
    con = duckdb.connect()
    con.register("t", pdf)
    return {r[0]: r[1] for r in con.execute(sql).fetchall()}


SQL_STEP = f"""
SELECT row_id,
       CASE WHEN prow IS NULL THEN 3
            WHEN value IS NULL OR pv IS NULL THEN 5
            WHEN abs(value - pv) >= {STEP_MAX} THEN 1
            WHEN abs(value - pv) >= {STEP_HIGH} THEN 2
            ELSE 0 END AS flag
FROM (SELECT row_id, value,
             lag(value) OVER w AS pv, lag(row_id) OVER w AS prow
      FROM t WINDOW w AS (PARTITION BY sid ORDER BY ts, row_id))
"""

SQL_SPIKE = f"""
SELECT row_id,
       CASE WHEN prow IS NULL OR nrow IS NULL THEN 3
            WHEN value IS NULL OR pv IS NULL OR nv IS NULL THEN 5
            WHEN (value-pv)*(value-nv) > 0
                 AND least(abs(value-pv), abs(value-nv)) >= {STEP_MAX} THEN 1
            WHEN (value-pv)*(value-nv) > 0
                 AND least(abs(value-pv), abs(value-nv)) >= {STEP_HIGH} THEN 2
            ELSE 0 END AS flag
FROM (SELECT row_id, value,
             lag(value) OVER w AS pv, lead(value) OVER w AS nv,
             lag(row_id) OVER w AS prow, lead(row_id) OVER w AS nrow
      FROM t WINDOW w AS (PARTITION BY sid ORDER BY ts, row_id))
"""

SQL_FLATLINE = f"""
WITH lagged AS (
  SELECT row_id, sid, ts, value,
         CASE WHEN value IS DISTINCT FROM lag(value) OVER w THEN 1 ELSE 0 END AS ch,
         row_number() OVER w AS rn
  FROM t WINDOW w AS (PARTITION BY sid ORDER BY ts, row_id)
), g AS (
  SELECT *, sum(ch) OVER (PARTITION BY sid ORDER BY ts, row_id
                          ROWS UNBOUNDED PRECEDING) AS grp
  FROM lagged
), r AS (
  SELECT row_id, value, rn,
         row_number() OVER (PARTITION BY sid, grp ORDER BY ts, row_id) AS run_len
  FROM g
)
SELECT row_id,
       CASE WHEN value IS NULL THEN 5
            WHEN run_len >= {FLAT_MAX + 1} THEN 1
            WHEN rn <= {FLAT_MAX} THEN 3
            ELSE 0 END AS flag
FROM r
"""


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_checks_vs_duckdb(spark, seed):
    pdf = _random_series(seed)
    sdf = spark.createDataFrame(pdf).withColumn(
        "value", __import__("pyspark.sql.functions", fromlist=["col"]).col("value")
    )
    order = ("ts", "row_id")
    out = checks.step_check(
        sdf, "value", max_=STEP_MAX, high=STEP_HIGH, series_col="sid", order_cols=order
    )
    out = checks.spike_check(
        out, "value", max_=STEP_MAX, high=STEP_HIGH, series_col="sid", order_cols=order
    )
    out = checks.flatline_check(out, "value", max_=FLAT_MAX, series_col="sid", order_cols=order)
    rows = out.select(
        "row_id", "flag_step_check", "flag_spike_check", "flag_flatline_check"
    ).collect()
    got_step = {r.row_id: r.flag_step_check for r in rows}
    got_spike = {r.row_id: r.flag_spike_check for r in rows}
    got_flat = {r.row_id: r.flag_flatline_check for r in rows}

    assert got_step == _duck(pdf, SQL_STEP), "step divergence"
    assert got_spike == _duck(pdf, SQL_SPIKE), "spike divergence"
    assert got_flat == _duck(pdf, SQL_FLATLINE), "flatline divergence"


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_fuzz_portable_simhash_cross_engine(spark, seed):
    """Random unicode-ish texts (ties, repeats, empties, odd whitespace) →
    the portable simhash must be bit-identical across Spark and DuckDB."""
    import duckdb as _duckdb

    from rove_spark.operators.dedup import with_simhash_portable

    rng = np.random.default_rng(seed)
    vocab = ["the", "fox", "Fox", "ÜBER", "naïve", "a", "9", "#!?", "x" * 40]
    rows = []
    for i in range(60):
        k = int(rng.integers(0, 12))
        toks = [vocab[int(j)] for j in rng.integers(0, len(vocab), k)]
        sep = "  " if rng.random() < 0.3 else " "
        text = sep.join(toks)
        if rng.random() < 0.15:
            text = " " + text + "\t"
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in with_simhash_portable(df).collect()}

    con = _duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    duck = dict(
        con.execute(
            r"""
            WITH toks AS (
              SELECT doc_id, [md5(w) for w in list_distinct(list_filter(
                 string_split_regex(lower(text), '\s+'), x -> len(x) > 0))] AS hs
              FROM docs
            )
            SELECT doc_id,
                   list_aggregate([CASE WHEN coalesce(list_sum(
                       [2*(((strpos('0123456789abcdef', substr(h, CAST(16 - (b // 4) AS INT), 1)) - 1)
                            >> (b % 4)) & 1) - 1 for h in hs]), 0) > 0
                     THEN '1' ELSE '0' END for b in range(0, 64)], 'string_agg', '') AS s
            FROM toks
            """
        ).fetchall()
    )
    for i, sig in got.items():
        bits = "".join(str((sig >> b) & 1) for b in range(64))
        assert bits == duck[i], (i, rows[i][1])


@pytest.mark.parametrize("seed", [11, 22])
def test_fuzz_portable_coords_cross_engine(spark, seed):
    """Synthetic-coordinate portability over arbitrary series ids
    (negative, huge, stringy) — exact double equality."""
    import duckdb as _duckdb

    from rove_spark.operators.spatial import synthetic_coords_sql, with_synthetic_coords_portable

    rng = np.random.default_rng(seed)
    ids = [int(x) for x in rng.integers(-(2**40), 2**40, 40)]
    df = spark.createDataFrame([(i,) for i in ids], "user_id long")
    got = {
        r.user_id: (r.lat, r.lon, r.elev)
        for r in with_synthetic_coords_portable(df, series_col="user_id").collect()
    }
    c = synthetic_coords_sql("user_id")
    con = _duckdb.connect()
    con.register("u", pd.DataFrame({"user_id": ids}))
    duck = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"SELECT user_id, {c['lat']}, {c['lon']}, {c['elev']} FROM u"
        ).fetchall()
    }
    assert got == duck


@pytest.mark.parametrize("seed", [7, 77, 777])
def test_fuzz_buddy_kernel_vs_sql_twin(seed):
    """The buddy_check DuckDB twin (haversine self-join + biased neighbor
    variance + min_std floor) must reproduce the numpy kernel flag-for-flag
    on random constellations — not just on the fixed driver table.
    Single iteration, no elevation gating (the driver query's surface)."""
    import duckdb as _duckdb

    from rove_spark.operators.spatial import buddy_check_kernel, haversine_sql

    rng = np.random.default_rng(seed)
    n = 120
    lat = 58 + rng.uniform(0, 1.2, n)
    lon = 8 + rng.uniform(0, 1.2, n)
    vals = np.round(10 + rng.standard_normal(n) * 6, 3)
    vals[rng.random(n) < 0.1] = np.nan  # DATA_MISSING path
    radius, num_min, threshold, min_std = 40_000.0, 2, 2.0, 1.0

    flags = buddy_check_kernel(
        vals, lat, lon, np.zeros(n), radius=radius, num_min=num_min,
        threshold=threshold, min_std=min_std, num_iterations=1,
    )

    pdf = pd.DataFrame(
        {"i": np.arange(n), "lat": lat, "lon": lon,
         "hv": pd.array(vals, dtype="Float64")}
    )
    dist = haversine_sql("a.lat", "a.lon", "b.lat", "b.lon")
    sql = f"""
    WITH nbr AS (
      SELECT a.i, b.hv AS bv
      FROM t a JOIN t b ON a.i != b.i AND b.hv IS NOT NULL AND {dist} <= {radius}
    ), m AS (
      SELECT i, count(*) AS cnt, avg(bv) AS mean FROM nbr GROUP BY 1
    ), s AS (
      SELECT n.i, sum((n.bv - m.mean) * (n.bv - m.mean)) / m.cnt AS var
      FROM nbr n JOIN m USING (i) GROUP BY n.i, m.cnt
    )
    SELECT t.i,
           CASE WHEN t.hv IS NULL THEN 5
                WHEN m.cnt IS NOT NULL AND m.cnt >= {num_min}
                     AND abs(t.hv - m.mean) / greatest(sqrt(s.var), {min_std})
                         > {threshold} THEN 1
                WHEN m.cnt IS NULL OR m.cnt < {num_min} THEN 6
                ELSE 0 END AS flag
    FROM t LEFT JOIN m USING (i) LEFT JOIN s USING (i)
    """
    con = _duckdb.connect()
    con.register("t", pdf)
    duck = dict(con.execute(sql).fetchall())
    mismatches = [
        (i, int(flags[i]), duck[i]) for i in range(n) if int(flags[i]) != duck[i]
    ]
    assert not mismatches, mismatches[:5]
