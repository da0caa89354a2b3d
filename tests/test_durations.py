"""Table-driven ISO-8601 duration tests — mirrors the reference's parser
table tests (``/root/reference/met_connectors/src/frost/duration.rs:71-95``)."""

import pytest

from rove_spark.functions.durations import Duration, parse_iso8601


@pytest.mark.parametrize(
    "s,months,seconds",
    [
        ("PT1H", 0, 3600),
        ("PT1M", 0, 60),
        ("PT10M", 0, 600),
        ("PT1S", 0, 1),
        ("P1D", 0, 86400),
        ("P1W", 0, 7 * 86400),
        ("P1M", 1, 0),
        ("P1Y", 12, 0),
        ("P1DT12H", 0, 86400 + 12 * 3600),
        ("PT1H30M", 0, 5400),
    ],
)
def test_parse_ok(s, months, seconds):
    assert parse_iso8601(s) == Duration(months=months, seconds=seconds)


@pytest.mark.parametrize("s", ["", "P", "PT", "1H", "PT1X", "garbage", "P-1D"])
def test_parse_errors(s):
    with pytest.raises(ValueError):
        parse_iso8601(s)


def test_interval_sql():
    assert parse_iso8601("PT1H").interval_sql() == "INTERVAL 3600 SECOND"
    assert parse_iso8601("P1M").interval_sql() == "INTERVAL 1 MONTH"


def test_resolution_matches_predicate(spark):
    """In-engine P4 predicate: semantic ISO equivalence without any
    driver-side distinct-collect (round-2 verdict item 5)."""
    from pyspark.sql import functions as F

    from rove_spark.functions.durations import parse_iso8601, resolution_matches

    rows = [
        ("PT1H",), ("PT60M",), ("PT3600S",), (" PT1H ",), ("PT0H60M",),
        ("P1M",), ("P0Y1M",), ("P1MT30S",), ("PT30M",), ("P",), ("PT",),
        ("garbage",), (None,), ("P1W",), ("P7D",),
    ]
    df = spark.createDataFrame(rows, "declared string")
    kept = lambda want: {
        r.declared
        for r in df.filter(resolution_matches(F.col("declared"), parse_iso8601(want))).collect()
    }
    assert kept("PT1H") == {"PT1H", "PT60M", "PT3600S", " PT1H ", "PT0H60M"}
    assert kept("P1M") == {"P1M", "P0Y1M"}
    assert kept("P1MT30S") == {"P1MT30S"}
    assert kept("P1W") == {"P1W", "P7D"}


def test_resolution_matches_survives_ansi_overflow(spark):
    """A >19-digit component must be a mismatch, not an ANSI cast abort."""
    from pyspark.sql import functions as F

    from rove_spark.functions.durations import parse_iso8601, resolution_matches

    df = spark.createDataFrame(
        [("PT99999999999999999999S",), ("PT1H",)], "declared string"
    )
    kept = df.filter(
        resolution_matches(F.col("declared"), parse_iso8601("PT1H"))
    ).collect()
    assert [r.declared for r in kept] == ["PT1H"]


def test_parse_rfc3339_normalizes_offsets():
    import datetime as dt

    from rove_spark.functions.durations import parse_rfc3339

    assert parse_rfc3339("2024-01-01T12:00:00Z") == dt.datetime(2024, 1, 1, 12)
    assert parse_rfc3339("2024-01-01T13:00:00+01:00") == dt.datetime(2024, 1, 1, 12)
    assert parse_rfc3339("2024-01-01T12:00:00") == dt.datetime(2024, 1, 1, 12)


def test_resolution_matches_survives_scaled_overflow(spark):
    """Overflow AFTER unit scaling (component fits a long, component*unit
    does not) must be a mismatch, not an ANSI abort (round-3 review #2)."""
    from pyspark.sql import functions as F

    from rove_spark.functions.durations import parse_iso8601, resolution_matches

    df = spark.createDataFrame(
        [("P800000000000000000Y",), ("P99999999999999999W",), ("PT1H",)],
        "declared string",
    )
    kept = df.filter(
        resolution_matches(F.col("declared"), parse_iso8601("PT1H"))
    ).collect()
    assert [r.declared for r in kept] == ["PT1H"]
