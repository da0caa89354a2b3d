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
