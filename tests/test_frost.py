"""Frost REST connector (S3): request marshalling, response parsing,
resolution filter, location selection, alignment contract — everything
above the socket, exercised via an injected fixture transport (reference:
met_connectors/src/frost/fetch.rs, util.rs; fixture mirrors the
reference's own RESP_SERIES test payload, fetch.rs:236-330)."""

from __future__ import annotations

import datetime as dt

import pytest

from rove_spark.functions.durations import parse_iso8601
from rove_spark.sources import frost

PT1H = parse_iso8601("PT1H")


def _series(station_id, resolution, obs, locations=None):
    return {
        "header": {
            "id": {"level": 0, "parameterid": 211, "sensor": 0, "stationid": station_id},
            "extra": {
                "station": {
                    "location": locations
                    or [
                        {
                            "from": "1931-01-01T00:00:00Z",
                            "to": "1940-12-31T00:00:00Z",
                            "value": {
                                "elevation(masl/hs)": "85",
                                "latitude": "59.939200",
                                "longitude": "10.718600",
                            },
                        },
                        {
                            "from": "1941-01-01T00:00:00Z",
                            "to": "9999-01-01T00:00:00Z",
                            "value": {
                                "elevation(masl/hs)": "94",
                                "latitude": "59.942300",
                                "longitude": "10.720000",
                            },
                        },
                    ]
                },
                "timeseries": {"timeoffset": "PT0H", "timeresolution": resolution},
            },
        },
        "observations": [
            {"time": t, "body": {"qualitycode": "0", "value": v}} for t, v in obs
        ],
    }


FIXTURE = {
    "data": {
        "tstype": "met.no/filter",
        "tseries": [
            _series(
                18700,
                "PT1H",
                [
                    ("2023-06-26T12:00:00Z", "27.3999996"),
                    ("2023-06-26T13:00:00Z", "25.7999992"),
                    ("2023-06-26T14:00:00Z", "26"),
                ],
            ),
            # declared PT10M != requested PT1H → silently skipped (P4)
            _series(99999, "PT10M", [("2023-06-26T12:00:00Z", "1.0")]),
            # declared garbage → skipped, never an error
            _series(88888, "gibberish", [("2023-06-26T12:00:00Z", "2.0")]),
        ],
    }
}

START = dt.datetime(2023, 6, 26, 12)
END = dt.datetime(2023, 6, 26, 14)


def test_build_params_one_and_widening():
    p = frost.build_params(
        "air_temperature", START, END, PT1H,
        space_kind="one", ids=["18700"], num_leading=1, num_trailing=2,
    )
    assert p["stationids"] == "18700"
    assert p["elementids"] == "air_temperature"
    assert p["incobs"] == "true"
    assert p["geopostype"] == "stationary"
    # widened by 1 leading + 2 trailing hours, +1s exclusive end (fetch.rs:199-209)
    assert p["time"] == "2023-06-26T11:00:00Z/2023-06-26T16:00:01Z"


def test_build_params_polygon_format():
    p = frost.build_params(
        "air_temperature", START, END, PT1H,
        space_kind="polygon", polygon=[(59.9, 10.7), (60.1, 10.9), (59.8, 11.0)],
    )
    # parse_polygon twin (fetch.rs:60-75): compact, no spaces
    assert p["polygon"] == '[{"lat":59.9,"lon":10.7},{"lat":60.1,"lon":10.9},{"lat":59.8,"lon":11.0}]'


def test_build_params_all_rejected():
    with pytest.raises(ValueError, match="time out"):
        frost.build_params("air_temperature", START, END, PT1H, space_kind="all")


def test_parse_resolution_filter_and_location_selection():
    rows = frost.parse_frost_response(FIXTURE, PT1H, START)
    assert {r[0] for r in rows} == {"18700"}  # mismatched series skipped
    assert len(rows) == 3
    sid, ts, val, lat, lon, elev = rows[0]
    assert ts == dt.datetime(2023, 6, 26, 12)
    assert abs(val - 27.3999996) < 1e-6
    # 2023 falls in the 1941-9999 location interval (util.rs extract_location)
    assert (lat, lon, elev) == (59.9423, 10.72, 94.0)


def test_strict_alignment_misalignment_error():
    bad = {
        "data": {
            "tseries": [
                _series(18700, "PT1H", [("2023-06-26T12:30:00Z", "5.0")])
            ]
        }
    }
    with pytest.raises(ValueError, match="Misalignment"):
        frost.parse_frost_response(bad, PT1H, START, strict_alignment=True)
    # default: quarantine downstream, not abort (SPEC.md divergence)
    assert len(frost.parse_frost_response(bad, PT1H, START)) == 1


def test_missing_data_field_errors():
    with pytest.raises(ValueError, match="tseries"):
        frost.parse_frost_response({"nope": 1}, PT1H, START)


def test_connector_end_to_end_spark(spark):
    seen = {}

    def transport(url, params):
        seen["url"], seen["params"] = url, params
        return FIXTURE

    conn = frost.FrostConnector(spark, "air_temperature", transport=transport)
    df = conn.fetch(START, END, PT1H, space_kind="one", ids=["18700"])
    got = sorted((r.station_id, r.ts, round(r.value, 4)) for r in df.collect())
    assert got == [
        ("18700", dt.datetime(2023, 6, 26, 12), 27.4),
        ("18700", dt.datetime(2023, 6, 26, 13), 25.8),
        ("18700", dt.datetime(2023, 6, 26, 14), 26.0),
    ]
    assert seen["url"] == frost.FROST_URL
    assert seen["params"]["stationids"] == "18700"
    # the result plugs straight into grid_fill (the reference's alignment)
    from rove_spark.operators.gridfill import grid_fill

    g = grid_fill(df, PT1H, series_col="station_id", keep_cols=["value"], anchor="series")
    assert g.count() == 3 and g.filter("is_gap").count() == 0

    # DataSwitch registration (S2 integration)
    from rove_spark.sources.switch import DataSwitch

    sw = DataSwitch()
    sw.register(
        "frost", conn.as_source(start=START, end=END, resolution=PT1H,
                                space_kind="one", ids=["18700"])
    )
    assert sw.fetch("frost", series_col="station_id").count() == 3
