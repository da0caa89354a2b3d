"""Validate service (O4): proto-mirrored request parsing, pipeline
dispatch, per-test streaming, HTTP transport + error-status split
(reference: src/server.rs:41-177, proto/rove.proto)."""

from __future__ import annotations

import datetime as dt
import json
import urllib.error
import urllib.request

import pytest

from rove_spark.config import Pipeline, PipelineStep
from rove_spark.plans.engine import Engine
from rove_spark.service import (
    RoveService,
    ValidateError,
    parse_validate_request,
    serve,
)
from rove_spark.sources.switch import DataSwitch

T0 = dt.datetime(2024, 1, 1)


def _request(**over):
    base = {
        "data_source": "mem",
        "start_time": "2024-01-01T00:00:00Z",
        "end_time": "2024-01-01T01:00:00Z",
        "time_resolution": "PT1M",
        "pipeline": "qc",
    }
    base.update(over)
    return base


# ------------------------------------------------ request parsing (unit) --


def test_parse_request_timestamp_shapes():
    for v in ("2024-01-01T00:00:00Z", {"seconds": 1704067200}, 1704067200):
        req = parse_validate_request(_request(start_time=v))
        assert req["time_spec"].start == T0
    assert parse_validate_request(_request())["time_spec"].resolution.seconds == 60


def test_parse_request_spacespec_oneof():
    assert parse_validate_request(_request(one="conv-7"))["space_spec"].kind == "one"
    p = parse_validate_request(
        _request(polygon=[{"lat": 59.0, "lon": 10.0}, {"lat": 60.0, "lon": 11.0}])
    )
    assert p["space_spec"].kind == "polygon"
    assert parse_validate_request(_request())["space_spec"].kind == "all"
    with pytest.raises(ValidateError, match="oneof"):
        parse_validate_request(_request(one="x", all={}))


def test_parse_request_errors():
    with pytest.raises(ValidateError, match="missing required"):
        parse_validate_request({"data_source": "mem"})
    with pytest.raises(ValidateError, match="invalid ISO-8601"):
        parse_validate_request(_request(time_resolution="garbage"))


# ------------------------------------------------------------ end-to-end --


@pytest.fixture(scope="module")
def service(spark):
    rows = []
    for conv in ("a", "b"):
        for i in range(10):
            # conv 'b' gets a step outlier at i=5
            v = 100.0 if (conv == "b" and i == 5) else 1.0 + i * 0.1
            rows.append((conv, T0 + dt.timedelta(minutes=i), v))
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, value double")
    switch = DataSwitch()
    switch.register("mem", lambda: df)
    pipe = Pipeline(
        name="qc",
        steps=(
            PipelineStep("step_check", "step_check", {"max": 10.0}),
            PipelineStep("range_check", "range_check", {"min": 0.0, "max": 50.0}),
        ),
    )
    engine = Engine(spark, pipelines={"qc": pipe})
    return RoveService(switch, engine)


def test_validate_streams_one_response_per_test(service):
    out = list(service.validate(_request()))
    assert [o["test"] for o in out] == ["step_check", "range_check"]
    step = {(r["identifier"], r["time"]): r["flag"] for r in out[0]["results"]}
    rng = {(r["identifier"], r["time"]): r["flag"] for r in out[1]["results"]}
    assert len(step) == 20 and len(rng) == 20
    # the planted outlier: step FAIL at the jump (and back), range FAIL at 100
    assert step[("b", "2024-01-01T00:05:00Z")] == 1
    assert rng[("b", "2024-01-01T00:05:00Z")] == 1
    assert step[("a", "2024-01-01T00:05:00Z")] == 0


def test_validate_spacespec_one_filters(service):
    out = list(service.validate(_request(one="a")))
    assert all(r["identifier"] == "a" for o in out for r in o["results"])


def test_validate_unknown_source_and_pipeline(service):
    with pytest.raises(ValidateError, match="InvalidDataSource"):
        list(service.validate(_request(data_source="nope")))
    with pytest.raises(ValidateError, match="TestNotInPipelines"):
        list(service.validate(_request(pipeline="nope")))


def test_http_transport_ndjson_stream(service):
    server = serve(service)
    try:
        host, port = server.server_address
        req = urllib.request.Request(
            f"http://{host}:{port}/validate",
            data=json.dumps(_request()).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.headers["Content-Type"] == "application/x-ndjson"
            lines = [json.loads(x) for x in resp.read().decode().splitlines() if x]
        assert [x["test"] for x in lines] == ["step_check", "range_check"]
        assert all(len(x["results"]) == 20 for x in lines)
        # proto enum domain
        assert {r["flag"] for x in lines for r in x["results"]} <= set(range(7))

        # error-status split: 404 unknown pipeline, 400 bad duration
        for body, code in [
            (_request(pipeline="nope"), 404),
            (_request(data_source="nope"), 404),
            (_request(time_resolution="garbage"), 400),
        ]:
            r = urllib.request.Request(
                f"http://{host}:{port}/validate", data=json.dumps(body).encode()
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(r)
            assert ei.value.code == code
    finally:
        server.shutdown()


def test_backing_sources_help_but_are_not_qced(service, spark):
    """proto field 2: backing-source rows ride through the pipeline (QC
    context) but never appear in the results."""
    extra = spark.createDataFrame(
        [("zz", T0 + dt.timedelta(minutes=i), 2.0) for i in range(10)],
        "conv_id string, ts timestamp, value double",
    )
    service.switch.register("aux", lambda: extra)
    out = list(service.validate(_request(backing_sources=["aux"])))
    idents = {r["identifier"] for o in out for r in o["results"]}
    assert idents == {"a", "b"}  # 'zz' contributed context, was not QCed
    assert all(len(o["results"]) == 20 for o in out)


def test_overlapping_backing_series_become_separate_context(service, spark):
    """A backing source carrying the SAME series id as the primary must
    become a separate namespaced context series — never interleave
    duplicate timestamps into the primary's windows or duplicate its
    result rows."""
    dup = spark.createDataFrame(
        [("a", T0 + dt.timedelta(minutes=i), 50.0) for i in range(10)],
        "conv_id string, ts timestamp, value double",
    )
    service.switch.register("dup_src", lambda: dup)
    out = list(service.validate(_request(backing_sources=["dup_src"])))
    base = list(service.validate(_request()))
    # primary flags identical to the no-backing run; no duplicated rows
    for o, b in zip(out, base):
        got = sorted((r["identifier"], r["time"], r["flag"]) for r in o["results"])
        want = sorted((r["identifier"], r["time"], r["flag"]) for r in b["results"])
        assert got == want


def test_malformed_timestamp_and_backing_schema_are_400s(service, spark):
    import pytest

    from rove_spark.service import ValidateError

    with pytest.raises(ValidateError, match="unparseable timestamp"):
        list(service.validate(_request(start_time="yesterday")))
    with pytest.raises(ValidateError, match="unparseable timestamp"):
        list(service.validate(_request(start_time={"seconds": "abc"})))
    with pytest.raises(ValidateError, match="malformed polygon"):
        list(service.validate(_request(polygon=[{"latitude": 1.0}])))
    bad = spark.createDataFrame([("x", T0)], "conv_id string, ts timestamp")
    service.switch.register("badcols", lambda: bad)
    with pytest.raises(ValidateError, match="schema mismatch"):
        list(service.validate(_request(backing_sources=["badcols"])))
