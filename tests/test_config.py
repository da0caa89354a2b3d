"""Pipeline TOML loading — mirrors the reference's config deserialization
test (``/root/reference/src/pipeline.rs:190-201``) and the leading/trailing
derivation (``pipeline.rs:48-62,147-155``)."""

import pytest

from rove_spark.config import load_pipelines, parse_pipeline

SAMPLE = """
[[step]]
name = "special_values_check"
[step.special_value_check]
special_values = [-999999.0, -6999.0, -99.9]

[[step]]
name = "range_check"
[step.range_check]
max = 50.0
min = -55.0

[[step]]
name = "climate_range_check"
[step.range_check_dynamic]
source = "netcdf"

[[step]]
name = "step_check"
[step.step_check]
max = 18.6

[[step]]
name = "flatline_check"
[step.flatline_check]
max = 10

[[step]]
name = "spike_check"
[step.spike_check]
max = 18.6
"""


def test_parse_sample_pipeline():
    p = parse_pipeline("TA_PT1H", SAMPLE)
    assert [s.name for s in p.steps] == [
        "special_values_check",
        "range_check",
        "climate_range_check",
        "step_check",
        "flatline_check",
        "spike_check",
    ]
    # display name is arbitrary; nested key selects the check type
    assert p.steps[2].check == "range_check_dynamic"
    # leading/trailing: step (1,0), spike (1,1), flatline (max,0) → fold max
    assert p.num_leading_required == 10
    assert p.num_trailing_required == 1


def test_unknown_check_rejected():
    bad = """
[[step]]
name = "mystery"
[step.frobnicate]
x = 1
"""
    with pytest.raises(ValueError, match="unknown check"):
        parse_pipeline("bad", bad)


def test_test_prefix_allowed():
    ok = """
[[step]]
name = "test_hook"
[step.frobnicate]
x = 1
"""
    p = parse_pipeline("ok", ok)
    assert p.steps[0].check == "frobnicate"


def test_load_dir(tmp_path):
    (tmp_path / "a.toml").write_text(SAMPLE)
    (tmp_path / "b.toml").write_text("")
    ps = load_pipelines(tmp_path)
    assert set(ps) == {"a", "b"}
    assert ps["b"].steps == ()


def test_ta_pt1h_parity_pipeline():
    """The shipped TA_PT1H twin loads with the reference's derived
    (leading, trailing) = (10, 1) and 7 steps."""
    ps = load_pipelines("pipelines")
    ta = ps["ta_pt1h"]
    assert len(ta.steps) == 7
    assert ta.steps[2].name == "climate_range_check"
    assert ta.steps[2].check == "range_check_dynamic"
    assert ta.num_leading_required == 10
    assert ta.num_trailing_required == 1
