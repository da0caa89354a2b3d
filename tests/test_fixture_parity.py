"""FIXTURES.md parity cases that map 1:1 onto the reference's own test
inputs: the TestDataSource spatial constellation (F4), the hardcoded
4-step pipeline (F5), and f32 codec edge values (F7)."""

from __future__ import annotations

import numpy as np

from rove_spark.config import load_pipelines
from rove_spark.model import Flag
from rove_spark.operators import gorilla, spatial


def test_reference_spatial_constellation_uniform():
    """F4 / reference TestDataSource (``src/lib.rs:186-209``): 1,000
    stations at lat_i=(i²·0.001) mod 3, lon_i=((i+1)²·0.001) mod 3 (offset
    into our box), constant value 1.0, reference buddy params
    (``lib.rs:230-239``: radius 5000, nums_min 2, threshold 2,
    num_iterations 2) ⇒ every flag uniformly PASS or ISOLATED — the
    reference integration test's exact assertion
    (``tests/integration_test.rs:105-114``)."""
    n = 1000
    i = np.arange(n, dtype=np.float64)
    lat = 58.0 + np.mod(i * i * 0.001, 3.0)
    lon = 8.0 + np.mod((i + 1) * (i + 1) * 0.001, 3.0)
    values = np.full(n, 1.0)
    flags = spatial.buddy_check_kernel(
        values, lat, lon, np.zeros(n),
        radius=5000.0, num_min=2, threshold=2.0, num_iterations=2,
    )
    assert set(flags) <= {Flag.PASS, Flag.ISOLATED}
    assert (flags == Flag.PASS).sum() > 0

    sct_flags = spatial.sct_kernel(values, lat, lon, np.zeros(n), num_min=5)
    assert set(sct_flags) <= {Flag.PASS, Flag.ISOLATED}


def test_reference_spatial_outlier():
    """F4 outlier case: one deviant among ≥ nums_min buddies → FAIL."""
    n = 50
    i = np.arange(n, dtype=np.float64)
    lat = 60.0 + i * 0.0001
    lon = 10.0 + (i % 7) * 0.0001
    values = np.full(n, 1.0)
    values[17] = 100.0
    flags = spatial.buddy_check_kernel(
        values, lat, lon, np.zeros(n),
        radius=5000.0, num_min=2, threshold=2.0, num_iterations=2,
    )
    assert flags[17] == Flag.FAIL
    assert all(f == Flag.PASS for j, f in enumerate(flags) if j != 17)


def test_hardcoded_pipeline_leading_trailing():
    """F5: the hardcoded fresh pipeline derives (leading, trailing) =
    (1, 1) — element-wise max over step(1,0)/spike(1,1)/buddy(0,0)/sct(0,0)
    (``pipeline.rs:48-62,147-155``)."""
    pipes = load_pipelines("pipelines")
    hard = pipes["hardcoded_fresh"]
    assert [s.check for s in hard.steps] == [
        "step_check", "spike_check", "buddy_check", "sct",
    ]
    assert hard.num_leading_required == 1
    assert hard.num_trailing_required == 1
    # TA-style pipeline folds to (10, 1) via flatline max=10
    assert pipes["transcripts_pt1m"].num_leading_required == 10
    assert pipes["transcripts_pt1m"].num_trailing_required == 1


def test_codec_f32_edge_values():
    """F7: ±0, subnormals, f32 max/min, inf, NaN round-trip bit-exactly."""
    edge = np.array(
        [
            0.0, -0.0,
            np.float32(1.4e-45),  # smallest subnormal
            -np.float32(1.4e-45),
            np.finfo(np.float32).tiny,  # smallest normal
            np.finfo(np.float32).max,
            -np.finfo(np.float32).max,
            np.float32("inf"), np.float32("-inf"), np.float32("nan"),
            1.0, -1.0,
        ],
        dtype=np.float32,
    )
    got = gorilla.decode_values(gorilla.encode_values(edge))
    np.testing.assert_array_equal(got.view(np.uint32), edge.view(np.uint32))

    # linear ramp + random walk (F7 shapes)
    ramp = np.arange(0, 100, 0.5, dtype=np.float32)
    np.testing.assert_array_equal(gorilla.decode_values(gorilla.encode_values(ramp)), ramp)
    rng = np.random.default_rng(9)
    walk = np.cumsum(rng.normal(0, 1, 500)).astype(np.float32)
    np.testing.assert_array_equal(gorilla.decode_values(gorilla.encode_values(walk)), walk)
