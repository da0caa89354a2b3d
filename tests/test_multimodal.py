"""Multimodal plumbing: schemas, deterministic stub decode/features,
frame sampling, resize geometry, integration with ANN."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rove_spark.operators import ann, multimodal


@pytest.fixture(scope="module")
def assets(spark):
    return multimodal.synthetic_assets(spark, n=60).cache()


def test_schema_and_determinism(spark, assets):
    kinds = {r.kind for r in assets.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    a = {r.asset_id: bytes(r.payload) for r in assets.collect()}
    b = {
        r.asset_id: bytes(r.payload)
        for r in multimodal.synthetic_assets(spark, n=60).collect()
    }
    assert a == b
    assert all(len(p) == 256 for p in a.values())


def test_decode_stub(spark, assets):
    out = multimodal.decode_assets(assets, out_pixels=64)
    rows = out.collect()
    assert len(rows) == 60
    assert all(len(r.decoded) == 64 for r in rows)
    # deterministic: same asset → same pixels
    again = {r.asset_id: r.decoded for r in multimodal.decode_assets(assets, 64).collect()}
    assert all(again[r.asset_id] == r.decoded for r in rows)


def test_decode_real_is_explicit_stub(spark, assets):
    with pytest.raises(NotImplementedError, match="stub"):
        multimodal.decode_assets(assets, decode_real=True)


def test_features_unit_norm_and_ann_integration(spark, assets):
    feats = multimodal.extract_features(assets)
    rows = feats.collect()
    norms = [float(np.linalg.norm(r.feature)) for r in rows]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)
    # feature table plugs into the ANN operator
    vec_tbl = feats.select(F.col("asset_id").alias("vec_id"), F.col("feature").alias("embedding"))
    q = vec_tbl.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = ann.brute_force_topk(vec_tbl, q, k=1, id_col="vec_id")
    got = {r.query_id: r.vec_id for r in top.collect()}
    assert all(qid == vid for qid, vid in got.items())  # self is nearest


def test_frame_sampling(spark, assets):
    frames = multimodal.sample_frames(assets, every_n=10)
    joined = frames.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n_sampled"), F.max("n_frames").alias("nf")
    )
    for r in joined.collect():
        assert r.n_sampled == (r.nf - 1) // 10 + 1


def test_resize_geometry(spark, assets):
    out = multimodal.resize_meta(assets, max_side=128)
    for r in out.select("meta.width", "meta.height", "resize_w", "resize_h").collect():
        assert max(r.resize_w, r.resize_h) <= 128
        ar_in = r.width / r.height
        ar_out = r.resize_w / r.resize_h
        assert abs(ar_in - ar_out) / ar_in < 0.05  # aspect preserved (±ceil)
