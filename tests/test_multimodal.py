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


def test_decode_real_boundary_is_explicit(spark, assets):
    """decode_real never silently falls back to the stub: kinds whose
    probed decoder is absent raise at execution (image: no PIL here)."""
    if multimodal.DECODER_CAPS["image"]:
        pytest.skip("PIL present — image decode is real here")
    imgs = assets.filter(F.col("kind") == "image")
    with pytest.raises(Exception, match="real image decode unavailable"):
        multimodal.decode_assets(imgs, decode_real=True).collect()


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


# ------------------------- real-decode capability path (round 3) --------


def _wav_bytes(samples, sample_rate=16000):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_real_audio_decode_end_to_end(spark):
    """decode_real=True genuinely decodes PCM WAV (stdlib wave — no
    external libs): samples round-trip exactly, padding zero-fills."""
    from rove_spark.operators.multimodal import decode_assets

    s1 = [100, -200, 300, -400, 500]
    s2 = list(range(-50, 50))
    df = spark.createDataFrame(
        [("a1", "audio", bytearray(_wav_bytes(s1))),
         ("a2", "audio", bytearray(_wav_bytes(s2)))],
        "asset_id string, kind string, payload binary",
    )
    got = {r.asset_id: r.decoded for r in decode_assets(df, out_pixels=8, decode_real=True).collect()}
    assert got["a1"] == s1 + [0, 0, 0]  # zero-padded to out_pixels
    assert got["a2"] == s2[:8]


def test_real_decode_missing_capability_raises(spark):
    """Kinds without a probed decoder raise NotImplementedError — never a
    silent fallback to the stub."""
    import pytest

    from rove_spark.operators.multimodal import DECODER_CAPS, decode_assets

    if DECODER_CAPS["image"]:
        pytest.skip("PIL present — image decode is real here")
    df = spark.createDataFrame(
        [("i1", "image", bytearray(b"\x89PNG fake"))],
        "asset_id string, kind string, payload binary",
    )
    with pytest.raises(Exception, match="real image decode unavailable"):
        decode_assets(df, out_pixels=8, decode_real=True).collect()


def test_real_image_decode_when_pil_present(spark):
    """Exercised only where PIL exists (skip-marked in this container)."""
    import pytest

    PIL = pytest.importorskip("PIL.Image")
    import io

    from rove_spark.operators.multimodal import decode_assets

    img = PIL.new("L", (4, 2))
    img.putdata(list(range(8)))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [("i1", "image", bytearray(buf.getvalue()))],
        "asset_id string, kind string, payload binary",
    )
    got = decode_assets(df, out_pixels=8, decode_real=True).collect()[0].decoded
    assert got == list(range(8))


def test_real_feature_extraction_audio(spark):
    """decode_real feature path: unit-norm, deterministic, right shape."""
    import numpy as np

    from rove_spark.operators.multimodal import extract_features

    df = spark.createDataFrame(
        [("a1", "audio", bytearray(_wav_bytes(list(range(-512, 512)))))],
        "asset_id string, kind string, payload binary",
    )
    out = extract_features(df, dim=16, decode_real=True).collect()
    v = np.array(out[0].feature)
    assert v.shape == (16,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5
