"""Multimodal columns: opaque binary payloads + typed metadata, with the
Spark-side plumbing (schemas, Arrow batch shapes, partitioning) real and
tested, and the actual media decoding STUBBED — image/audio libraries are
not in this container.

Contract (per the build brief): every stub is deterministic — a pure
function of the payload bytes — so pipelines exercise realistic data flow
and tests pin exact outputs; swapping in a real decoder (PIL/ffmpeg) only
replaces the marked ``_FAKE_*`` functions. ``decode_real=True`` raises
NotImplementedError at the call site, making the stub boundary explicit.

Schema:
  assets(asset_id string, kind string ∈ {image,audio,video},
         payload binary, meta struct<width int, height int, channels int,
         sample_rate int, n_frames int, duration_ms int>)
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, channels:int, sample_rate:int, "
    "n_frames:int, duration_ms:int>"
)

FEATURE_DIM = 32


def synthetic_assets(
    spark: SparkSession, n: int = 100, seed: int = 11, payload_bytes: int = 256
) -> DataFrame:
    """Deterministic fake assets: payload = repeated sha2 stream of the id;
    metadata derived from id hashes. Column-expression generation (no
    driver loop)."""
    base = spark.range(n).select(
        F.concat(F.lit("asset-"), F.col("id").cast("string")).alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64(F.lit(seed), "id"), 3) + 1).cast("int"),
        ).alias("kind"),
        F.col("id"),
    )
    reps = payload_bytes // 32 + 1
    payload = F.substring(
        F.concat(*[F.unhex(F.sha2(F.concat(F.col("asset_id"), F.lit(i)), 256)) for i in range(reps)]),
        1,
        payload_bytes,
    )
    h = lambda s, m: F.pmod(F.xxhash64(F.lit(s), F.col("id")), m).cast("int")  # noqa: E731
    return base.select(
        "asset_id",
        "kind",
        payload.alias("payload"),
        F.struct(
            (64 + h(1, 448)).alias("width"),
            (64 + h(2, 448)).alias("height"),
            (1 + h(3, 3)).alias("channels"),
            F.when(F.col("kind") == "audio", 16000).otherwise(F.lit(None).cast("int")).alias(
                "sample_rate"
            ),
            F.when(F.col("kind") == "video", 1 + h(4, 300)).otherwise(F.lit(None).cast("int")).alias(
                "n_frames"
            ),
            (100 + h(5, 60000)).alias("duration_ms"),
        ).alias("meta"),
    )


# ---- deterministic stand-ins for real decoders (STUBS, clearly marked) --


def _fake_decode_bytes(payload: bytes, n_out: int) -> np.ndarray:
    """STUB for media decode: deterministic pseudo-pixels from the payload
    digest. Replace with a real decoder off-sandbox.

    The digest is sha256 of the LOWERCASE-HEX payload (not the raw bytes):
    DuckDB's sha256 is VARCHAR-only, and hashing the hex form lets the
    driver's multimodal query carry an exact cross-engine oracle
    (sha256(lower(hex(payload))) reproduces this in SQL)."""
    d = hashlib.sha256(payload.hex().encode()).digest()
    reps = n_out // len(d) + 1
    return np.frombuffer((d * reps)[:n_out], dtype=np.uint8)


def decode_assets(
    df: DataFrame, out_pixels: int = 64, decode_real: bool = False
) -> DataFrame:
    """payload → fixed-size decoded sample (array<int>), via mapInPandas
    (Arrow batches; one Python crossing for the whole batch). The realistic
    batch shape: binary in, fixed-width array out."""
    import pandas as pd

    if decode_real:
        raise NotImplementedError(
            "real image/audio decoding requires PIL/ffmpeg, absent in this "
            "container — the deterministic stub is the supported path here"
        )

    from rove_spark.operators.util import parallel_groups

    df = parallel_groups(df, "asset_id")

    def run(batches):
        for pdf in batches:
            decoded = [
                _fake_decode_bytes(p, out_pixels).astype("int32").tolist()
                for p in pdf["payload"]
            ]
            out = pdf[["asset_id", "kind"]].copy()
            out["decoded"] = decoded
            yield out

    return df.mapInPandas(run, "asset_id string, kind string, decoded array<int>")


def extract_features(
    df: DataFrame, dim: int = FEATURE_DIM, decode_real: bool = False
) -> DataFrame:
    """payload → unit-norm float feature vector (STUB embedding: hashed
    payload bytes → fixed-dim projection). Output plugs straight into
    ann.py / dedup.embedding_near_dup_pairs — that integration is the
    real deliverable."""
    import pandas as pd

    if decode_real:
        raise NotImplementedError("real feature extraction is stubbed in this container")

    from rove_spark.operators.util import parallel_groups

    df = parallel_groups(df, "asset_id")

    def run(batches):
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                raw = _fake_decode_bytes(p, dim * 4).view(np.uint32).astype(np.float64)
                v = (raw / np.float64(0xFFFFFFFF)) - 0.5
                v /= np.linalg.norm(v) or 1.0
                feats.append(v.astype(np.float32).tolist())
            out = pdf[["asset_id", "kind"]].copy()
            out["feature"] = feats
            yield out

    return df.mapInPandas(run, "asset_id string, kind string, feature array<float>")


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: explode frame indices 0, n, 2n, …
    from metadata (JVM-side); the per-frame decode would attach via
    decode_assets on the exploded rows."""
    vids = df.filter(F.col("kind") == "video")
    idx = F.sequence(
        F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return vids.select(
        "asset_id",
        F.explode(idx).alias("frame_idx"),
        F.col("meta.n_frames").alias("n_frames"),
    )


def resize_meta(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (aspect-preserving) as a pure projection — the
    geometry math is JVM-side; actual pixel resampling is part of the
    stubbed decode."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(1.0), max_side / F.greatest(w, h))
    return df.withColumns(
        {
            "resize_w": F.ceil(w * scale).cast("int"),
            "resize_h": F.ceil(h * scale).cast("int"),
        }
    )
