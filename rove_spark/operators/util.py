"""Shared physical-plan helpers for grouped-UDF stages."""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallel_groups(df: DataFrame, *keys: str, factor: int = 2) -> DataFrame:
    """Explicitly hash-partition on the group keys before a grouped pandas
    UDF. AQE's partition coalescing sizes shuffles by *bytes*, which is
    right for JVM relational operators but wrong for grouped UDFs whose
    per-group CPU cost dwarfs their byte size (e.g. an OI factorization
    over a 50 KB group takes ~1 s) — coalescing serializes the stage onto
    one Python worker (measured 5× slowdown on the SCT stage). A
    user-specified repartition pins the exchange; groupBy reuses it because
    hash(keys) already satisfies the required clustering."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism * factor, *keys)
