"""Signal derivation: transcript rows → per-turn float32 QC signals.

The reference QCs ``Option<f32>`` observation values
(``/root/reference/src/data_switch.rs:145``). For transcripts the observed
"values" are derived per-turn signals (SURVEY §1.4): ``text_len`` (float32),
``is_tool_call`` (0/1 float32). Kept float32 end-to-end to preserve the
reference's f32 comparison semantics.

The ``text`` column itself is carried through untouched — the per-row
invariant (BASELINE.json input_hint) requires byte-identical text under
stable (conv_id, turn_idx) ordering, so no stage ever rewrites it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def derive_signals(df: DataFrame) -> DataFrame:
    """Append float32 signal columns; pure projection (no shuffle)."""
    return df.withColumns(
        {
            "text_len": F.length("text").cast("float"),
            "is_tool_call": F.col("tool").isNotNull().cast("float"),
        }
    )
