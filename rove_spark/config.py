"""Pipeline configuration: typed check configs + TOML loader.

Mirrors the reference's pipeline layer (``/root/reference/src/pipeline.rs``):
- one TOML file per pipeline, keyed by filename sans extension
  (``pipeline.rs:157-174``);
- each ``[[step]]`` has a display ``name`` plus exactly one nested check
  table whose *key* selects the check type (``pipeline.rs:13-46``; e.g.
  ``sample_pipelines/fresh/TA_PT1H.toml`` names range_check_dynamic
  "climate_range_check");
- leading/trailing context requirements are derived per check and folded
  with element-wise max across steps (``pipeline.rs:48-62,147-155``).

In Spark the derived (leading, trailing) no longer drive a widened data
fetch — window frames provide context — but they still define which edge
points get INCONCLUSIVE (insufficient context) flags, so the derivation is
preserved verbatim.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

# check-type key → (leading, trailing) requirement, per pipeline.rs:48-62:
# step (1,0); spike (1,1); flatline (conf.max, 0); all others (0,0).
_STEP_LEADING = {"step_check": 1, "spike_check": 1}
_STEP_TRAILING = {"spike_check": 1}

KNOWN_CHECKS = frozenset(
    {
        "special_value_check",
        "range_check",
        "range_check_dynamic",
        "step_check",
        "spike_check",
        "flatline_check",
        "buddy_check",
        "sct",
        "model_consistency_check",
    }
)


@dataclass(frozen=True)
class PipelineStep:
    """One configured step: display name + check type + raw params.

    Reference: ``pipeline.rs:22-30`` (name + flattened CheckConf enum).
    """

    name: str
    check: str
    params: dict[str, Any] = field(default_factory=dict)

    @property
    def leading(self) -> int:
        if self.check == "flatline_check":
            return int(self.params.get("max", 0))
        return _STEP_LEADING.get(self.check, 0)

    @property
    def trailing(self) -> int:
        return _STEP_TRAILING.get(self.check, 0)


@dataclass(frozen=True)
class Pipeline:
    name: str
    steps: tuple[PipelineStep, ...]

    @property
    def num_leading_required(self) -> int:
        """Element-wise max across steps (``pipeline.rs:147-151``)."""
        return max((s.leading for s in self.steps), default=0)

    @property
    def num_trailing_required(self) -> int:
        return max((s.trailing for s in self.steps), default=0)


def _parse_step(raw: dict[str, Any], extra_checks: frozenset = frozenset()) -> PipelineStep:
    name = raw.get("name")
    if not name:
        raise ValueError(f"pipeline step missing 'name': {raw}")
    check_keys = [k for k in raw if k != "name"]
    if len(check_keys) != 1:
        raise ValueError(f"step {name!r} must have exactly one check table, got {check_keys}")
    check = check_keys[0]
    if check not in KNOWN_CHECKS and check not in extra_checks and not name.startswith("test"):
        # reference returns InvalidTestName for unknown non-test checks
        # at dispatch time (harness.rs:169-177); we fail at load time.
        # ``extra_checks``: homebrew check types registered on the Engine
        # (the researcher-written-test design goal, docs/language.md:5,
        # which rove left a closed enum — pipeline.rs:32-46).
        raise ValueError(f"unknown check type {check!r} in step {name!r}")
    return PipelineStep(name=name, check=check, params=dict(raw[check]))


def parse_pipeline(name: str, text: str, extra_checks: frozenset = frozenset()) -> Pipeline:
    doc = tomllib.loads(text)
    steps = tuple(_parse_step(s, extra_checks) for s in doc.get("step", []))
    return Pipeline(name=name, steps=steps)


def load_pipelines(
    directory: str | Path, extra_checks: frozenset = frozenset()
) -> dict[str, Pipeline]:
    """Load every ``*.toml`` in a directory (``pipeline.rs:160-188``)."""
    out: dict[str, Pipeline] = {}
    for p in sorted(Path(directory).glob("*.toml")):
        out[p.stem] = parse_pipeline(p.stem, p.read_text(), extra_checks)
    return out
