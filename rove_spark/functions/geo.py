"""Geo predicates as pure column expressions.

Reference space model: ``GeoPoint``/``Polygon``/``SpaceSpec``
(``/root/reference/src/data_switch.rs:110-131``); the polygon is only ever
serialized and pushed to the remote API (``frost/fetch.rs:60-75,184-190``).
We evaluate it *in the engine*: ray-casting point-in-polygon unrolled into
a boolean XOR chain over the (static, small) vertex list — whole-stage
codegen, no UDF, pushable through Catalyst like any predicate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def point_in_polygon(
    x: Column | str, y: Column | str, polygon: Sequence[tuple[float, float]]
) -> Column:
    """Ray-casting test (odd crossings ⇒ inside). Boundary points follow
    the standard half-open convention. ``polygon`` is a static vertex list
    — each edge becomes one codegen'd term, so keep it small (10s of
    vertices, the reference's use case)."""
    if len(polygon) < 3:
        raise ValueError("polygon needs ≥ 3 vertices")
    px = F.col(x) if isinstance(x, str) else x
    py = F.col(y) if isinstance(y, str) else y
    inside = F.lit(False)
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        crosses = ((F.lit(y1) > py) != (F.lit(y2) > py)) & (
            px
            < (F.lit(x2) - F.lit(x1)) * (py - F.lit(y1)) / (F.lit(y2) - F.lit(y1))
            + F.lit(x1)
        )
        inside = inside != crosses  # boolean XOR accumulates crossings
    return inside


def point_in_polygon_sql(x_expr: str, y_expr: str, polygon: Sequence[tuple[float, float]]) -> str:
    """The IDENTICAL ray-cast as a SQL expression string (for oracle
    parity: same operand tree ⇒ same doubles ⇒ same booleans)."""
    terms = []
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        terms.append(
            f"((({y1} > {y_expr}) <> ({y2} > {y_expr})) AND "
            f"({x_expr} < ({x2} - {x1}) * ({y_expr} - {y1}) / ({y2} - {y1}) + {x1}))"
        )
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} <> {t})"
    return out
