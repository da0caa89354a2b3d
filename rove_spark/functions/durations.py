"""ISO-8601 duration parsing → calendar-aware grid periods.

Reference behavior: hand-rolled ISO-8601 duration parser used for the time
grid period, calendar-aware so month-length steps work
(``/root/reference/met_connectors/src/frost/duration.rs:57-69``; also
``src/data_switch.rs:96-106``). We parse the same grammar into a
``Duration(months, seconds)`` pair; fixed-length components fold into
seconds, calendar components (Y/M) into months — mirroring
``chronoutil::RelativeDuration`` semantics without the crate.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_ISO_RE = re.compile(
    r"^P(?:(?P<years>\d+)Y)?(?:(?P<months>\d+)M)?(?:(?P<weeks>\d+)W)?"
    r"(?:(?P<days>\d+)D)?"
    r"(?:T(?:(?P<hours>\d+)H)?(?:(?P<minutes>\d+)M)?(?:(?P<seconds>\d+)S)?)?$"
)


@dataclass(frozen=True)
class Duration:
    """Calendar-aware duration: whole months + fixed seconds."""

    months: int = 0
    seconds: int = 0

    @property
    def is_calendar(self) -> bool:
        return self.months != 0

    def interval_sql(self) -> str:
        """Spark SQL interval expression usable inside ``sequence()``.
        Mixed month+second periods compose via make_interval — the
        RelativeDuration semantics of the reference parser
        (``frost/duration.rs:67-69``): step = +months calendar shift,
        then +seconds."""
        if self.months and self.seconds:
            return f"make_interval(0, {self.months}, 0, 0, 0, 0, {self.seconds})"
        if self.months:
            return f"INTERVAL {self.months} MONTH"
        return f"INTERVAL {self.seconds} SECOND"

    def __str__(self) -> str:  # pragma: no cover - debug aid
        return f"Duration(months={self.months}, seconds={self.seconds})"


def resolution_matches(col, want: Duration):
    """Catalyst predicate: does the ISO-8601 duration string in ``col``
    semantically equal ``want`` (PT1H ≡ PT60M ≡ PT3600S)? Mirrors
    ``parse_iso8601`` exactly — same grammar, unparseable/NULL/bare-P
    declarations are a mismatch — but runs as pure column expressions
    (regexp_extract + arithmetic, whole-stage codegen), so the P4 filter
    is a single-pass pushable predicate instead of a driver-side
    distinct-collect over the input (round-2 verdict item 5)."""
    from pyspark.sql import functions as F

    pat = (
        r"^P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?"
        r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?)?$"
    )
    s = F.trim(col)

    def comp(i: int):
        # components longer than 12 digits go to NULL (mismatch), never
        # into arithmetic: Spark 4 ANSI mode aborts the WHOLE query on
        # long overflow, and the hazard isn't only the cast (>19 digits)
        # but the unit scaling after it — 1e15 weeks * 604800 overflows a
        # long that the cast accepted. ≤12 digits caps the summed seconds
        # at ~5·10¹⁸ < 2⁶³; NULL propagates to a false comparison, which
        # is the old driver-side parse's "unparseable == mismatch".
        g = F.regexp_extract(s, pat, i)
        return F.when(g == "", F.lit(0)).when(F.length(g) <= 12, g.cast("long"))

    months = comp(1) * 12 + comp(2)
    seconds = (
        comp(3) * 604800 + comp(4) * 86400 + comp(5) * 3600 + comp(6) * 60 + comp(7)
    )
    valid = s.rlike(pat) & ~s.isin("P", "PT")  # ≥1 component required
    return (
        valid
        & (months == F.lit(want.months))
        & (seconds == F.lit(want.seconds))
    )


def parse_rfc3339(s: str):
    """RFC3339 string → naive UTC datetime. Normalizes ANY offset through
    astimezone(UTC) before stripping tzinfo — a bare ``.replace(tzinfo=
    None)`` silently shifts non-UTC offsets ("+01:00") by their offset
    (round-3 review: the idiom was copy-pasted four times; one helper,
    one fix)."""
    import datetime as dt

    t = dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    if t.tzinfo is not None:
        t = t.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return t


def parse_iso8601(s: str) -> Duration:
    """Parse e.g. ``PT1H`` → Duration(0, 3600); ``P1M`` → Duration(1, 0).

    Grammar and error behavior mirror the reference parser
    (``frost/duration.rs:57-69``): empty/garbage input is an error.
    """
    m = _ISO_RE.match(s.strip())
    if not m or s.strip() in ("P", "PT"):
        raise ValueError(f"invalid ISO-8601 duration: {s!r}")
    parts = {k: int(v) for k, v in m.groupdict().items() if v is not None}
    if not parts:
        raise ValueError(f"invalid ISO-8601 duration: {s!r}")
    months = parts.get("years", 0) * 12 + parts.get("months", 0)
    seconds = (
        parts.get("weeks", 0) * 7 * 86400
        + parts.get("days", 0) * 86400
        + parts.get("hours", 0) * 3600
        + parts.get("minutes", 0) * 60
        + parts.get("seconds", 0)
    )
    return Duration(months=months, seconds=seconds)
