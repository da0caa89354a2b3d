"""Frost REST connector (S3) — the reference's remote-API source,
re-expressed Spark-first with an INJECTABLE transport.

Reference semantics (``/root/reference/met_connectors/src/frost/``):
- request marshalling (``fetch.rs:162-229``): stationids / polygon query
  param from the SpaceSpec (All is an error — frost would time out),
  elementids from extra_spec, incobs=true, geopostype=stationary, and a
  time range widened by num_leading/num_trailing·resolution with +1 s on
  the (exclusive) end;
- response parsing (``fetch.rs:7-58`` + ``util.rs``): data.tseries[];
  per series the DECLARED timeresolution
  (header.extra.timeseries.timeresolution) must semantically equal the
  requested one or the series is silently skipped (the P4 filter);
  station id from header.id.stationid; (lat, lon, elev) from the
  station.location interval covering the request start;
- alignment (``fetch.rs:86-148``): obs must sit on the
  ``interval_start + k·period`` grid; the reference hard-errors
  ("Misalignment") — here ``strict_alignment=True`` reproduces that
  error, the default routes rows downstream where ``find_misaligned``
  quarantines them (SPEC.md divergence: a batch engine quarantines,
  never aborts).

Transport injection: ``transport(url, params) -> dict`` — production
would pass an HTTP client; this sandbox has no network, so tests inject
fixture transports and every layer ABOVE the socket (param marshalling,
JSON parsing, resolution filter, location selection, alignment contract,
DataFrame assembly) is fully exercised. The response is request-scoped
and small (the reference parses it on one node too, fetch.rs:7-58);
Spark-side distribution starts at the returned DataFrame.
"""

from __future__ import annotations

import datetime as dt
import json
import urllib.parse
import urllib.request
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rove_spark.functions.durations import Duration, parse_iso8601, parse_rfc3339

FROST_URL = "https://frost-beta.met.no/api/v1/obs/met.no/filter/get"

FROST_SCHEMA = (
    "station_id string, ts timestamp, value float, "
    "lat double, lon double, elev double"
)


def _urllib_transport(url: str, params: dict) -> dict:  # pragma: no cover
    """Default transport (requires network): GET url?params → parsed JSON."""
    with urllib.request.urlopen(f"{url}?{urllib.parse.urlencode(params)}") as r:
        return json.load(r)


def format_polygon(vertices) -> str:
    """``parse_polygon`` twin (``fetch.rs:60-75``): compact JSON-ish
    [{"lat":..,"lon":..},...] string, no spaces."""
    return "[" + ",".join(
        f'{{"lat":{lat},"lon":{lon}}}' for lat, lon in vertices
    ) + "]"


def _rfc3339(t: dt.datetime) -> str:
    # aware inputs convert to UTC before the bare strip (mirrors
    # parse_rfc3339) — naive inputs are taken as already-UTC
    if t.tzinfo is not None:
        t = t.astimezone(dt.timezone.utc)
    return t.replace(tzinfo=None).isoformat(timespec="seconds") + "Z"


def build_params(
    element_id: str,
    start: dt.datetime,
    end: dt.datetime,
    resolution: Duration,
    space_kind: str = "all",
    ids=(),
    polygon=(),
    num_leading: int = 0,
    num_trailing: int = 0,
) -> dict:
    """Query-param marshalling, mirroring ``fetch_data_inner``
    (``fetch.rs:183-211``): the remote query itself is widened by the
    context points and one second is added to the end (frost's range end
    is exclusive)."""
    if space_kind == "one":
        if len(ids) != 1:
            raise ValueError("frost SpaceSpec::One takes exactly one station id")
        extra = ("stationids", str(ids[0]))
    elif space_kind == "polygon":
        extra = ("polygon", format_polygon(polygon))
    elif space_kind == "all":
        # fetch.rs:189-191: frost would time out on an unbounded query
        raise ValueError("space_spec for frost cannot be 'all', as frost will time out")
    else:
        raise ValueError(f"unknown SpaceSpec kind: {space_kind}")
    if resolution.is_calendar:
        raise ValueError("frost context widening over calendar periods unsupported")
    sec = resolution.seconds
    widened_start = start - dt.timedelta(seconds=sec * num_leading)
    widened_end = end + dt.timedelta(seconds=sec * num_trailing) + dt.timedelta(seconds=1)
    return dict(
        [
            extra,
            ("elementids", element_id),
            ("incobs", "true"),
            ("time", f"{_rfc3339(widened_start)}/{_rfc3339(widened_end)}"),
            ("geopostype", "stationary"),
        ]
    )


def _pick_location(locations: list, when: dt.datetime) -> tuple[float, float, float]:
    """``util.rs extract_location``: the interval with from < when < to
    (strict, like the reference); keys are frost's string-typed fields."""
    for loc in locations:
        frm = parse_rfc3339(loc["from"])
        to = parse_rfc3339(loc["to"])
        if frm < when < to:
            v = loc["value"]
            return (
                float(v["latitude"]),
                float(v["longitude"]),
                float(v["elevation(masl/hs)"]),
            )
    raise ValueError("couldn't find relevant location for this observation")


def parse_frost_response(
    resp: dict,
    requested_resolution: Duration,
    interval_start: dt.datetime,
    strict_alignment: bool = False,
) -> list[tuple]:
    """Pure-python response → rows [(station_id, ts, value, lat, lon,
    elev)]. Mirrors ``extract_data`` (``fetch.rs:7-58``): series whose
    declared timeresolution is missing/unparseable/semantically different
    are SKIPPED; values are f32 strings (``FrostObsBody``). With
    ``strict_alignment`` the reference's Misalignment error is raised for
    off-grid observations (``fetch.rs:104-137``)."""
    try:
        tseries = resp["data"]["tseries"]
    except (KeyError, TypeError) as e:
        raise ValueError(f"couldn't find data/tseries field on response: {e}") from e
    rows: list[tuple] = []
    sec = requested_resolution.seconds
    for ts in tseries:
        header = ts.get("header", {})
        declared = (
            header.get("extra", {}).get("timeseries", {}).get("timeresolution")
        )
        try:
            if declared is None or parse_iso8601(declared) != requested_resolution:
                continue  # fetch.rs:31-37 — silently skip mismatched series
        except ValueError:
            continue
        station_id = str(header["id"]["stationid"])
        lat, lon, elev = _pick_location(
            header["extra"]["station"]["location"], interval_start
        )
        for obs in ts.get("observations", []):
            t = parse_rfc3339(obs["time"])
            if strict_alignment and sec:
                off = (t - interval_start).total_seconds()
                if off % sec != 0:
                    raise ValueError(
                        "Misalignment: obs misaligned with series "
                        f"(station {station_id} at {t.isoformat()})"
                    )
            rows.append((station_id, t, float(obs["body"]["value"]), lat, lon, elev))
    return rows


class FrostConnector:
    """S3 connector: ``fetch`` marshals the request, runs the (injected)
    transport, parses the response and returns a Spark DataFrame of
    observation rows ready for ``grid_fill``/QC. Registerable on a
    DataSwitch via ``as_source`` (specs are then pre-applied remote-side,
    the switch's own predicates are no-op-cheap on the result)."""

    def __init__(
        self,
        spark: SparkSession,
        element_id: str,
        transport: Callable[[str, dict], dict] | None = None,
        url: str = FROST_URL,
    ) -> None:
        self.spark = spark
        self.element_id = element_id
        self.transport = transport or _urllib_transport
        self.url = url

    def fetch(
        self,
        start: dt.datetime,
        end: dt.datetime,
        resolution: Duration,
        space_kind: str = "one",
        ids=(),
        polygon=(),
        num_leading: int = 0,
        num_trailing: int = 0,
        strict_alignment: bool = False,
    ) -> DataFrame:
        params = build_params(
            self.element_id,
            start,
            end,
            resolution,
            space_kind=space_kind,
            ids=ids,
            polygon=polygon,
            num_leading=num_leading,
            num_trailing=num_trailing,
        )
        resp = self.transport(self.url, params)
        rows = parse_frost_response(
            resp, resolution, start, strict_alignment=strict_alignment
        )
        return self.spark.createDataFrame(rows, FROST_SCHEMA)

    def as_source(self, **fetch_kwargs) -> Callable[[], DataFrame]:
        """Zero-arg source for DataSwitch.register."""
        return lambda: self.fetch(**fetch_kwargs)
