"""Engine orchestration: pipeline config → lazy DataFrame composition →
checkpointed tier writes.

Replaces the reference's scheduler/harness pair (``/root/reference/src/
scheduler.rs:44-74`` sequential step executor + ``src/harness.rs:26``
dispatch): steps compose **lazily** onto one DataFrame — Catalyst sees the
whole pipeline as a single plan, shares the one shuffle that all
window-checks need, and every step reads the same immutable input (flags
never feed back between checks, matching ``scheduler.rs:52-55``).

``run_pipeline`` is the ``validate_direct`` analog (``scheduler.rs:
103-141``): look up the pipeline, compose the stages, return flags.
``run_job`` adds what rove never had: checkpointed, resumable tier
materialization (see checkpoint.py).
"""

from __future__ import annotations

import logging
from collections.abc import Sequence
from datetime import datetime, timedelta
from pathlib import Path
from time import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rove_spark.config import KNOWN_CHECKS, Pipeline, PipelineStep, load_pipelines
from rove_spark.model import Flag, flag_col
from rove_spark.operators import checks as C
from rove_spark.operators import spatial as SP
from rove_spark.operators.rollup import build_tiers
from rove_spark.plans.checkpoint import CheckpointManifest, params_hash
from rove_spark.sources.tables import open_table

log = logging.getLogger(__name__)


def list_day_partitions(path: str | Path) -> set[str] | None:
    """Day set from a hive-style ``day=YYYY-MM-DD`` directory layout —
    the metadata-only analog of Iceberg's partition listing. Returns None
    when the path has no day partitions (caller falls back to a scan)."""
    root = Path(path)
    if not root.is_dir():
        return None
    days = {
        p.name.split("=", 1)[1]
        for p in root.glob("day=*")
        if p.is_dir() and "=" in p.name
    }
    return days or None


class Engine:
    """Composes configured pipelines over series DataFrames.

    ``aux_sources`` maps names referenced by range_check_dynamic /
    model_consistency_check configs (``pipeline.rs:76-79,124-129``) to
    DataFrames (bounds: join keys + lo/hi; model: join keys + model_value).
    """

    def __init__(
        self,
        spark: SparkSession,
        pipelines: dict[str, Pipeline] | None = None,
        pipeline_dir: str | Path | None = None,
        aux_sources: dict[str, DataFrame] | None = None,
        custom_checks: dict | None = None,
    ):
        """``custom_checks``: homebrew (researcher-written) check types —
        the design goal rove left unimplemented (closed enum,
        ``pipeline.rs:32-46``; "homebrew tests (Python?)",
        ``docs/language.md:5``). Each entry maps a check-type name to a
        callable with the Check protocol::

            fn(df, value_col, series_col, order_cols, out_col, **params)
              -> DataFrame  # df + out_col (int8 Flag domain)

        Implementations compose the same primitives as built-ins (Window
        exprs, broadcast joins, vectorized pandas-UDF stages through
        parallel_groups). Registered names become valid TOML check types
        via load_pipelines(extra_checks=...)."""
        self.spark = spark
        self.custom = dict(custom_checks or {})
        shadowed = sorted(set(self.custom) & KNOWN_CHECKS)
        if shadowed:
            # built-in branches dispatch first, so a colliding custom
            # check would be silently ignored — refuse loudly instead
            raise ValueError(
                f"custom_checks {shadowed} collide with built-in check types; "
                f"rename them (built-ins always dispatch first)"
            )
        self.pipelines = dict(pipelines or {})
        if pipeline_dir:
            self.pipelines.update(
                load_pipelines(pipeline_dir, frozenset(self.custom))
            )
        self.aux = dict(aux_sources or {})

    # -- step dispatch (harness.rs:26 analog) ----------------------------
    def _apply_step(
        self,
        df: DataFrame,
        step: PipelineStep,
        value_col: str,
        series_col: str,
        order_cols: Sequence[str],
    ) -> DataFrame:
        p = step.params
        out = flag_col(step.name)
        common = dict(series_col=series_col, order_cols=order_cols, out_col=out)
        if step.check == "step_check":
            return C.step_check(
                df, value_col, max_=p["max"], high=p.get("high", C.DEFAULT_HIGH), **common
            )
        if step.check == "spike_check":
            return C.spike_check(
                df, value_col, max_=p["max"], high=p.get("high", C.DEFAULT_HIGH), **common
            )
        if step.check == "flatline_check":
            return C.flatline_check(df, value_col, max_=int(p["max"]), **common)
        if step.check == "range_check":
            return C.range_check(df, value_col, min_=p["min"], max_=p["max"], out_col=out)
        if step.check == "special_value_check":
            return C.special_value_check(
                df, value_col, special_values=p["special_values"], out_col=out
            )
        if step.check == "range_check_dynamic":
            bounds = self.aux[p["source"]]
            on = p.get("on", ["month"])
            return C.range_check_dynamic(df, value_col, bounds, on=on, out_col=out)
        if step.check == "model_consistency_check":
            model = self.aux[p["model_source"]]
            on = p.get("on", [series_col, order_cols[0]])
            return C.model_consistency_check(
                df, value_col, model, on=on, threshold=p["threshold"], out_col=out
            )
        if step.check == "buddy_check":
            # reference config uses vector params with scalar broadcast
            # (harness.rs:155-159); we accept scalars directly
            flags = SP.buddy_check(
                df,
                value_col,
                radius=_scalar(p.get("radii", p.get("radius"))),
                num_min=int(_scalar(p.get("nums_min", p.get("num_min")))),
                threshold=p["threshold"],
                max_elev_diff=p.get("max_elev_diff", -1.0),
                elev_gradient=p.get("elev_gradient", 0.0),
                min_std=p.get("min_std", 1.0),
                num_iterations=int(p.get("num_iterations", 1)),
                series_col=series_col,
                ts_col=order_cols[0],
                cell_deg=p.get("cell_deg"),
            ).withColumnRenamed("flag_buddy_check", out)
            return _join_spatial_flags(df, flags, series_col, order_cols[0])
        if step.check == "sct":
            flags = SP.sct(
                df,
                value_col,
                series_col=series_col,
                ts_col=order_cols[0],
                cell_deg=p.get("cell_deg"),
                **{
                    k: v
                    for k, v in p.items()
                    if k
                    in (
                        "num_min",
                        "num_max",
                        "inner_radius",
                        "outer_radius",
                        "num_iterations",
                        "min_horizontal_scale",
                        "vertical_scale",
                        "pos",
                        "neg",
                        "eps2",
                    )
                },
            ).withColumnRenamed("flag_sct", out)
            return _join_spatial_flags(df, flags, series_col, order_cols[0])
        if step.check in self.custom:
            return self.custom[step.check](
                df,
                value_col=value_col,
                series_col=series_col,
                order_cols=order_cols,
                out_col=out,
                **p,
            )
        if step.name.startswith("test"):
            return C.dummy_check(df, out_col=out)
        raise ValueError(f"InvalidTestName: {step.name} ({step.check})")

    # -- validate_direct analog ------------------------------------------
    def run_pipeline(
        self,
        df: DataFrame,
        pipeline_name: str,
        value_col: str,
        series_col: str = "conv_id",
        order_cols: Sequence[str] = ("ts",),
    ) -> DataFrame:
        if pipeline_name not in self.pipelines:
            raise KeyError(f"TestNotInPipelines: {pipeline_name}")
        out = df
        for step in self.pipelines[pipeline_name].steps:
            out = self._apply_step(out, step, value_col, series_col, order_cols)
        return out

    def flag_columns(self, pipeline_name: str) -> list[str]:
        return [flag_col(s.name) for s in self.pipelines[pipeline_name].steps]

    # -- checkpointed tier materialization -------------------------------
    def run_job(
        self,
        df: DataFrame,
        pipeline_name: str,
        out_dir: str | Path,
        value_col: str = "text_len",
        series_col: str = "conv_id",
        ts_col: str = "ts",
        input_fingerprint: str | None = None,
        retention: dict[str, str] | None = None,
        input_path: str | Path | None = None,
    ) -> dict:
        """Flag + roll up + write all tiers, checkpointed by UTC day.

        One Spark job per tier covers *only* the not-yet-done partitions
        (input filtered by day), written with dynamic partition overwrite
        (idempotent), then the manifest marks them done with lineage and
        per-partition metrics. Safe to kill and re-run."""
        out_dir = Path(out_dir)
        pipe = self.pipelines[pipeline_name]
        lineage_params = {
            "pipeline": pipeline_name,
            "steps": [(s.name, s.check, s.params) for s in pipe.steps],
            "value_col": value_col,
        }
        phash = params_hash(lineage_params)
        fingerprint = input_fingerprint or "unfingerprinted"
        fp = f"{fingerprint}:{phash}"

        manifest = CheckpointManifest(out_dir / "_checkpoint.json")
        day = F.date_format(F.date_trunc("day", F.col(ts_col)), "yyyy-MM-dd")
        # day enumeration: with a day-partitioned input, the day set is a
        # METADATA question — read it from the partition directory listing
        # instead of scanning every row (at 100 TB the distinct() below is
        # a full-table pass just to list ~365 strings). Fallback: scan.
        all_days = None
        if input_path is not None:
            all_days = list_day_partitions(input_path)
        if all_days is None:
            # r4 verdict: make this fallback LOUD — an API caller composing
            # run_job from a DataFrame alone silently buys a full-table
            # scan (100 TB at deployment scale) just to list ~365 strings
            log.warning(
                "run_job: no input_path and no day-partition listing — "
                "enumerating days with a FULL-TABLE distinct() scan. Pass "
                "input_path (day-partitioned) so day enumeration is a "
                "metadata read; this fallback is O(table), not O(days)."
            )
            all_days = {r.d for r in df.select(day.alias("d")).distinct().collect()}
        done = manifest.done_partitions(fp)
        todo = sorted(all_days - done)
        # a done day adjacent to new data gets RE-materialized, in BOTH
        # directions: forward-looking checks (spike's lookahead) at a done
        # day's trailing edge only become decidable once the next day's
        # rows exist (d-1 case), and lag-based checks (step/spike/flatline)
        # at a done day's head only become decidable once the PREVIOUS
        # day's rows exist — out-of-order backfill (d+1 case). Both are
        # required for resumed ≡ from-scratch to hold on any arrival order.
        adjacent = set()
        for d in todo:
            base = datetime.strptime(d, "%Y-%m-%d")
            adjacent.add((base - timedelta(days=1)).strftime("%Y-%m-%d"))
            adjacent.add((base + timedelta(days=1)).strftime("%Y-%m-%d"))
        reflag = sorted(adjacent & done)
        todo = sorted(set(todo) | set(reflag))
        result = {
            "all": sorted(all_days),
            "skipped": sorted((done & all_days) - set(reflag)),
            "computed": todo,
            "recomputed_context": reflag,
        }
        if not todo:
            # retention still applies on a fully-resumed run — a killed
            # compaction (tiers done, raw drop pending) must finish here,
            # not silently skip to the early return
            self._apply_retention(
                retention, result, out_dir, input_path, value_col, series_col,
                ts_col, manifest, fp,
            )
            return result

        # context widening: window checks need neighboring rows, so a
        # resumed run must see one day of context on each side of the todo
        # set — otherwise flags at day boundaries differ from a from-scratch
        # run (lag rows missing ⇒ spurious INCONCLUSIVE/DATA_MISSING).
        # One day covers any sane leading/trailing requirement (≤ minutes
        # of context at PT1M); flagged rows outside todo are dropped again
        # before the rollup so tiers cover exactly the todo partitions.
        ctx_days = set(todo)
        for d in todo:
            base = datetime.strptime(d, "%Y-%m-%d")
            ctx_days.add((base - timedelta(days=1)).strftime("%Y-%m-%d"))
            ctx_days.add((base + timedelta(days=1)).strftime("%Y-%m-%d"))
        work = df.withColumn("day", day).filter(F.col("day").isin(sorted(ctx_days)))
        flagged = self.run_pipeline(work, pipeline_name, value_col, series_col, (ts_col,))
        flagged = flagged.filter(F.col("day").isin(todo))
        check_names = [s.name for s in pipe.steps]
        t0 = time()
        # tier text stats follow the frame's columns: use real text when
        # present, otherwise the checked signal; tool column is optional
        tiers = build_tiers(
            flagged,
            series_col=series_col,
            ts_col=ts_col,
            checks=check_names,
            text_len_source="text" if "text" in df.columns else value_col,
            tool_col="tool" if "tool" in df.columns else None,
            role_col="role" if "role" in df.columns else None,
        )
        metrics: dict[str, dict] = {d: {} for d in todo}
        for tier_name, tier_df in tiers.items():
            # open_table: parquet shim here; real Iceberg when the session
            # carries the probe-gated catalog (sources/tables.py)
            table = open_table(self.spark, out_dir / f"tier_{tier_name}", ["day"])
            tier_out = tier_df.withColumn(
                "day", F.date_format(F.date_trunc("day", "bucket_ts"), "yyyy-MM-dd")
            )
            table.overwrite_partitions(
                tier_out, lineage={"fingerprint": fp, "tier": tier_name}
            )
            # per-partition metrics from the written tier (cheap scan)
            stats = (
                table.read(self.spark)
                .groupBy("day")
                .agg(F.sum("n_turns").alias("rows"))
                .collect()
            )
            for r in stats:
                if str(r.day) in metrics:
                    metrics[str(r.day)][f"rows_{tier_name}"] = r.rows
        tiers["1m"].unpersist()  # build_tiers persists it; this job owns it
        elapsed = time() - t0
        for d in todo:
            metrics[d]["elapsed_job_sec"] = round(elapsed, 3)
        manifest.mark_done(todo, fp, lineage=lineage_params, metrics=metrics)
        self._apply_retention(
            retention, result, out_dir, input_path, value_col, series_col,
            ts_col, manifest, fp,
        )
        return result

    def ingest_late(
        self,
        delta_df: DataFrame,
        pipeline_name: str,
        out_dir: str | Path,
        batch_id: str | None = None,
        value_col: str = "text_len",
        series_col: str = "conv_id",
        ts_col: str = "ts",
    ) -> dict:
        """Late-data path beside ``run_job``'s day recompute: flag the
        DELTA through the same pipeline, then land one increment batch
        per tier (``rollup.refresh_tier_increment`` — exactly-once under
        crash/replay; read via ``rollup.read_tier`` over
        ``out_dir/tier_{t}`` + ``out_dir/tier_{t}_inc``).

        Trade-off, stated: window checks see the delta IN ISOLATION, so
        flags at the delta's temporal edges can differ from a full
        recompute with neighboring context (run_job's re-materialize
        path exists precisely for that parity). Use this path when the
        raw day is archived or a re-scan is unaffordable; route the day
        back through ``run_job`` when exact boundary flags matter.
        Mergeable (non-flag) tier stats are exact either way."""
        from rove_spark.operators.rollup import refresh_tier_increment

        pipe = self.pipelines[pipeline_name]
        flagged = self.run_pipeline(
            delta_df, pipeline_name, value_col, series_col, (ts_col,)
        )
        check_names = [s.name for s in pipe.steps]
        out: dict[str, dict] = {}
        for tier_name in ("1m", "1h", "1d"):
            inc = open_table(
                self.spark, Path(out_dir) / f"tier_{tier_name}_inc", ["day", "batch"]
            )
            out[tier_name] = refresh_tier_increment(
                inc,
                flagged,
                tier_name,
                batch_id=batch_id,
                series_col=series_col,
                ts_col=ts_col,
                checks=check_names,
                text_len_source="text" if "text" in delta_df.columns else value_col,
                tool_col="tool" if "tool" in delta_df.columns else None,
                role_col="role" if "role" in delta_df.columns else None,
            )
        return out

    # stats servable across EVERY storage layer: tiers store them, and a
    # raw/cold sliver can recompute them from the checked signal alone.
    # Flag/role/tool tier stats are deliberately excluded — the cold tier
    # archives only (series, ts, value), so a sliver cannot reproduce
    # them and a silent 0 would read as "no flags" instead of "not here".
    RANGE_STATS = ("n_turns", "text_len_sum", "text_len_min", "text_len_max")

    def query_range(
        self,
        out_dir: str | Path,
        start,
        end,
        hot_df: DataFrame | None = None,
        value_col: str = "text_len",
        series_col: str = "conv_id",
        ts_col: str = "ts",
        series_ids: Sequence[str] | None = None,
    ) -> DataFrame:
        """THE read path over a job's whole store: answer a per-series
        aggregate for ``[start, end)`` from everything ``run_job`` /
        ``ingest_late`` / retention have produced under ``out_dir`` —
        merge-on-read tiers (base + unfolded increments, ``read_tier``)
        for every whole bucket, the caller's hot raw table unioned with
        the Gorilla cold tier (``chunks_raw``, day-pruned BEFORE decode
        via ``cold_source``) for sub-minute slivers. Completes the
        lifecycle: build → incremental refresh → read-time freshness →
        retention → cold compression → THIS query. Exactness contract:
        ``query_range ≡ aggregate(original raw)`` as long as every day is
        in the hot table or the cold tier (lifecycle-tested across a
        compaction boundary in test_query_range) AND the archived signal
        fits the codec's domain: values are stored as float32 (exact for
        integers |v| ≤ 2^24 — text_len qualifies; a wider signal rounds)
        and NULL-valued rows are encoded as absent (a compacted day's
        null row is not a turn for ``n_turns``, while a hot day's is).
        A day present in BOTH layers (the kill window between chunk
        commit and raw drop, or a pre-retention snapshot passed as the
        hot table) is served from the cold tier only — never
        double-counted.

        100 TB cost shape: tier scans are pruned to the range's day
        partitions before merge-on-read; the route is computed first, so
        the cold scan decodes only SLIVER-day chunks (≤2 days per ragged
        edge, localCheckpointed so the Python decode runs once however
        many plan branches reference it) and the hot scan carries pushed
        sliver bounds. A 90-day range therefore reads O(days) tier rows
        + two sub-minute slivers — never history. An empty range prunes
        every partition (``days=[]``) and reads nothing.

        Serves ``RANGE_STATS`` only (turn counts + checked-signal
        sum/min/max) — the stats every layer can produce; see the class
        attribute note. Timestamps in the cold tier are second-floored
        (the codec's grid), so sliver boundaries must not need sub-second
        precision to split archived rows (second-aligned data is exact).

        ``series_ids`` narrows EVERY layer to the named series (the
        single-series dashboard query): an ``In`` predicate on the tier
        and hot scans — pushed through the merge-on-read aggregate to
        PushedFilters since it sits on a grouping key — and a One
        space-spec into ``cold_source`` so only that series' chunks are
        decoded."""
        from types import SimpleNamespace

        from rove_spark.operators.rollup import (
            _as_datetime,
            cold_source,
            range_aggregate,
            read_tier,
            rollup_from_raw,
            route_range,
        )

        out_dir = Path(out_dir)
        start, end = _as_datetime(start), _as_datetime(end)
        days: list[str] = []
        if start < end:
            cur = start.date()
            last = (end - timedelta(microseconds=1)).date()
            while cur <= last:
                days.append(cur.strftime("%Y-%m-%d"))
                cur += timedelta(days=1)
        tiers: dict[str, DataFrame] = {}
        for t in ("1m", "1h", "1d"):
            base = open_table(self.spark, out_dir / f"tier_{t}", ["day"])
            inc = open_table(self.spark, out_dir / f"tier_{t}_inc", ["day", "batch"])
            if not (base.exists() or inc.exists()):
                continue
            probe = (base if base.exists() else inc).read(self.spark)
            frame = read_tier(
                self.spark,
                base,
                inc,
                t,
                series_col=series_col,
                role_col="role" if "role" in probe.columns else None,
                days=days,  # [] for an empty range prunes EVERY partition
            )
            if series_ids is not None:
                frame = frame.filter(F.col(series_col).isin(list(series_ids)))
            tiers[t] = frame.select(series_col, "bucket_ts", *self.RANGE_STATS)

        # route FIRST: the raw layers only ever serve the route's sliver
        # windows, so cold decode and the hot/cold overlap guard are scoped
        # to sliver DAYS (2 edges × ≤2 days), never the whole range
        slivers = []
        if start < end:
            segs = route_range(
                start, end, levels=tuple(lv for lv in ("1d", "1h", "1m") if lv in tiers)
            )
            slivers = [(s, e) for lv, s, e in segs if lv == "raw"]
        sliver_day_set: set[str] = set()
        for s, e in slivers:
            cur, last = s.date(), (e - timedelta(microseconds=1)).date()
            while cur <= last:  # a tier-less store's sliver spans many days
                sliver_day_set.add(cur.strftime("%Y-%m-%d"))
                cur += timedelta(days=1)
        sliver_days = sorted(sliver_day_set)
        chunks = open_table(self.spark, out_dir / "chunks_raw", ["day"])
        cold_days = (
            sorted(set(chunks.partition_days()) & set(sliver_days))
            if chunks.exists()
            else []
        )
        raw_parts = []
        need_raw = bool(slivers) or (start >= end and not tiers)
        if hot_df is not None and need_raw:
            if series_ids is not None:
                hot_df = hot_df.filter(F.col(series_col).isin(list(series_ids)))
            hot = hot_df.select(F.col(series_col), F.col(ts_col), F.col(value_col))
            if cold_days:
                # a compacted day is AUTHORITATIVE in the cold tier; a hot
                # table still holding it (the kill window between chunk
                # commit and raw drop, or a pre-retention snapshot passed as
                # --hot) must not double-count its sliver rows. Evaluated
                # after the pushed sliver bounds — post-scan, bounded rows.
                hot = hot.filter(
                    ~F.date_format(
                        F.date_trunc("day", F.col(ts_col)), "yyyy-MM-dd"
                    ).isin(cold_days)
                )
            raw_parts.append(hot)
        if cold_days:
            space = (
                SimpleNamespace(kind="one", ids=[str(i) for i in series_ids])
                if series_ids is not None
                else None
            )
            src = cold_source(self.spark, chunks, value_col=value_col)
            cold_parts = [
                # end is exclusive: prune by [s, e-1µs] so a midnight end
                # doesn't drag in an extra day's chunks
                src(SimpleNamespace(start=s, end=e - timedelta(microseconds=1)), space)
                for s, e in slivers
            ]
            cold = cold_parts[0]
            for p in cold_parts[1:]:
                cold = cold.unionByName(p)
            cold = cold.filter(~F.col("is_gap")).select(
                F.col("series_id").alias(series_col),
                F.col("ts"),
                F.col(value_col),
            )
            if raw_parts:  # align cold's decoded types to the hot table's
                hot_types = dict(raw_parts[0].dtypes)
                cold = cold.select(
                    F.col(series_col).cast(hot_types[series_col]).alias(series_col),
                    F.col("ts").cast(hot_types[ts_col]).alias(ts_col),
                    F.col(value_col).cast(hot_types[value_col]).alias(value_col),
                )
            else:
                cold = cold.withColumnRenamed("ts", ts_col)
            # the raw frame is referenced once per sliver branch in the
            # final plan — truncate so the Python decode runs ONCE
            raw_parts.append(cold.localCheckpoint(eager=False))
        raw = None
        if raw_parts:
            raw = raw_parts[0]
            for p in raw_parts[1:]:
                raw = raw.unionByName(p)

        def sliver_fn(frame: DataFrame) -> DataFrame:
            return rollup_from_raw(
                frame,
                "1m",
                series_col=series_col,
                ts_col=ts_col,
                role_col=None,
                checks=(),
                text_len_source=value_col,
                tool_col=None,
            ).select(series_col, "bucket_ts", *self.RANGE_STATS)

        return range_aggregate(
            raw,
            tiers,
            start,
            end,
            rollup_fn=sliver_fn,
            ts_col=ts_col,
            series_col=series_col,
            role_col=None,
        )

    def _apply_retention(
        self, retention, result, out_dir, input_path, value_col, series_col,
        ts_col, manifest, fp,
    ) -> None:
        """Retention policy: per-tier cutoff day (e.g. {"1m": "2024-02-01"})
        — whole-partition drops, no data rewrite (rollup.py). The reserved
        key "raw" compacts expiring raw-input partitions into the Gorilla
        cold tier (out_dir/chunks_raw) BEFORE dropping them — requires a
        day-partitioned input_path, and rides this job's checkpoint
        manifest (compact:<day> keys) so a killed compaction resumes
        without re-encoding."""
        if not retention:
            return
        from rove_spark.operators.rollup import retention_compact, retention_expire

        result["expired"] = {}
        raw_cutoff = retention.get("raw")
        if raw_cutoff is not None:
            if input_path is None:
                raise ValueError(
                    "retention['raw'] compaction requires input_path — "
                    "the day-partitioned raw table to compact"
                )
            result["expired"]["raw"] = retention_compact(
                self.spark,
                open_table(self.spark, input_path, ["day"]),
                open_table(self.spark, Path(out_dir) / "chunks_raw", ["day"]),
                raw_cutoff,
                value_col=value_col,
                series_col=series_col,
                ts_col=ts_col,
                manifest=manifest,
                fingerprint=fp,
            )
        for tier_name, cutoff in retention.items():
            if tier_name == "raw":
                continue
            table = open_table(self.spark, Path(out_dir) / f"tier_{tier_name}", ["day"])
            result["expired"][tier_name] = retention_expire(table, cutoff)


def _scalar(v):
    if isinstance(v, (list, tuple)):
        return v[0]
    return v


def _join_spatial_flags(df: DataFrame, flags: DataFrame, series_col: str, ts_col: str) -> DataFrame:
    """Attach a spatial check's (series_id, ts, flag) output back onto the
    wide frame — equi-join on the shared keys (sort-merge/shuffle-hash by
    Catalyst; both sides already hash on the same keys)."""
    f = flags.withColumnRenamed("series_id", "_sp_id").withColumnRenamed("ts", "_sp_ts")
    joined = df.join(
        f,
        on=(df[series_col].cast("string") == f["_sp_id"]) & (df[ts_col] == f["_sp_ts"]),
        how="left",
    )
    return joined.drop("_sp_id", "_sp_ts")


def melt_flags(
    df: DataFrame, check_names: Sequence[str], series_col: str = "conv_id", ts_col: str = "ts"
) -> DataFrame:
    """Wide flag columns → the reference's long result format
    (``TestResult{time, identifier, flag}``, ``proto/rove.proto:65-71``),
    one row per (series, ts, test)."""
    pairs = []
    for c in check_names:
        pairs.extend([F.lit(c), F.col(flag_col(c)).cast("int")])
    stacked = df.select(
        F.col(series_col).alias("identifier"),
        F.col(ts_col).alias("time"),
        F.stack(F.lit(len(check_names)), *pairs).alias("test", "flag"),
    )
    return stacked


def flag_name_column(flag_int_col: str = "flag"):
    """int flag → symbolic name (API edge)."""
    mapping = F.create_map(
        *[x for f in Flag for x in (F.lit(int(f)), F.lit(f.name))]
    )
    return mapping[F.col(flag_int_col)]
