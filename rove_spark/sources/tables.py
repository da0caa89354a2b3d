"""Table IO: testdata readers + a partitioned-table layer ("Iceberg shim").

The design target is Iceberg (``spark.table`` / ``writeTo().overwritePartitions()``
with hidden partitioning on ``days(ts)`` + ``bucket(conv_id)``). This sandbox
has no Iceberg runtime jar, so ``PartitionedTable`` provides the same
contract over plain parquet:

- partition-column directory layout (Spark dynamic partition overwrite gives
  idempotent per-partition replace — the primitive checkpoint/resume needs);
- a JSON manifest recording snapshot lineage (write params, code version,
  row counts) per commit, standing in for Iceberg snapshot metadata.

On a real cluster, swap ``PartitionedTable`` for ``df.writeTo(table)`` — the
engine only uses the narrow interface below. Reference analog: rove has no
persistent sink at all (results stream over gRPC, ``src/server.rs:104-123``);
persistent tiered storage is a north_rule addition.
"""

from __future__ import annotations

import json
import logging
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger(__name__)

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str = "conv_id",
    sort_cols: tuple[str, ...] = ("conv_id", "ts"),
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Write a series table bucketed on the series key and sorted by
    (series, ts) — the Iceberg `bucket(conv_id)` + sort-order analog.
    Downstream per-series window stages (every QC check) and series-keyed
    aggregations then run with ZERO exchange: the scan itself satisfies
    the clustering, and the sort order kills the window sort's shuffle
    (measured 4.6× on the check stage; see BENCH.md). At 100 TB this is
    the difference between re-shuffling the table per run and never
    shuffling it at all."""
    if mode == "overwrite":
        # a previous crashed write can leave an orphaned location with no
        # metastore entry — saveAsTable then fails LOCATION_ALREADY_EXISTS
        import shutil
        from urllib.parse import urlparse

        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        loc = Path(warehouse) / table_name.lower()
        if loc.exists():
            shutil.rmtree(loc, ignore_errors=True)
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*sort_cols)
        .format("parquet")
        .saveAsTable(table_name)
    )


class PartitionedTable:
    """A partitioned parquet table with snapshot manifest + idempotent
    per-partition overwrite. Narrow stand-in for an Iceberg table."""

    def __init__(self, path: str | Path, partition_by: list[str]):
        self.path = Path(path)
        self.partition_by = list(partition_by)
        self.manifest_path = self.path / "_rove_manifest.json"

    # -- manifest ---------------------------------------------------------
    def _load_manifest(self) -> dict:
        if self.manifest_path.exists():
            return json.loads(self.manifest_path.read_text())
        return {"table": str(self.path), "partition_by": self.partition_by, "snapshots": []}

    def _commit_manifest(self, entry: dict) -> None:
        m = self._load_manifest()
        m["snapshots"].append(entry)
        self.manifest_path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(m, indent=1, default=str))
        tmp.replace(self.manifest_path)

    @property
    def snapshots(self) -> list[dict]:
        return self._load_manifest()["snapshots"]

    # -- IO ---------------------------------------------------------------
    def exists(self) -> bool:
        return self.path.exists() and any(self.path.glob("**/*.parquet"))

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(str(self.path))

    def _cluster_for_write(self, df: DataFrame) -> DataFrame:
        """Re-cluster rows onto their partition values before a
        ``partitionBy`` write: the writer opens one file per (task,
        partition value), so any mixed-partition upstream — and since
        round 7's AQE floor, any multi-partition upstream — explodes
        into tasks×partitions tiny files (measured 630 files for 30 day
        partitions at sf0.1). One exchange on the partition columns
        bounds it at one file per partition value (the Iceberg
        ``write.distribution-mode=hash`` behavior); callers needing
        more write parallelism per partition pre-split like
        ``retention_compact`` does (day, hash(series) % files_per_day)."""
        from pyspark.sql import functions as F

        return df.repartition(*[F.col(c) for c in self.partition_by])

    def overwrite_partitions(
        self, df: DataFrame, lineage: dict | None = None, cluster: bool = True
    ) -> str:
        """Replace exactly the partitions present in ``df`` (dynamic
        overwrite — Iceberg ``overwritePartitions`` semantics). Returns the
        snapshot id. ``cluster=False`` skips the pre-write re-cluster for
        callers that already repartitioned onto their own write layout
        (e.g. retention_compact's (day, hash(series) % files_per_day))."""
        (
            (self._cluster_for_write(df) if cluster else df)
            .write.mode("overwrite")
            .partitionBy(*self.partition_by)
            .option("partitionOverwriteMode", "dynamic")
            .parquet(str(self.path))
        )
        snap = uuid.uuid4().hex[:12]
        self._commit_manifest(
            {
                "snapshot_id": snap,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "operation": "overwrite_partitions",
                "lineage": lineage or {},
            }
        )
        return snap

    def append(self, df: DataFrame, lineage: dict | None = None, cluster: bool = True) -> str:
        (self._cluster_for_write(df) if cluster else df).write.mode(
            "append"
        ).partitionBy(*self.partition_by).parquet(str(self.path))
        snap = uuid.uuid4().hex[:12]
        self._commit_manifest({"snapshot_id": snap, "operation": "append", "lineage": lineage or {}})
        return snap

    def partition_days(self, day_col: str = "day") -> list[str]:
        """Partition values currently on disk — a METADATA read (directory
        listing), never a data scan."""
        if not self.path.exists():
            return []
        return sorted(
            p.name.split("=", 1)[1] for p in self.path.glob(f"{day_col}=*")
        )

    def expire_days_before(
        self, cutoff: str, day_col: str = "day", lineage: dict | None = None
    ) -> int:
        """Retention: drop every ``day_col=<val>`` partition with
        ``val < cutoff`` (lexicographic ≡ chronological for yyyy-MM-dd).
        Partition-level delete, no data rewrite."""
        dirs = [
            f"{day_col}={d}" for d in self.partition_days(day_col) if d < cutoff
        ]
        return self.drop_partitions(
            dirs, lineage={**(lineage or {}), "retention_cutoff": cutoff}
        )

    def drop_partitions(self, predicate_dirs: list[str], lineage: dict | None = None) -> int:
        """Retention expiry: drop whole partition directories (cheap
        metadata-style delete, the parquet analog of Iceberg partition-level
        delete). ``predicate_dirs`` are partition dir names like
        ``day=2024-01-01``."""
        import shutil

        dropped = 0
        for d in predicate_dirs:
            target = self.path / d
            if target.exists():
                shutil.rmtree(target)
                dropped += 1
        if dropped:
            self._commit_manifest(
                {
                    "snapshot_id": uuid.uuid4().hex[:12],
                    "operation": "drop_partitions",
                    "dropped": predicate_dirs,
                    "lineage": lineage or {},
                }
            )
        return dropped


# ------------------------------------------------ real Iceberg (probe-gated)


class IcebergTable:
    """``PartitionedTable``'s surface over a REAL Iceberg catalog —
    constructed by `open_table` only when `session.probe_iceberg` found a
    runtime jar and the session carries the ``rove`` catalog. Exercised
    off-sandbox (no jar ships in this container); the shim remains the
    tested default here. Snapshot history rides Iceberg's own snapshot
    log (``<name>.snapshots``); write lineage (the shim's JSON-manifest
    payload) is recorded as table properties keyed by snapshot id."""

    def __init__(self, spark: SparkSession, name: str, partition_by: list[str]):
        self.spark = spark
        self.name = name  # e.g. "rove.db.tiers_1d"
        self.partition_by = list(partition_by)

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.name)

    def read(self, spark: SparkSession | None = None) -> DataFrame:
        return (spark or self.spark).table(self.name)

    def overwrite_partitions(self, df: DataFrame, lineage: dict | None = None) -> str:
        from pyspark.sql import functions as F

        w = df.writeTo(self.name)
        if self.exists():
            w.overwritePartitions()
        else:
            w.partitionedBy(*[F.col(c) for c in self.partition_by]).createOrReplace()
        return self._record_lineage(lineage)

    def append(self, df: DataFrame, lineage: dict | None = None) -> str:
        df.writeTo(self.name).append()
        return self._record_lineage(lineage)

    def partition_days(self, day_col: str = "day") -> list[str]:
        """Partition values from Iceberg's partitions metadata table — a
        metadata read, no data scan."""
        rows = self.spark.sql(
            f"SELECT DISTINCT partition.{day_col} AS d FROM {self.name}.partitions"
        ).collect()
        return sorted(str(r.d) for r in rows)

    def expire_days_before(
        self, cutoff: str, day_col: str = "day", lineage: dict | None = None
    ) -> int:
        """Partition-level retention via Iceberg metadata delete: a DELETE
        whose predicate aligns with partition boundaries drops whole
        partitions without rewriting data files. Returns the DROPPED
        PARTITION count — the same unit as the parquet shim (callers like
        ``run_job`` surface it as ``result['expired']``). The count reads
        the pre-delete snapshot; a writer racing between count and DELETE
        can skew the number (the DELETE itself is snapshot-isolated)."""
        n_parts = (
            self.read()
            .filter(f"{day_col} < '{cutoff}'")
            .select(day_col)
            .distinct()
            .count()
        )
        self.spark.sql(f"DELETE FROM {self.name} WHERE {day_col} < '{cutoff}'")
        if n_parts:
            self._record_lineage({**(lineage or {}), "retention_cutoff": cutoff})
        return n_parts

    @property
    def snapshots(self) -> list[dict]:
        return [r.asDict() for r in self.spark.sql(f"SELECT * FROM {self.name}.snapshots").collect()]

    def _record_lineage(self, lineage: dict | None) -> str:
        """Attach the write's lineage payload (the shim's JSON-manifest
        analog) to the table as a property keyed by the new snapshot id."""
        snap = self._last_snapshot_id()
        if lineage and snap:
            payload = json.dumps(lineage, default=str).replace("'", "''")
            self.spark.sql(
                f"ALTER TABLE {self.name} SET TBLPROPERTIES "
                f"('rove.lineage.{snap}' = '{payload}')"
            )
        return snap

    def _last_snapshot_id(self) -> str:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.name}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return str(rows[0][0]) if rows else ""


def _derive_table_name(path: str) -> str:
    """Filesystem-ish path → valid catalog identifier under rove.db.

    The identifier embeds a digest of the full *resolved* path, not just
    the leaf: two jobs writing tier_1m under different out_dirs must map
    to different catalog tables, or they silently clobber each other's
    data while their per-out_dir checkpoint manifests still claim
    isolation."""
    import hashlib as _hashlib
    import re as _re

    resolved = str(Path(path).resolve())
    leaf = _re.sub(r"[^A-Za-z0-9_]", "_", Path(path).name)
    if not leaf or not (leaf[0].isalpha() or leaf[0] == "_"):
        leaf = "t_" + leaf  # identifiers must not start with a digit
    digest = _hashlib.md5(resolved.encode()).hexdigest()[:8]
    return f"rove.db.{leaf}_{digest}"


def _derive_table_name_legacy(name_path: str) -> str:
    """Pre-round-5 identifier (leaf only, no path digest) — kept solely
    for the ``open_table`` migration probe."""
    import re as _re

    leaf = _re.sub(r"[^A-Za-z0-9_]", "_", Path(name_path).name)
    if not leaf or not (leaf[0].isalpha() or leaf[0] == "_"):
        leaf = "t_" + leaf
    return "rove.db." + leaf


def open_table(spark: SparkSession, path_or_name: str | Path, partition_by: list[str]):
    """Tier-table factory: a real ``IcebergTable`` when the session carries
    the probe-gated ``rove`` Iceberg catalog, else the parquet shim. The
    engine only touches the shared surface (read / overwrite_partitions /
    append / expire_days_before / snapshots), so the swap is config-only.

    Only an explicit ``rove.``-qualified name is taken verbatim; anything
    else (absolute/relative paths, even ones containing dots) derives a
    sanitized ``rove.db.<leaf>_<md5(path)[:8]>`` identifier.

    Migration: identifiers before round 5 were plain ``rove.db.<leaf>``
    (no path digest). A legacy table carries no marker of which out_dir
    created it, so silently adopting it could cross-wire two out_dirs
    sharing a leaf name — the exact clobber the digest prevents. If a
    table exists under the legacy name and none under the digest name,
    open_table therefore FAILS LOUDLY and demands an explicit choice:
    set ``ROVE_ADOPT_LEGACY_TABLES=1`` to adopt the legacy table (single
    pre-round-5 deployment), or rename it to the digest identifier.
    Proceeding silently either way loses data: adopting can mix
    out_dirs; ignoring pairs an old checkpoint manifest with a fresh
    empty table and permanently drops the done days from the tier."""
    import os

    name = str(path_or_name)
    if spark.conf.get("spark.sql.catalog.rove", None):
        if not name.startswith("rove."):
            name = _derive_table_name(name)
            legacy = _derive_table_name_legacy(name_path=str(path_or_name))
            try:
                legacy_exists = spark.catalog.tableExists(legacy)
                digest_exists = spark.catalog.tableExists(name)
            except AttributeError:
                legacy_exists = digest_exists = False  # session double (tests)
            if legacy_exists and not digest_exists:
                if os.environ.get("ROVE_ADOPT_LEGACY_TABLES") == "1":
                    log.warning(
                        "open_table: ROVE_ADOPT_LEGACY_TABLES=1 — adopting "
                        "pre-round-5 identifier %s for %s (digest name %s). "
                        "Rename the table to finish the migration.",
                        legacy,
                        path_or_name,
                        name,
                    )
                    name = legacy
                else:
                    raise RuntimeError(
                        f"open_table: legacy table {legacy} exists but digest "
                        f"table {name} does not. A legacy identifier carries no "
                        "record of its out_dir, so adopting it automatically "
                        "could cross-wire out_dirs sharing a leaf name, while "
                        "ignoring it would resume against an empty table with "
                        "a manifest claiming days done. Set "
                        "ROVE_ADOPT_LEGACY_TABLES=1 to adopt it (safe for a "
                        f"single pre-upgrade deployment), or rename {legacy} "
                        f"to {name}."
                    )
        return IcebergTable(spark, name, partition_by)
    return PartitionedTable(path_or_name, partition_by)
