"""Iceberg probe-and-use (round-3 verdict item 7): this container ships
no iceberg-spark-runtime jar, so the probe must report None (logged) and
`open_table` must return the documented parquet shim; with a catalog
configured the factory would return IcebergTable (structure asserted
without a jar — the write path itself is exercised off-sandbox)."""

from __future__ import annotations

import logging

from rove_spark.session import probe_iceberg
from rove_spark.sources.tables import IcebergTable, PartitionedTable, open_table


def test_probe_logs_and_returns_none_here(caplog):
    with caplog.at_level(logging.INFO, logger="rove_spark.session"):
        jar = probe_iceberg()
    assert jar is None  # no jar ships in this container
    assert any("iceberg probe" in r.message for r in caplog.records)


def test_probe_honors_explicit_env(tmp_path, monkeypatch):
    fake = tmp_path / "iceberg-spark-runtime-3.5_2.12-1.5.0.jar"
    fake.write_bytes(b"not a real jar")
    monkeypatch.setenv("ROVE_ICEBERG_JAR", str(fake))
    assert probe_iceberg() == str(fake)


def test_open_table_returns_shim_without_catalog(spark, tmp_path):
    t = open_table(spark, tmp_path / "tiers", ["day"])
    assert isinstance(t, PartitionedTable)


def test_open_table_name_derivation():
    class _FakeConf:
        def get(self, k, d=None):
            return "org.apache.iceberg.spark.SparkCatalog"

    class _FakeSpark:
        conf = _FakeConf()

    t = open_table(_FakeSpark(), "/tmp/tiers-1d", ["day"])
    assert isinstance(t, IcebergTable)
    # leaf + digest of the full resolved path: same leaf under two
    # out_dirs must NOT collide on one catalog table (ADVICE r4)
    assert t.name.startswith("rove.db.tiers_1d_")
    other = open_table(_FakeSpark(), "/tmp/elsewhere/tiers-1d", ["day"])
    assert other.name != t.name
    # deterministic: same path → same identifier (resume must re-find it)
    assert open_table(_FakeSpark(), "/tmp/tiers-1d", ["day"]).name == t.name
    t2 = open_table(_FakeSpark(), "rove.db.mytable", ["day"])
    assert t2.name == "rove.db.mytable"


def test_iceberg_conf_merge_preserves_caller_entries():
    """Caller-supplied spark.jars AND spark.sql.extensions comma-merge with
    the Iceberg entries instead of being overwritten (ADVICE r4: a caller
    extensions entry applied after the Iceberg block silently replaced the
    IcebergSparkSessionExtensions while the catalog confs remained)."""
    from rove_spark.session import _iceberg_confs

    extra = {
        "spark.jars": "/opt/custom.jar",
        "spark.sql.extensions": "com.example.MyExtensions",
        "spark.foo": "bar",
    }
    confs = _iceberg_confs("/opt/iceberg.jar", extra)
    assert confs["spark.jars"] == "/opt/iceberg.jar,/opt/custom.jar"
    assert confs["spark.sql.extensions"] == (
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions,"
        "com.example.MyExtensions"
    )
    # both merged keys popped so the later extra_conf loop can't overwrite
    assert "spark.jars" not in extra and "spark.sql.extensions" not in extra
    assert extra == {"spark.foo": "bar"}
    # without caller entries: plain Iceberg values
    plain = _iceberg_confs("/opt/iceberg.jar", {})
    assert plain["spark.jars"] == "/opt/iceberg.jar"
    assert plain["spark.sql.extensions"].endswith("IcebergSparkSessionExtensions")


def test_open_table_prefers_existing_legacy_name():
    """Migration guard (round-5 review): a table created under the
    pre-digest naming scheme must keep being used — otherwise a resumed
    job pairs an old checkpoint manifest with a brand-new empty table
    and silently drops the done days from the tier."""

    class _FakeConf:
        def get(self, k, d=None):
            return "org.apache.iceberg.spark.SparkCatalog"

    class _FakeCatalog:
        def __init__(self, existing):
            self.existing = existing

        def tableExists(self, name):
            return name in self.existing

    class _FakeSpark:
        conf = _FakeConf()

        def __init__(self, existing):
            self.catalog = _FakeCatalog(existing)

    import pytest

    # legacy exists, digest does not → HARD ERROR (a legacy identifier
    # carries no out_dir record; silent adoption could cross-wire
    # out_dirs, silent ignore pairs an old manifest with an empty table)
    with pytest.raises(RuntimeError, match="ROVE_ADOPT_LEGACY_TABLES"):
        open_table(_FakeSpark({"rove.db.tiers_1d"}), "/tmp/tiers-1d", ["day"])
    # ... unless adoption is explicitly opted into
    import os

    os.environ["ROVE_ADOPT_LEGACY_TABLES"] = "1"
    try:
        t = open_table(_FakeSpark({"rove.db.tiers_1d"}), "/tmp/tiers-1d", ["day"])
        assert t.name == "rove.db.tiers_1d"
    finally:
        del os.environ["ROVE_ADOPT_LEGACY_TABLES"]
    # digest exists → digest wins even if legacy also exists
    digest_name = open_table(_FakeSpark(set()), "/tmp/tiers-1d", ["day"]).name
    t2 = open_table(
        _FakeSpark({"rove.db.tiers_1d", digest_name}), "/tmp/tiers-1d", ["day"]
    )
    assert t2.name == digest_name
    # neither exists (fresh deployment) → digest name
    t3 = open_table(_FakeSpark(set()), "/tmp/tiers-1d", ["day"])
    assert t3.name == digest_name
