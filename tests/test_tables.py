"""Snapshot-committed graph tables (pipeline/tables.py): the parquet
fallback must honor the Iceberg commit contract — readers see only
committed snapshots, a crash between data write and commit is invisible,
rollback re-points without destroying history."""

from __future__ import annotations

import os

import pytest

from nobletools_spark.pipeline.tables import (SnapshotTable,
                                              catalog_configured,
                                              iceberg_identifier,
                                              write_triples)


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "triples"))


class TestSnapshotTable:
    def test_append_then_read(self, spark, table):
        s1 = table.write(_triples(spark, [("a", "isa", "b")]))
        assert s1 == 1
        s2 = table.write(_triples(spark, [("c", "isa", "d")]))
        assert s2 == 2
        got = {tuple(r) for r in table.read().collect()}
        assert got == {("a", "isa", "b"), ("c", "isa", "d")}

    def test_time_travel_reads_old_snapshot(self, spark, table):
        s1 = table.write(_triples(spark, [("a", "isa", "b")]))
        table.write(_triples(spark, [("c", "isa", "d")]))
        old = {tuple(r) for r in table.read(snapshot_id=s1).collect()}
        assert old == {("a", "isa", "b")}

    def test_overwrite_replaces_but_keeps_history(self, spark, table):
        s1 = table.write(_triples(spark, [("a", "isa", "b")]))
        table.write(_triples(spark, [("x", "isa", "y")]), mode="overwrite")
        assert {tuple(r) for r in table.read().collect()} == \
            {("x", "isa", "y")}
        # history intact: the first snapshot is still readable
        assert {tuple(r) for r in table.read(snapshot_id=s1).collect()} == \
            {("a", "isa", "b")}

    def test_crash_before_commit_is_invisible(self, spark, table):
        """Simulate a writer dying after the parquet lands but before the
        snapshot commit: the files exist on disk, the reader never sees
        them, and orphan_dirs flags them for GC."""
        table.write(_triples(spark, [("a", "isa", "b")]))
        orphan = os.path.join(table.root, "data", "deadbeef")
        _triples(spark, [("ghost", "isa", "row")]).write.parquet(orphan)
        got = {tuple(r) for r in table.read().collect()}
        assert got == {("a", "isa", "b")}
        assert table.orphan_dirs() == [os.path.join("data", "deadbeef")]

    def test_rollback_and_no_id_collision(self, spark, table):
        s1 = table.write(_triples(spark, [("a", "isa", "b")]))
        s2 = table.write(_triples(spark, [("c", "isa", "d")]))
        table.rollback(s1)
        assert table.current_snapshot_id() == s1
        # next append parents off the rolled-back state and must NOT
        # reuse s2's id
        s3 = table.write(_triples(spark, [("e", "isa", "f")]))
        assert s3 > s2
        got = {tuple(r) for r in table.read().collect()}
        assert got == {("a", "isa", "b"), ("e", "isa", "f")}

    def test_read_before_any_commit_raises(self, table):
        with pytest.raises(FileNotFoundError):
            table.read()

    def test_bad_mode_rejected(self, spark, table):
        with pytest.raises(ValueError):
            table.write(_triples(spark, [("a", "b", "c")]), mode="merge")


class TestIcebergGate:
    def test_identifier_assembly_and_validation(self):
        assert iceberg_identifier("local", "kg", "triples") == \
            "local.kg.triples"
        for bad in ("", "a.b", "a b", "a`b"):
            with pytest.raises(ValueError):
                iceberg_identifier("local", bad, "t")

    def test_catalog_gate_false_without_config(self, spark):
        assert not catalog_configured(spark, "no_such_catalog")

    def test_write_triples_falls_back_to_snapshot_table(self, spark,
                                                        tmp_path):
        loc = str(tmp_path / "t")
        sid = write_triples(spark, _triples(spark, [("a", "isa", "b")]),
                            loc, catalog="no_such_catalog")
        assert sid == 1
        got = SnapshotTable(spark, loc).read().collect()
        assert [tuple(r) for r in got] == [("a", "isa", "b")]
