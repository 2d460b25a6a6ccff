"""Snapshot-committed graph tables (pipeline/tables.py): the parquet
fallback must honor the Iceberg commit contract — readers see only
committed snapshots, a crash between data write and commit is invisible,
rollback re-points without destroying history."""

from __future__ import annotations

import os

import pytest

from nobletools_spark.pipeline.tables import (SnapshotTable,
                                              catalog_configured,
                                              commit_triples_idempotent,
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

    def test_object_store_root_rejected(self, spark):
        """The fallback's atomic commit is a local os.replace; an
        object-store URI would put data in the store but commit metadata
        on the driver's disk — fail fast and point at the catalog path."""
        from nobletools_spark.pipeline.tables import SnapshotTable
        for root in ("s3://bucket/kg/triples", "s3a://b/t", "gs://b/t",
                     "hdfs://nn/t", "abfss://c@a/t"):
            with pytest.raises(ValueError, match="Iceberg catalog"):
                SnapshotTable(spark, root)

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


class TestIdempotentCommit:
    def test_same_fingerprint_commits_once(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        df = _triples(spark, [("a", "isa", "b")])
        s1 = commit_triples_idempotent(spark, df, loc, "fp1")
        s2 = commit_triples_idempotent(spark, df, loc, "fp1")  # resume no-op
        assert s1 == s2
        assert len(SnapshotTable(spark, loc).snapshots()) == 1

    def test_new_fingerprint_replaces(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        commit_triples_idempotent(
            spark, _triples(spark, [("a", "isa", "b")]), loc, "fp1")
        commit_triples_idempotent(
            spark, _triples(spark, [("x", "isa", "y")]), loc, "fp2")
        got = {tuple(r) for r in SnapshotTable(spark, loc).read().collect()}
        assert got == {("x", "isa", "y")}  # full replace, never mixed

    def test_crash_between_checkpoint_and_commit_recommits(self, spark,
                                                           tmp_path):
        """A writer that died after the parquet landed but before the
        snapshot commit leaves an orphan; the resumed run commits
        normally and the orphan stays invisible."""
        loc = str(tmp_path / "t")
        _triples(spark, [("torn", "isa", "row")]).write.parquet(
            os.path.join(loc, "data", "torn"))
        sid = commit_triples_idempotent(
            spark, _triples(spark, [("a", "isa", "b")]), loc, "fp1")
        t = SnapshotTable(spark, loc)
        assert sid is not None
        assert {tuple(r) for r in t.read().collect()} == {("a", "isa", "b")}
        assert t.orphan_dirs() == [os.path.join("data", "torn")]


def test_pipeline_materializes_through_snapshot_commit(spark, tmp_path):
    """run_checkpointed_pipeline(table_root=...) lands the triple table
    through exactly one snapshot commit, and a resumed run adds none."""
    from nobletools_spark.pipeline.checkpoint import run_checkpointed_pipeline
    from nobletools_spark.pipeline.documents import generate_documents
    from nobletools_spark.terminology.fixture import fixture_dictionary

    corpus = generate_documents(spark, 10, seed=5, partitions=2)
    root, loc = str(tmp_path / "ckpt"), str(tmp_path / "triples")
    res1 = run_checkpointed_pipeline(
        spark, corpus, fixture_dictionary(), root, "best-match",
        table_root=loc)
    t = SnapshotTable(spark, loc)
    assert len(t.snapshots()) == 1
    committed = {tuple(r) for r in
                 t.read().select("subj", "pred", "obj").collect()}
    expect = {tuple(r) for r in
              res1["triples"].df.select("subj", "pred", "obj").collect()}
    assert committed == expect and committed
    # resume: stages read checkpoints, table commit is a no-op
    res2 = run_checkpointed_pipeline(
        spark, corpus, fixture_dictionary(), root, "best-match",
        table_root=loc)
    assert res2["triples"].resumed
    assert len(t.snapshots()) == 1
