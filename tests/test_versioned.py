"""VersionedTable: the transactional MERGE target (sources/versioned.py).

Pins the three properties that make it a real table format in miniature:
copy-on-write MERGE correctness (update / delete / insert), file-level
pruning (untouched files carried by reference, never rewritten), and
the optimistic-concurrency commit protocol (O_EXCL manifest create:
exactly one racing writer wins; the loser retries against the new
snapshot and both effects land). Plus time travel and vacuum.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from iotdatapipeline_spark.sources.versioned import CommitConflict, VersionedTable


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    base = spark.createDataFrame([Row(k=i, v=f"base{i}") for i in range(20)])
    t.create(base, n_files=4)
    return t


class TestMergeSemantics:
    def test_create_and_snapshot(self, table):
        assert table.version() == 1
        assert _rows(table.snapshot()) == [(i, f"base{i}") for i in range(20)]

    def test_upsert_updates_and_inserts(self, spark, table):
        src = spark.createDataFrame(
            [Row(k=3, v="new3"), Row(k=7, v="new7"), Row(k=99, v="new99")]
        )
        v = table.merge_into(src, ["k"])
        assert v == 2
        got = dict(_rows(table.snapshot()))
        assert got[3] == "new3" and got[7] == "new7" and got[99] == "new99"
        assert got[0] == "base0" and len(got) == 21

    def test_delete_matched(self, spark, table):
        src = spark.createDataFrame([Row(k=3, v="x"), Row(k=99, v="new99")])
        table.merge_into(src, ["k"], when_matched="delete")
        got = dict(_rows(table.snapshot()))
        assert 3 not in got
        assert got[99] == "new99"  # not-matched still inserts
        assert len(got) == 20

    def test_merge_is_deterministic_vs_set_computation(self, spark, table):
        # the MERGE effect must equal the pure formulation the K1
        # sinks use: kept = base anti src, then union src
        src = spark.createDataFrame([Row(k=i, v=f"u{i}") for i in range(0, 30, 2)])
        table.merge_into(src, ["k"])
        expect = {i: (f"u{i}" if i % 2 == 0 else f"base{i}") for i in range(20)}
        expect.update({i: f"u{i}" for i in range(20, 30, 2)})
        assert dict(_rows(table.snapshot())) == expect


class TestCopyOnWrite:
    def test_untouched_files_carried_by_reference(self, spark, table):
        m1 = table._read_manifest(1)
        # source touching few keys → most of the 4 base files untouched
        src = spark.createDataFrame([Row(k=0, v="new0")])
        table.merge_into(src, ["k"])
        m2 = table._read_manifest(2)
        carried = set(m1["files"]) & set(m2["files"])
        assert len(carried) >= len(m1["files"]) - 1  # ≥3 of 4 not rewritten
        assert set(m2["files"]) != set(m1["files"])  # but something changed

    def test_cluster_by_prunes_localized_merges(self, spark, tmp_path):
        """Range clustering is what makes file pruning bite: a
        key-local source (one contiguous key range) must rewrite only
        the file(s) owning that range, and the clustering must survive
        the merge (manifest-carried) so the NEXT localized merge
        prunes too."""
        t = VersionedTable(spark, str(tmp_path / "ct"))
        base = spark.createDataFrame([Row(k=i, v=f"base{i}") for i in range(1000)])
        t.create(base, n_files=10, cluster_by=["k"])
        m1 = t._read_manifest(1)
        assert m1["cluster_by"] == ["k"]
        # source local to one range: ~1/10 of the key space
        src = spark.createDataFrame([Row(k=i, v=f"u{i}") for i in range(500, 550)])
        t.merge_into(src, ["k"])
        m2 = t._read_manifest(2)
        carried = set(m1["files"]) & set(m2["files"])
        assert len(carried) >= len(m1["files"]) - 2  # ≥8 of 10 untouched
        # clustering preserved → a second localized merge still prunes
        src2 = spark.createDataFrame([Row(k=i, v=f"w{i}") for i in range(100, 120)])
        t.merge_into(src2, ["k"])
        m3 = t._read_manifest(3)
        assert len(set(m2["files"]) & set(m3["files"])) >= len(m2["files"]) - 2
        got = dict(_rows(t.snapshot()))
        assert got[510] == "u510" and got[110] == "w110" and got[0] == "base0"
        assert len(got) == 1000

    def test_insert_only_merge_rewrites_nothing(self, spark, table):
        m1 = table._read_manifest(1)
        src = spark.createDataFrame([Row(k=1000, v="brand-new")])
        table.merge_into(src, ["k"])
        m2 = table._read_manifest(2)
        assert set(m1["files"]) <= set(m2["files"])  # all carried
        assert len(m2["files"]) > len(m1["files"])  # plus insert file(s)


class TestOptimize:
    def test_compaction_preserves_data_and_clustering(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "opt"))
        t.create(
            spark.createDataFrame([Row(k=i, v=f"base{i}") for i in range(100)]),
            n_files=5,
            cluster_by=["k"],
        )
        # accrete small insert files, as the streaming sink does
        for i in range(3):
            t.merge_into(
                spark.createDataFrame([Row(k=1000 + i, v=f"new{i}")]), ["k"]
            )
        before = t._read_manifest(t.version())
        assert len(before["files"]) >= 8
        v = t.optimize(n_files=4)
        m = t._read_manifest(v)
        assert m["op"] == "optimize"
        assert len(m["files"]) == 4
        assert m["cluster_by"] == ["k"]  # layout property survives
        got = dict(_rows(t.snapshot()))
        assert len(got) == 103 and got[0] == "base0" and got[1002] == "new2"
        # compacted layout still prunes localized merges
        m_pre = t._read_manifest(t.version())
        t.merge_into(spark.createDataFrame([Row(k=3, v="x")]), ["k"])
        m_post = t._read_manifest(t.version())
        assert len(set(m_pre["files"]) & set(m_post["files"])) >= 3


class TestTimeTravelAndVacuum:
    def test_time_travel(self, spark, table):
        src = spark.createDataFrame([Row(k=0, v="new0")])
        table.merge_into(src, ["k"])
        assert dict(_rows(table.snapshot(1)))[0] == "base0"
        assert dict(_rows(table.snapshot(2)))[0] == "new0"
        ops = [m["op"] for m in table.history()]
        assert ops == ["create", "merge:update"]

    def test_vacuum_removes_only_orphans(self, spark, table):
        # plant an orphan (a conflict-aborted attempt's leftover)
        orphan = os.path.join(table._data, "f-orphan.parquet")
        with open(orphan, "wb") as f:
            f.write(b"junk")
        removed = table.vacuum(retention_s=0)
        assert removed == ["f-orphan.parquet"]
        assert _rows(table.snapshot())  # table intact

    def test_vacuum_dry_run_reports_without_deleting(self, spark, table):
        orphan = os.path.join(table._data, "f-orphan2.parquet")
        with open(orphan, "wb") as f:
            f.write(b"junk")
        assert table.vacuum(retention_s=0, dry_run=True) == ["f-orphan2.parquet"]
        assert os.path.exists(orphan)  # nothing deleted
        assert table.vacuum(retention_s=0) == ["f-orphan2.parquet"]
        assert not os.path.exists(orphan)

    def test_vacuum_retention_spares_inflight_writers_files(self, spark, table):
        """An unreferenced file younger than the retention horizon may
        belong to a transaction about to commit — default vacuum must
        not touch it."""
        orphan = os.path.join(table._data, "f-young.parquet")
        with open(orphan, "wb") as f:
            f.write(b"junk")
        assert table.vacuum() == []  # default 1h horizon
        assert os.path.exists(orphan)
        assert table.vacuum(retention_s=0) == ["f-young.parquet"]

    def test_vacuum_is_checkpointed_not_o_versions(self, tmp_path, monkeypatch):
        """On a 70-commit table a COLD handle's vacuum must read only
        the ≤CKPT_EVERY manifests after the ``_log/_ckpt`` rollup — not
        all 70 — and still protect every file any version references
        (including files referenced only by pre-checkpoint manifests)."""
        root = str(tmp_path / "tbl")
        t = VersionedTable(None, root)  # metadata-only: no Spark reads
        os.makedirs(t._data)
        n = 70  # > 2 × CKPT_EVERY(32) → checkpoint at v64
        for v in range(1, n + 1):
            name = f"f-{v:04d}.parquet"
            with open(os.path.join(t._data, name), "wb") as f:
                f.write(b"d")
            t._try_commit(v - 1, [name], "append")
        assert os.path.exists(t._ckpt_path())
        ckpt_v, ckpt_files = t._read_ckpt()
        assert ckpt_v == 64 and len(ckpt_files) == 64

        orphan = os.path.join(t._data, "f-orphan.parquet")
        with open(orphan, "wb") as f:
            f.write(b"junk")
        cold = VersionedTable(None, root)
        reads: list[int] = []
        orig = VersionedTable._read_manifest
        monkeypatch.setattr(
            VersionedTable,
            "_read_manifest",
            lambda self, v: (reads.append(v), orig(self, v))[1],
        )
        assert cold.vacuum(retention_s=0) == ["f-orphan.parquet"]
        assert reads and max(reads) == n and min(reads) > ckpt_v
        assert len(set(reads)) <= VersionedTable.CKPT_EVERY
        # every referenced file — pre- and post-checkpoint — survived
        assert sorted(os.listdir(t._data)) == [
            f"f-{v:04d}.parquet" for v in range(1, n + 1)
        ]


class TestModelBased:
    @pytest.mark.slow
    @pytest.mark.parametrize("seed", [7, 91, 1009])
    def test_random_op_sequence_matches_dict_model(self, spark, tmp_path, seed):
        """Model-based check of the whole table protocol: a random
        sequence of COW upserts/deletes, merge-on-read upserts/deletes,
        predicate and keyed DV deletes, targeted DV compactions, and
        optimizes applied both to the VersionedTable and to a plain-dict
        model must agree on every intermediate snapshot, and time travel
        must replay the model's full history — whatever mix of
        copy-on-write rewrites and stacked deletion vectors the ops
        produced."""
        import random

        rng = random.Random(seed)
        t = VersionedTable(spark, str(tmp_path / f"mb{seed}"))
        model: dict[int, str] = {i: f"v0-{i}" for i in range(0, 30, 2)}
        t.create(
            spark.createDataFrame([Row(k=k, v=v) for k, v in model.items()]),
            n_files=3,
            cluster_by=["k"],
        )
        snapshots = [dict(model)]
        ops = [
            "upsert", "delete", "optimize",
            "mor_upsert", "mor_delete", "dv_delete_where", "delete_matching", "compact_dv",
        ]
        for step in range(12):
            op = rng.choice(ops)
            if op == "optimize":
                t.optimize(n_files=rng.randint(1, 4))
            elif op == "compact_dv":
                t.compact_dv_stacked(threshold=rng.randint(1, 2))
                # pure layout op: may or may not commit (no stacked
                # files -> no-op); model unchanged either way
            elif op == "dv_delete_where":
                m, r = rng.choice([(3, 0), (4, 1), (5, 2)])
                t.delete_where(f"k % {m} = {r}")
                model = {k: v for k, v in model.items() if k % m != r}
            elif op == "delete_matching":
                ks = rng.sample(range(35), rng.randint(1, 5))
                t.delete_matching(spark.createDataFrame([Row(k=k) for k in ks]), ["k"])
                for k in ks:
                    model.pop(k, None)  # keyed delete: no inserts
            else:
                ks = rng.sample(range(35), rng.randint(1, 5))
                rows = [Row(k=k, v=f"s{step}-{k}") for k in ks]
                src = spark.createDataFrame(rows)
                strategy = "mor" if op.startswith("mor_") else "cow"
                if op.endswith("upsert"):
                    t.merge_into(src, ["k"], strategy=strategy)
                    model.update({r.k: r.v for r in rows})
                else:
                    t.merge_into(src, ["k"], when_matched="delete", strategy=strategy)
                    for r in rows:
                        if r.k in model:
                            del model[r.k]
                        else:
                            model[r.k] = r.v  # not-matched inserts
            got = dict(_rows(t.snapshot()))
            assert got == model, f"step {step} ({op}): {got} != {model}"
            # stats-pruned scan must equal the model filter at every
            # intermediate version, whatever layout the ops produced
            lo, hi = sorted(rng.sample(range(35), 2))
            scan_got = dict(_rows(t.scan({"k": (lo, hi)})))
            assert scan_got == {k: v for k, v in model.items() if lo <= k <= hi}, (
                f"step {step} ({op}) scan[{lo},{hi}]"
            )
            # an op that committed nothing (empty DV hits, no stacked
            # files) must not have burned a version
            if t.version() == len(snapshots):
                assert model == snapshots[-1], f"step {step} ({op}): silent no-op lost a change"
            else:
                snapshots.append(dict(model))
        # time travel replays the whole history
        assert t.version() == len(snapshots)
        for v, expect in enumerate(snapshots, start=1):
            assert dict(_rows(t.snapshot(v))) == expect
        # change feed between every adjacent pair must replay the model
        # deltas (insert/update/delete classification + images)
        for v in range(1, len(snapshots)):
            prev, cur = snapshots[v - 1], snapshots[v]
            expect_ch = {}
            for k in set(prev) | set(cur):
                if k not in prev:
                    expect_ch[k] = ("insert", cur[k])
                elif k not in cur:
                    expect_ch[k] = ("delete", prev[k])
                elif prev[k] != cur[k]:
                    expect_ch[k] = ("update_postimage", cur[k])
            got_ch = {
                r["k"]: (r["_change_type"], r["v"])
                for r in t.changes(v, v + 1, ["k"]).collect()
            }
            assert got_ch == expect_ch, f"changes({v},{v + 1})"


class TestOptimisticConcurrency:
    def test_commit_conflict_raises_on_duplicate_version(self, spark, table):
        with pytest.raises(CommitConflict):
            table._try_commit(0, ["x"], "create")  # v1 already exists

    def test_racing_writers_both_land_via_retry(self, spark, table):
        """Simulate the race: writer A computes its merge against v1 but
        writer B commits v2 first. A's first commit attempt must fail
        (O_EXCL) and its retry must re-apply against B's snapshot, so
        BOTH effects are in the final table."""
        a_src = spark.createDataFrame([Row(k=1, v="from-A")])
        b_src = spark.createDataFrame([Row(k=2, v="from-B")])

        real_try_commit = table._try_commit
        state = {"b_done": False}

        def racing_commit(base, files, op, *args, **kwargs):
            if not state["b_done"]:
                state["b_done"] = True
                # B sneaks in and wins the version A is targeting
                table.merge_into(b_src, ["k"])
            return real_try_commit(base, files, op, *args, **kwargs)

        table._try_commit = racing_commit
        v = table.merge_into(a_src, ["k"])
        table._try_commit = real_try_commit
        assert v == 3  # A landed AFTER B
        got = dict(_rows(table.snapshot()))
        assert got[1] == "from-A" and got[2] == "from-B"
        ops = [m["op"] for m in table.history()]
        assert ops == ["create", "merge:update", "merge:update"]

    def test_txn_makes_merge_exactly_once(self, spark, table):
        """Replaying a merge with the same (txn_app, txn_version) —
        Spark micro-batch retry — is a no-op returning the
        already-committed table version; the check is O(1) against the
        latest manifest's carried-forward txn map, not a history
        scan."""
        src = spark.createDataFrame([Row(k=1, v="once")])
        v1 = table.merge_into(src, ["k"], txn_app="stream", txn_version=7)
        v2 = table.merge_into(src, ["k"], txn_app="stream", txn_version=7)  # replay
        assert v1 == v2 == 2
        assert table.version() == 2
        # a LOWER txn version (late replay of an older batch) is also
        # a no-op — monotonic-writer protocol, as in Delta's txn
        assert table.merge_into(src, ["k"], txn_app="stream", txn_version=5) == 2
        # a higher version commits, and the map carries forward
        assert table.merge_into(src, ["k"], txn_app="stream", txn_version=8) == 3
        assert table._read_manifest(3)["txns"]["stream"] == [8, 3]

    def test_crash_between_manifest_create_and_write_cannot_brick(self, spark, table):
        """The commit point is link-after-full-write: the versioned
        manifest name either does not exist or is complete JSON, so a
        writer dying mid-commit leaves the table readable and
        committable (no empty v{N} squatting on the next version)."""
        # simulate the old failure: even if a stray temp file leaks,
        # version resolution and the next commit are unaffected
        with open(os.path.join(table._log, ".tmp-deadwriter.json"), "w") as f:
            f.write("{")  # truncated
        assert table.version() == 1
        src = spark.createDataFrame([Row(k=1, v="after-crash")])
        assert table.merge_into(src, ["k"]) == 2
        assert dict(_rows(table.snapshot()))[1] == "after-crash"

    @pytest.mark.slow
    def test_truly_concurrent_writers_serialize_and_all_land(self, spark, table):
        """Four threads merge disjoint keys into the SAME table at the
        same time — the O_EXCL/link commit must serialize them into a
        linear version history with every effect present (no lost
        update, no duplicate version)."""
        from concurrent.futures import ThreadPoolExecutor

        def merge(i: int) -> int:
            w = VersionedTable(spark, table.root)  # own manifest reads
            src = spark.createDataFrame([Row(k=1000 + i, v=f"writer{i}")])
            return w.merge_into(src, ["k"], max_retries=30)

        with ThreadPoolExecutor(4) as ex:
            versions = sorted(ex.map(merge, range(4)))
        assert versions == [2, 3, 4, 5]  # linear, no gaps, no dupes
        got = dict(_rows(table.snapshot()))
        assert all(got[1000 + i] == f"writer{i}" for i in range(4))
        assert got[0] == "base0" and len(got) == 24

    def test_cross_process_writers_race_and_both_land(self, spark, table):
        """The O_EXCL claim is the lakehouse's foundation, and in-process
        threads share one CPython/JVM — this pins it ACROSS PROCESSES:
        two subprocess Spark sessions merge into the same table, each
        pausing at a filesystem barrier immediately before its FIRST
        commit attempt so both link against the same base version.
        Exactly one wins version 2; the loser must retry against the
        new snapshot and land version 3; both effects present."""
        import subprocess
        import sys
        import textwrap

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        barrier_dir = os.path.dirname(table.root)
        script = textwrap.dedent(
            """
            import os, sys, time
            root, tag, other, barrier = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
            from pyspark.sql import SparkSession, Row
            spark = (
                SparkSession.builder.master("local[2]")
                .config("spark.sql.shuffle.partitions", "2")
                .config("spark.ui.enabled", "false")
                .getOrCreate()
            )
            from iotdatapipeline_spark.sources.versioned import VersionedTable
            orig = VersionedTable._try_commit
            state = {"first": True}
            def patched(self, *a, **kw):
                if state["first"]:
                    state["first"] = False
                    open(os.path.join(barrier, f"ready_{tag}"), "w").close()
                    deadline = time.time() + 60
                    while not os.path.exists(os.path.join(barrier, f"ready_{other}")):
                        if time.time() > deadline:
                            raise RuntimeError("barrier timeout")
                        time.sleep(0.01)
                return orig(self, *a, **kw)
            VersionedTable._try_commit = patched
            t = VersionedTable(spark, root)
            src = spark.createDataFrame(
                [Row(k=int(tag) * 100 + i, v=f"proc{tag}") for i in range(3)]
            )
            v = t.merge_into(src, ["k"], max_retries=10)
            print(f"COMMITTED {tag} {v}", flush=True)
            spark.stop()
            """
        )
        env = dict(os.environ, PYTHONPATH=here + os.pathsep + os.environ.get("PYTHONPATH", ""))
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", script, table.root, tag, other, barrier_dir],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
            for tag, other in (("7", "9"), ("9", "7"))
        ]
        outs = [p.communicate(timeout=300) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, f"writer failed:\n{out}\n{err[-2000:]}"
        versions = sorted(
            int(line.split()[2])
            for out, _ in outs
            for line in out.splitlines()
            if line.startswith("COMMITTED")
        )
        assert versions == [2, 3]  # one won the race, one retried and landed
        fresh = VersionedTable(spark, table.root)  # re-probe manifests
        got = dict(_rows(fresh.snapshot()))
        assert all(got[700 + i] == "proc7" for i in range(3))
        assert all(got[900 + i] == "proc9" for i in range(3))
        assert len(got) == 26 and got[0] == "base0"

    def test_gives_up_after_max_retries(self, spark, table):
        src = spark.createDataFrame([Row(k=1, v="x")])

        def always_conflict(*args, **kwargs):
            raise CommitConflict("nope")

        table._try_commit = always_conflict
        with pytest.raises(CommitConflict, match="gave up"):
            table.merge_into(src, ["k"], max_retries=2)


class TestEmptyVersion:
    """An all-rows merge-delete must leave a READABLE empty version,
    not an unrepresentable table state (ADVICE r4): the manifest
    records the schema, snapshot() returns an empty frame, and the
    table accepts later merges."""

    def test_delete_all_rows_then_merge_again(self, spark, table):
        everything = spark.createDataFrame([Row(k=i, v="x") for i in range(20)])
        table.merge_into(everything, ["k"], when_matched="delete")
        snap = table.snapshot()
        assert snap.count() == 0
        assert snap.columns == ["k", "v"]
        # not bricked: the next merge re-populates via insert
        table.merge_into(spark.createDataFrame([Row(k=1, v="back")]), ["k"])
        assert _rows(table.snapshot()) == [(1, "back")]

    def test_time_travel_across_empty_version(self, spark, table):
        everything = spark.createDataFrame([Row(k=i, v="x") for i in range(20)])
        v_empty = table.merge_into(everything, ["k"], when_matched="delete")
        table.merge_into(spark.createDataFrame([Row(k=5, v="later")]), ["k"])
        assert table.snapshot(v_empty).count() == 0
        assert table.snapshot(1).count() == 20


class TestDataSkipping:
    """Manifest file-stats (per-file column [min, max] collected from
    the parquet footers at commit time) and the readers built on them:
    scan() prunes files a predicate provably misses, and merge_into
    pre-prunes its touched-file probe so a key-local MERGE never even
    READS the rest of the table — the step that would otherwise make
    every merge a full-table scan at 100 TB."""

    @pytest.fixture()
    def clustered(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "skip"))
        base = spark.createDataFrame([Row(k=i, v=f"base{i}") for i in range(1000)])
        t.create(base, n_files=10, cluster_by=["k"])
        return t

    def test_create_records_stats(self, clustered):
        m = clustered._read_manifest(1)
        stats = clustered._stats_of(m)
        assert set(stats) == set(m["files"])
        for rng in stats.values():
            lo, hi = rng["k"]
            assert 0 <= lo <= hi <= 999
        # stats live in the parquet sidecar, not the JSON commit record
        assert m.get("stats_file") and not m.get("stats")

    def test_scan_prunes_files_and_matches_filter(self, clustered):
        kept, total = clustered.pruned_files({"k": (500, 549)})
        assert total == 10 and kept <= 2
        got = sorted(r["k"] for r in clustered.scan({"k": (500, 549)}).collect())
        assert got == list(range(500, 550))

    def test_scan_open_bounds(self, clustered):
        got = sorted(r["k"] for r in clustered.scan({"k": (990, None)}).collect())
        assert got == list(range(990, 1000))
        kept, total = clustered.pruned_files({"k": (990, None)})
        assert kept <= 2

    def test_scan_without_stats_is_plain_filter(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "nostat"))
        t.create(spark.createDataFrame([Row(k=i, v="x") for i in range(100)]), n_files=4)
        # no cluster_by → no stats recorded; scan stays correct
        assert t.scan({"k": (10, 19)}).count() == 10
        kept, total = t.pruned_files({"k": (10, 19)})
        assert kept == total  # conservative: nothing pruned

    def test_merge_probe_skips_non_candidate_files(self, spark, clustered, monkeypatch):
        """The touched-file semi-join must read only the stats
        candidates: count the files the probe opens by intercepting
        spark.read.parquet."""
        opened: list[int] = []
        real_reader = type(spark.read)
        orig = real_reader.parquet

        def counting(self, *paths):
            opened.append(len(paths))
            return orig(self, *paths)

        monkeypatch.setattr(real_reader, "parquet", counting)
        src = spark.createDataFrame([Row(k=i, v=f"u{i}") for i in range(500, 550)])
        clustered.merge_into(src, ["k"])
        # the probe's candidate read must be far below the 10-file table
        assert opened and min(opened) <= 2
        got = dict((r["k"], r["v"]) for r in clustered.snapshot().collect())
        assert got[510] == "u510" and got[0] == "base0" and len(got) == 1000

    def test_merge_carries_stats_forward(self, spark, clustered):
        src = spark.createDataFrame([Row(k=5, v="new5")])
        clustered.merge_into(src, ["k"])
        m2 = clustered._read_manifest(2)
        # every file in v2 still has usable k-stats (untouched carried,
        # rewritten recomputed), so the NEXT merge still pre-prunes
        assert set(clustered._stats_of(m2)) == set(m2["files"])
        kept, total = clustered.pruned_files({"k": (0, 50)})
        assert kept < total


class TestManifestCheckpointing:
    """version() must be O(1) in commit count (the _last pointer), and
    per-file stats must ride a parquet sidecar, not the JSON manifest —
    the two metadata paths that otherwise degrade linearly with table
    age / file count (Delta-without-checkpoints failure mode)."""

    def test_version_does_not_listdir_once_pointer_exists(self, spark, table, monkeypatch):
        import iotdatapipeline_spark.sources.versioned as vmod

        assert table.version() == 1  # pointer written by create()

        def boom(path):
            raise AssertionError(f"listdir({path}) called with pointer present")

        monkeypatch.setattr(vmod.os, "listdir", boom)
        assert table.version() == 1

    def test_stale_pointer_probes_forward(self, spark, table):
        src = spark.createDataFrame([Row(k=0, v="u0")])
        table.merge_into(src, ["k"])
        # simulate a crash-between-commit-and-pointer: pointer lags at 1
        with open(os.path.join(table._log, "_last"), "w") as f:
            f.write("1")
        assert table.version() == 2

    def test_missing_pointer_falls_back_to_listdir(self, spark, table):
        os.unlink(os.path.join(table._log, "_last"))
        assert table.version() == 1
        # corrupt pointer too
        with open(os.path.join(table._log, "_last"), "w") as f:
            f.write("not-a-number")
        assert table.version() == 1

    def test_legacy_inline_stats_manifest_still_prunes(self, spark, tmp_path):
        """Pre-sidecar tables (inline "stats" in the manifest JSON)
        must keep pruning — _stats_of accepts both layouts."""
        t = VersionedTable(spark, str(tmp_path / "legacy"))
        base = spark.createDataFrame([Row(k=i, v="x") for i in range(100)])
        t.create(base, n_files=4, cluster_by=["k"])
        m = t._read_manifest(1)
        # rewrite the manifest in the legacy inline layout
        m["stats"] = t._stats_of(m)
        sidecar = m.pop("stats_file")
        os.unlink(os.path.join(t._log, sidecar))
        with open(t._manifest_path(1), "w") as f:
            import json

            json.dump(m, f)
        kept, total = t.pruned_files({"k": (0, 10)})
        assert kept < total
        assert sorted(r["k"] for r in t.scan({"k": (0, 10)}).collect()) == list(range(11))

    def test_metadata_latency_flat_in_commit_count(self, spark, tmp_path):
        """Synthetic 1000-commit table: version() + scan-planning cost
        must not scan the whole log. Manifests are synthesized directly
        (the metadata layer under test needs no Spark jobs), with one
        real data file hardlinked under 1000 names to give the head
        manifest a 1000-file listing with sidecar stats."""
        import json
        import time

        t = VersionedTable(spark, str(tmp_path / "big"))
        t.create(spark.createDataFrame([Row(k=0, v="seed")]), n_files=1)
        seed_file = t._read_manifest(1)["files"][0]
        # hardlink the one real parquet under 1000 names
        names = []
        for i in range(1000):
            name = f"f-syn{i:05d}.parquet"
            os.link(
                os.path.join(t._data, seed_file), os.path.join(t._data, name)
            )
            names.append(name)
        # synthesize 999 intermediate manifests + a 1000-file head with
        # a sidecar claiming disjoint k-ranges per file
        m1 = t._read_manifest(1)
        for v in range(2, 1001):
            m = dict(m1, version=v, base=v - 1, op="synthetic")
            with open(t._manifest_path(v), "w") as f:
                json.dump(m, f)
        stats = {n: {"k": [i * 10, i * 10 + 9]} for i, n in enumerate(names)}
        t._write_stats_sidecar("s-head.parquet", stats)
        head = dict(
            m1, version=1001, base=1000, op="synthetic-head", files=sorted(names),
            stats_file="s-head.parquet", cluster_by=["k"],
        )
        with open(t._manifest_path(1001), "w") as f:
            json.dump(head, f)
        t._advance_pointer(1001)

        t0 = time.perf_counter()
        for _ in range(50):
            assert t.version() == 1001
        version_50 = time.perf_counter() - t0
        assert version_50 < 0.5, f"50 version() calls took {version_50:.3f}s"

        t0 = time.perf_counter()
        kept, total = t.pruned_files({"k": (500, 509)})
        prune_once = time.perf_counter() - t0
        assert (kept, total) == (1, 1000)
        assert prune_once < 1.0, f"pruning 1000-file sidecar took {prune_once:.3f}s"


class TestSqlPredicateScan:
    """scan(where="<SQL predicate>"): conjunctive ranges are extracted
    for file pruning and the FULL predicate filters the survivors, so
    the result always equals snapshot().filter(...) — a parser miss can
    only cost I/O, never rows."""

    def test_extract_ranges_forms(self):
        import datetime

        from iotdatapipeline_spark.sources.versioned import _extract_ranges as ex

        assert ex("k >= 500 AND k <= 549") == {"k": (500, 549)}
        assert ex("k BETWEEN 500 AND 549") == {"k": (500, 549)}
        assert ex("500 <= k AND 549 >= k") == {"k": (500, 549)}
        assert ex("k = 42") == {"k": (42, 42)}
        assert ex("k > 10") == {"k": (10, None)}  # widened to inclusive
        assert ex("v LIKE 'x%' AND k <= 5") == {"k": (None, 5)}
        assert ex("(k >= 5) AND (k <= 9)") == {"k": (5, 9)}
        assert ex("k >= 5 AND ts BETWEEN '2024-01-01' AND '2024-02-01'") == {
            "k": (5, None),
            "ts": (datetime.date(2024, 1, 1), datetime.date(2024, 2, 1)),
        }
        got = ex("ts >= TIMESTAMP '2024-06-01 12:00:00'")
        assert got == {"ts": (datetime.datetime(2024, 6, 1, 12, 0, 0), None)}
        assert ex("name = 'it''s'") == {"name": ("it's", "it's")}
        # disjunction / negation anywhere disables pruning wholesale
        assert ex("k >= 5 OR k <= 2") == {}
        assert ex("NOT (k = 5)") == {}
        # tightening across repeated conjuncts
        assert ex("k >= 3 AND k >= 7 AND k <= 20 AND k <= 15") == {"k": (7, 15)}

    def test_string_scan_matches_filter_and_prunes(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "sqlscan"))
        base = spark.createDataFrame([Row(k=i, v=f"base{i}") for i in range(1000)])
        t.create(base, n_files=10, cluster_by=["k"])
        pred = "k BETWEEN 500 AND 549 AND v LIKE 'base5%'"
        kept, total = t.pruned_files(pred)
        assert total == 10 and kept <= 2
        # identical pruning to the hand-built dict form
        assert kept == t.pruned_files({"k": (500, 549)})[0]
        from pyspark.sql import functions as F

        want = sorted(r["k"] for r in t.snapshot().filter(F.expr(pred)).collect())
        got = sorted(r["k"] for r in t.scan(pred).collect())
        assert got == want == list(range(500, 550))

    def test_string_scan_with_or_is_correct_but_unpruned(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "sqlscan_or"))
        base = spark.createDataFrame([Row(k=i, v=f"b{i}") for i in range(100)])
        t.create(base, n_files=4, cluster_by=["k"])
        pred = "k <= 3 OR k >= 96"
        kept, total = t.pruned_files(pred)
        assert kept == total  # conservative: no pruning under OR
        got = sorted(r["k"] for r in t.scan(pred).collect())
        assert got == [0, 1, 2, 3, 96, 97, 98, 99]


class TestChangeFeed:
    """changes(v_from, v_to): state-diff CDC between two committed
    snapshots — insert / update_postimage / delete with the correct
    image side, reproducible forever because snapshots are immutable."""

    def test_insert_update_delete_classified(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "cdf"))
        t.create(
            spark.createDataFrame([Row(k=i, v=f"a{i}") for i in range(10)]),
            n_files=2, cluster_by=["k"],
        )
        t.merge_into(spark.createDataFrame([Row(k=3, v="A3"), Row(k=42, v="new")]), ["k"])
        t.merge_into(spark.createDataFrame([Row(k=7, v="x")]), ["k"], when_matched="delete")
        ch = {r["k"]: r for r in t.changes(1, 3).collect()}
        assert ch[3]["_change_type"] == "update_postimage" and ch[3]["v"] == "A3"
        assert ch[42]["_change_type"] == "insert" and ch[42]["v"] == "new"
        assert ch[7]["_change_type"] == "delete" and ch[7]["v"] == "a7"
        assert set(ch) == {3, 42, 7}  # unchanged keys emit nothing

    def test_changes_default_keys_and_latest(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "cdf2"))
        t.create(
            spark.createDataFrame([Row(k=1, v="a")]), cluster_by=["k"]
        )
        t.merge_into(spark.createDataFrame([Row(k=1, v="b")]), ["k"])
        ch = t.changes(1).collect()  # v_to=latest, keys from cluster_by
        assert len(ch) == 1 and ch[0]["_change_type"] == "update_postimage"

    def test_changes_requires_keys_without_cluster_by(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "cdf3"))
        t.create(spark.createDataFrame([Row(k=1, v="a")]))
        with pytest.raises(ValueError):
            t.changes(1, 1)

    def test_null_safe_value_compare(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "cdf4"))
        t.create(
            spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v=None)]),
            cluster_by=["k"],
        )
        t.merge_into(spark.createDataFrame([(1, None)], "k bigint, v string"), ["k"])
        ch = {r["k"]: r for r in t.changes(1).collect()}
        # a→NULL is an update; NULL→NULL (untouched k=2) is NOT
        assert set(ch) == {1}
        assert ch[1]["_change_type"] == "update_postimage" and ch[1]["v"] is None


class TestZOrderOptimize:
    """optimize(zorder_by=(a, b)): Morton-code layout composed with the
    manifest-stats skipping — after the rewrite, scan() predicates on
    EITHER column must prune files (linear clustering prunes only its
    leading column, which is the entire point of the knob)."""

    def test_zorder_prunes_both_dimensions(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "zo"))
        rows = [(a, b, a * 64 + b) for a in range(64) for b in range(64)]
        df = spark.createDataFrame(rows, "a bigint, b bigint, payload bigint")
        t.create(df, n_files=16, cluster_by=["a"])
        # linearly clustered on a: predicates on b cannot prune
        kept_b, total = t.pruned_files({"b": (0, 7)})
        assert kept_b == total
        v = t.optimize(16, zorder_by=("a", "b"))
        assert v == 2
        kept_a, total = t.pruned_files({"a": (0, 7)})
        kept_b, _ = t.pruned_files({"b": (0, 7)})
        assert kept_a < total and kept_b < total  # both dims now prune
        # correctness unchanged: scan == filter, full data intact
        got = sorted(r["payload"] for r in t.scan({"a": (0, 7), "b": (0, 7)}).collect())
        assert got == sorted(a * 64 + b for a in range(8) for b in range(8))
        assert t.snapshot().count() == 64 * 64

    def test_zorder_preserves_cluster_by_for_merges(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "zo2"))
        df = spark.createDataFrame(
            [(a, b, 0) for a in range(32) for b in range(32)],
            "a bigint, b bigint, payload bigint",
        )
        t.create(df, n_files=8, cluster_by=["a"])
        t.optimize(8, zorder_by=("a", "b"))
        # the manifest still records cluster_by, and a key-local merge
        # still pre-prunes on the recorded a-stats
        src = spark.createDataFrame([(0, 0, 99)], "a bigint, b bigint, payload bigint")
        t.merge_into(src, ["a", "b"])
        got = {(r["a"], r["b"]): r["payload"] for r in t.snapshot().collect()}
        assert got[(0, 0)] == 99 and got[(31, 31)] == 0 and len(got) == 32 * 32


class TestSchemaEvolution:
    """merge_into(schema_evolution=True): source-only columns join the
    table schema; carried old-schema files read back with typed nulls
    (Delta mergeSchema semantics without rewriting history)."""

    def test_added_column_null_backfilled(self, spark, table):
        src = spark.createDataFrame(
            [(3, "new3", 42), (99, "new99", 7)], "k bigint, v string, extra bigint"
        )
        table.merge_into(src, ["k"], schema_evolution=True)
        snap = table.snapshot()
        assert snap.columns == ["k", "v", "extra"]
        got = {r["k"]: (r["v"], r["extra"]) for r in snap.collect()}
        assert got[3] == ("new3", 42) and got[99] == ("new99", 7)
        assert got[0] == ("base0", None)  # carried file: typed null
        assert len(got) == 21

    def test_without_flag_extra_columns_dropped(self, spark, table):
        src = spark.createDataFrame([(3, "new3", 42)], "k bigint, v string, extra bigint")
        table.merge_into(src, ["k"])
        assert table.snapshot().columns == ["k", "v"]

    def test_next_merge_and_time_travel_after_evolution(self, spark, table):
        src = spark.createDataFrame([(1, "x", 5)], "k bigint, v string, extra bigint")
        table.merge_into(src, ["k"], schema_evolution=True)
        # v1 time travel still shows the pre-evolution schema
        assert table.snapshot(1).columns == ["k", "v"]
        # a later non-evolving merge must supply the evolved schema
        src2 = spark.createDataFrame([(2, "y", 6)], "k bigint, v string, extra bigint")
        table.merge_into(src2, ["k"])
        got = {r["k"]: r["extra"] for r in table.snapshot().collect()}
        assert got[1] == 5 and got[2] == 6 and got[0] is None

    def test_merge_straddling_old_and_evolved_files_is_lossless(self, spark, table):
        """Regression: a merge whose touched set contains BOTH an
        old-schema file and an evolved file must rewrite the kept rows
        of the evolved file WITH their evolved-column values. With an
        inferred-schema read of the touched files, Spark could pick the
        old file's footer as THE schema and silently drop 'extra' from
        every kept row — permanent data loss in the committed version."""
        # v2: evolve — k=3 updated in place, k=99 inserted, both carry extra
        src1 = spark.createDataFrame(
            [(3, "new3", 42), (99, "new99", 7)], "k bigint, v string, extra bigint"
        )
        table.merge_into(src1, ["k"], schema_evolution=True)
        # v3: touch k=99 (lives in an evolved insert file) and k=0
        # (lives in an old-schema base file) but NOT k=3 — if k=3 shares
        # a file with k=99 its kept row is rewritten and must keep 42
        src2 = spark.createDataFrame(
            [(99, "touch99", 8), (0, "touch0", 9)], "k bigint, v string, extra bigint"
        )
        table.merge_into(src2, ["k"])
        got = {r["k"]: (r["v"], r["extra"]) for r in table.snapshot().collect()}
        assert got[3] == ("new3", 42)  # untouched key in a touched file
        assert got[99] == ("touch99", 8) and got[0] == ("touch0", 9)
        assert got[1] == ("base1", None)
        assert len(got) == 21

    def test_scan_on_evolved_table_matches_snapshot_filter(self, spark, table):
        """scan() must read through the manifest schema too: on an
        evolved table the pruned read must never lose the evolved
        column to an arbitrary old-schema footer."""
        src = spark.createDataFrame(
            [(3, "new3", 42), (99, "new99", 7)], "k bigint, v string, extra bigint"
        )
        table.merge_into(src, ["k"], schema_evolution=True)
        got = table.scan({"k": (None, None)})
        assert got.columns == ["k", "v", "extra"]
        want = sorted(
            (r["k"], r["v"], r["extra"]) for r in table.snapshot().collect()
        )
        assert sorted((r["k"], r["v"], r["extra"]) for r in got.collect()) == want
        assert (42,) in {(r["extra"],) for r in got.collect()}

    def test_changes_across_evolution_boundary(self, spark, table):
        src = spark.createDataFrame([(1, "x", 5)], "k bigint, v string, extra bigint")
        table.merge_into(src, ["k"], schema_evolution=True)
        ch = {r["k"]: r for r in table.changes(1, 2, ["k"]).collect()}
        # only the touched key changes; null-backfilled carried rows
        # must NOT read as updates
        assert set(ch) == {1}
        assert ch[1]["_change_type"] == "update_postimage" and ch[1]["extra"] == 5


class TestRangeIntersectsProperties:
    """_range_intersects is the function data skipping TRUSTS: if it
    ever returns False for a file that could hold a matching row, scan
    and merge silently lose data. Property: against a brute-force
    check over integer ranges it must never under-keep; on mixed or
    unknown types it must always keep."""

    def test_never_prunes_a_matching_file(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from iotdatapipeline_spark.sources.versioned import _range_intersects

        ints = st.integers(-50, 50)
        opt = st.one_of(st.none(), ints)

        @settings(max_examples=500, deadline=None)
        @given(fmin=ints, fmax=ints, lo=opt, hi=opt)
        def prop(fmin, fmax, lo, hi):
            if fmin > fmax:
                fmin, fmax = fmax, fmin
            exists_match = any(
                (lo is None or x >= lo) and (hi is None or x <= hi)
                for x in range(fmin, fmax + 1)
            )
            got = _range_intersects([fmin, fmax], lo, hi)
            if exists_match:
                assert got, (fmin, fmax, lo, hi)

        prop()

    def test_unknown_or_mixed_types_always_keep(self):
        from iotdatapipeline_spark.sources.versioned import _range_intersects

        assert _range_intersects(None, 1, 2)
        assert _range_intersects([], 1, 2)
        assert _range_intersects([1, 2], "a", "z")  # mixed types: keep
        assert _range_intersects(["a", "z"], 1, 2)
        assert _range_intersects([True, True], 0, 1)  # bools canon to None
        assert _range_intersects([1, 2], None, None)

    def test_datetime_canon_orders_chronologically(self, spark):
        # naive datetimes canonicalize through the session timezone
        # (UTC here), so an active session is required
        import datetime

        from iotdatapipeline_spark.sources.versioned import _canon, _range_intersects

        a = datetime.datetime(2024, 1, 1, 0, 0, 0)
        b = datetime.datetime(2024, 1, 1, 0, 0, 0, 500000)
        c = datetime.datetime(2024, 1, 1, 0, 0, 1)
        assert _canon(a) < _canon(b) < _canon(c)  # iso strings sort right
        assert not _range_intersects([a, b], c, None)  # provably misses
        assert _range_intersects([a, c], b, b)

    def test_datetime_canon_normalizes_timezones(self, spark, monkeypatch):
        """Footer stats are tz-aware UTC; collect() bounds are naive
        session-local. Both must canonicalize to the SAME UTC string or
        merge pruning could drop matching files. Also: a naive value
        with no resolvable session tz must canon to None (keep-file)."""
        import datetime

        import iotdatapipeline_spark.sources.versioned as vmod

        utc = datetime.timezone.utc
        aware = datetime.datetime(2024, 6, 1, 12, 0, 0, tzinfo=utc)
        naive_utc = datetime.datetime(2024, 6, 1, 12, 0, 0)
        assert vmod._canon(aware) == vmod._canon(naive_utc)

        # a non-UTC offset-aware stat converts, not string-compares
        plus2 = datetime.timezone(datetime.timedelta(hours=2))
        aware2 = datetime.datetime(2024, 6, 1, 14, 0, 0, tzinfo=plus2)
        assert vmod._canon(aware2) == vmod._canon(naive_utc)

        # non-UTC session tz: naive values localize through it
        from zoneinfo import ZoneInfo

        monkeypatch.setattr(vmod, "_session_tz", lambda: ZoneInfo("America/New_York"))
        ny_naive = datetime.datetime(2024, 6, 1, 8, 0, 0)  # EDT = UTC-4
        assert vmod._canon(ny_naive) == vmod._canon(aware)

        # unresolvable session tz → None → conservative keep
        monkeypatch.setattr(vmod, "_session_tz", lambda: None)
        assert vmod._canon(naive_utc) is None
        assert vmod._range_intersects(
            [naive_utc, naive_utc], datetime.datetime(2030, 1, 1), None
        )

    def test_date_bound_vs_datetime_stats_is_incomparable(self, spark):
        """A date canon ('2024-01-01') sorts lexicographically BEFORE
        the datetime canon of its own midnight ('2024-01-01T00:00:00'),
        but SQL casts the date bound to midnight and ADMITS that row —
        so pruning must treat the mixed shapes as incomparable (keep
        the file), never compare them. Regression for the
        scan("ts <= '2024-01-01'") silent-row-loss hazard."""
        import datetime

        from iotdatapipeline_spark.sources.versioned import _range_intersects

        midnight = datetime.datetime(2024, 1, 1, 0, 0, 0)
        d = datetime.date(2024, 1, 1)
        # file min == midnight of the date bound: ts <= DATE must keep it
        assert _range_intersects([midnight, midnight], None, d)
        # and the mirror: ts >= DATE vs a file whose max is midnight
        assert _range_intersects([midnight, midnight], d, None)
        # date stats vs datetime bound: same rule, keep
        assert _range_intersects([d, d], midnight, None)
        assert _range_intersects([d, d], None, midnight)
        # same-shape comparisons still prune
        assert not _range_intersects(
            [datetime.date(2024, 1, 2), datetime.date(2024, 1, 3)], None, d
        )
        assert not _range_intersects(
            [midnight, midnight], datetime.datetime(2024, 1, 1, 0, 0, 1), None
        )

    def test_string_scan_date_bound_on_timestamp_column(self, spark, tmp_path):
        """End-to-end form of the hazard: a file whose ts-min is exactly
        midnight of the predicate's date literal must survive pruning,
        so scan(str) ≡ snapshot().filter(str)."""
        import datetime

        t = VersionedTable(spark, str(tmp_path / "datescan"))
        rows = [
            Row(k=i, ts=datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(hours=i))
            for i in range(48)
        ]
        t.create(spark.createDataFrame(rows), n_files=4, cluster_by=["ts"])
        from pyspark.sql import functions as F

        pred = "ts <= '2024-01-01'"
        want = sorted(r["k"] for r in t.snapshot().filter(F.expr(pred)).collect())
        got = sorted(r["k"] for r in t.scan(pred).collect())
        assert got == want == [0]  # only the exact-midnight row qualifies


class TestCDFStream:
    """readStream.format('versioned_cdf'): the change feed as a
    stream — version-offset protocol, per-commit batches, checkpoint
    restart resumes at the committed version (no re-emit, no skip)."""

    def _start(self, spark, root, ddl, ckpt, out):
        return (
            spark.readStream.format("versioned_cdf")
            .option("root", root)
            .option("keys", "k")
            .option("schema_ddl", ddl)
            .load()
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="50 milliseconds")
            .start()
        )

    @staticmethod
    def _drained(spark, out, want_version):
        import os

        if not os.path.isdir(os.path.join(out, "_spark_metadata")):
            return None
        try:
            rows = spark.read.parquet(out).collect()
        except Exception:
            return None
        vs = [r["_commit_version"] for r in rows]
        return rows if vs and max(vs) >= want_version else None

    def test_restart_resumes_without_reemit(self, spark, tmp_path):
        import time

        from iotdatapipeline_spark.sources.versioned import (
            cdf_schema_ddl,
            register_versioned_cdf,
        )

        register_versioned_cdf(spark)
        root = str(tmp_path / "t")
        t = VersionedTable(spark, root)
        t.create(
            spark.createDataFrame([Row(k=i, v=f"a{i}") for i in range(6)]),
            n_files=2, cluster_by=["k"],
        )
        t.merge_into(spark.createDataFrame([Row(k=1, v="B")]), ["k"])
        ddl, ckpt, out = cdf_schema_ddl(t), str(tmp_path / "ckpt"), str(tmp_path / "out")

        q = self._start(spark, root, ddl, ckpt, out)
        deadline = time.time() + 60
        while time.time() < deadline and self._drained(spark, out, 2) is None:
            time.sleep(0.2)
        q.stop()
        q.awaitTermination()

        # a third commit lands while the stream is DOWN
        t.merge_into(spark.createDataFrame([Row(k=0, v="x")]), ["k"], when_matched="delete")

        q = self._start(spark, root, ddl, ckpt, out)
        deadline = time.time() + 60
        rows = None
        while time.time() < deadline:
            rows = self._drained(spark, out, 3)
            if rows is not None:
                break
            time.sleep(0.2)
        q.stop()
        q.awaitTermination()
        assert rows is not None
        by_v = {}
        for r in rows:
            by_v.setdefault(r["_commit_version"], []).append((r["k"], r["v"], r["_change_type"]))
        assert sorted(by_v) == [1, 2, 3]
        assert sorted(by_v[1]) == [(i, f"a{i}", "insert") for i in range(6)]  # once, not twice
        assert by_v[2] == [(1, "B", "update_postimage")]
        assert by_v[3] == [(0, "a0", "delete")]

    def test_live_tailing_picks_up_new_commits(self, spark, tmp_path):
        """Commits landing WHILE the stream runs are emitted without a
        restart — live CDC tailing, the steady-state deployment mode."""
        import time

        from iotdatapipeline_spark.sources.versioned import (
            cdf_schema_ddl,
            register_versioned_cdf,
        )

        register_versioned_cdf(spark)
        root = str(tmp_path / "lt")
        t = VersionedTable(spark, root)
        t.create(
            spark.createDataFrame([Row(k=i, v="a") for i in range(4)]),
            n_files=1, cluster_by=["k"],
        )
        ddl, ckpt, out = cdf_schema_ddl(t), str(tmp_path / "ckpt"), str(tmp_path / "out")
        q = self._start(spark, root, ddl, ckpt, out)
        try:
            deadline = time.time() + 60
            while time.time() < deadline and self._drained(spark, out, 1) is None:
                time.sleep(0.2)
            # two commits land while the query is LIVE
            t.merge_into(spark.createDataFrame([Row(k=1, v="B")]), ["k"])
            t.merge_into(spark.createDataFrame([Row(k=2, v="x")]), ["k"], when_matched="delete")
            deadline = time.time() + 60
            rows = None
            while time.time() < deadline:
                rows = self._drained(spark, out, 3)
                if rows is not None:
                    break
                time.sleep(0.2)
        finally:
            q.stop()
            q.awaitTermination()
        assert rows is not None
        by_v = {}
        for r in rows:
            by_v.setdefault(r["_commit_version"], []).append((r["k"], r["v"], r["_change_type"]))
        assert by_v[2] == [(1, "B", "update_postimage")]
        assert by_v[3] == [(2, "a", "delete")]
        assert len(by_v[1]) == 4

    def test_bulk_commit_never_materializes_rows_in_planner(self, spark, tmp_path, monkeypatch):
        """Scale gate for the distributed reader: a bulk commit (20k-row
        churn, ≥100× the other stream tests) must flow PLANNER →
        parquet spill → per-file executor partitions, with DataFrame
        row materialization (collect/toPandas/toLocalIterator) FORBIDDEN
        in the planning process for the whole plan+read cycle. The old
        SimpleDataSourceStreamReader collect()ed every diff row on the
        driver — one backfill commit away from OOM."""
        from iotdatapipeline_spark.sources.versioned import (
            _cdf_stream_reader_class,
            cdf_schema_ddl,
        )
        from pyspark.sql import DataFrame

        root = str(tmp_path / "bulk")
        t = VersionedTable(spark, root)
        t.create(
            spark.createDataFrame([Row(k=i, v=f"a{i}") for i in range(20000)]),
            n_files=4, cluster_by=["k"],
        )
        # bulk commit: update every even key (10k updates) + 10k inserts
        src = spark.createDataFrame(
            [Row(k=i, v="B") for i in range(0, 20000, 2)]
            + [Row(k=i, v="n") for i in range(20000, 30000)]
        )
        t.merge_into(src, ["k"])

        ds_cls = _cdf_stream_reader_class()
        reader = ds_cls(
            options={"root": root, "keys": "k", "schema_ddl": cdf_schema_ddl(t)}
        ).streamReader(None)

        def boom(self, *a, **kw):
            raise AssertionError("driver-side row materialization in CDF planning")

        monkeypatch.setattr(DataFrame, "collect", boom)
        monkeypatch.setattr(DataFrame, "toPandas", boom)
        monkeypatch.setattr(DataFrame, "toLocalIterator", boom)
        # shrink AQE's target partition size so the 20k-row diff spills
        # as several files (at real scale data volume does this; the
        # test proves multi-file planning, not just the 1-file case)
        shrink = {
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
            "spark.sql.files.maxPartitionBytes": "64KB",
        }
        old = {k: spark.conf.get(k) for k in shrink}
        for k, v in shrink.items():
            spark.conf.set(k, v)
        try:
            assert reader.latestOffset() == {"v": 2}
            parts = reader.partitions({"v": 1}, {"v": 2})
        finally:
            for k, v in old.items():
                spark.conf.set(k, v)
        # the diff spilled across multiple files → multiple partitions
        assert len(parts) > 1, f"bulk diff produced {len(parts)} partition(s)"
        import pyarrow as pa

        n = 0
        for p in parts:
            for out in reader.read(p):
                assert isinstance(out, pa.RecordBatch), type(out)
                n += out.num_rows
        assert n == 20000  # 10k update_postimage + 10k insert
        # commit reclaims the spill
        reader.commit({"v": 2})
        import os as _os

        assert not _os.path.isdir(reader._spill_dir(2))

    def test_keys_not_a_schema_prefix_lands_in_right_columns(self, spark, tmp_path):
        """Regression: changes() returns key columns FIRST; the emitted
        rows must still follow schema_ddl's declared (native) order.
        With the key column second in the table schema, a keys-first
        row layout would silently swap fields."""
        from iotdatapipeline_spark.sources.versioned import (
            _cdf_stream_reader_class,
            cdf_schema_ddl,
        )

        root = str(tmp_path / "order")
        t = VersionedTable(spark, root)
        # key column k is NOT the first table column
        t.create(
            spark.createDataFrame(
                [("x0", 0, 100), ("x1", 1, 101)], "label string, k bigint, amt bigint"
            ),
            n_files=1, cluster_by=["k"],
        )
        t.merge_into(
            spark.createDataFrame([("y1", 1, 999)], "label string, k bigint, amt bigint"),
            ["k"],
        )
        ddl = cdf_schema_ddl(t)
        assert ddl.startswith("label string, k bigint, amt bigint")
        reader = _cdf_stream_reader_class()(
            options={"root": root, "keys": "k", "schema_ddl": ddl}
        ).streamReader(None)
        rows = []
        for p in reader.partitions({"v": 0}, {"v": 2}):
            for out in reader.read(p):
                rows += out.to_pylist() if hasattr(out, "to_pylist") else [out]
        got = {(r["_commit_version"], r["k"]): r for r in rows}
        assert got[(1, 0)]["label"] == "x0" and got[(1, 0)]["amt"] == 100
        assert got[(2, 1)]["label"] == "y1" and got[(2, 1)]["amt"] == 999
        assert got[(2, 1)]["_change_type"] == "update_postimage"
        reader.stop()

    def test_concurrent_readers_do_not_reclaim_each_others_spills(self, spark, tmp_path):
        """Two streams tailing the SAME table must not share spill
        paths: with a shared default dir, the stream that is further
        ahead commit()-reclaims files the slower stream's already-
        planned partitions still reference (executor
        FileNotFoundError). The default spill namespace is per-reader,
        so A's commit and even A's stop leave B's planned partitions
        readable."""
        from iotdatapipeline_spark.sources.versioned import (
            _cdf_stream_reader_class,
            cdf_schema_ddl,
        )

        root = str(tmp_path / "twostreams")
        t = VersionedTable(spark, root)
        t.create(
            spark.createDataFrame([Row(k=i, v=f"a{i}") for i in range(20)]),
            n_files=2, cluster_by=["k"],
        )
        t.merge_into(spark.createDataFrame([Row(k=1, v="B")]), ["k"])

        ds_cls = _cdf_stream_reader_class()
        opts = {"root": root, "keys": "k", "schema_ddl": cdf_schema_ddl(t)}
        a = ds_cls(options=dict(opts)).streamReader(None)
        b = ds_cls(options=dict(opts)).streamReader(None)
        assert a.spill_root != b.spill_root  # per-reader namespace

        parts_b = b.partitions({"v": 0}, {"v": 2})  # B plans first...
        a.partitions({"v": 0}, {"v": 2})
        a.commit({"v": 2})  # ...A races ahead and reclaims ITS spills
        a.stop()
        rows = 0
        for p in parts_b:  # B's planned partitions must still read
            for out in b.read(p):
                rows += out.num_rows if hasattr(out, "num_rows") else 1
        assert rows == 21  # 20 v1 inserts + 1 v2 update_postimage
        b.stop()


class TestDeletionVectors:
    """Merge-on-read deletes (delete_where, r8): rows vanish while the
    data file set stays byte-identical; DVs compose, never resurrect
    through merges, materialize on optimize, and survive vacuum."""

    def test_delete_removes_rows_without_touching_files(self, table):
        files_v1 = table.history()[0]["files"]
        v = table.delete_where("k % 3 = 0")
        assert v == 2
        got = dict(_rows(table.snapshot()))
        assert set(got) == {i for i in range(20) if i % 3 != 0}
        m = table.history()[-1]
        assert m["op"] == "delete"
        assert m["files"] == files_v1  # no data file rewritten
        assert m["dvs"] and set(m["dvs"]) <= set(m["files"])

    def test_time_travel_sees_predelete_rows(self, table):
        table.delete_where("k % 3 = 0")
        assert len(_rows(table.snapshot(1))) == 20
        assert len(_rows(table.snapshot(2))) == 13

    def test_redelete_same_predicate_is_noop(self, table):
        v = table.delete_where("k % 3 = 0")
        # every matching row already carries a DV -> nothing to record
        assert table.delete_where("k % 3 = 0") == v
        assert table.version() == v

    def test_stacked_deletes_compose(self, table):
        table.delete_where("k % 3 = 0")
        table.delete_where({"k": (10, None)})
        got = {k for k, _ in _rows(table.snapshot())}
        assert got == {i for i in range(10) if i % 3 != 0}
        # scan must agree with snapshot().filter under DVs
        assert _rows(table.scan({"k": (4, 8)})) == [
            (i, f"base{i}") for i in (4, 5, 7, 8)
        ]

    def test_merge_does_not_resurrect_and_drops_rewritten_dvs(self, spark, table):
        table.delete_where("k % 3 = 0")
        src = spark.createDataFrame([Row(k=1, v="z1"), Row(k=6, v="z6")])
        table.merge_into(src, ["k"])
        got = dict(_rows(table.snapshot()))
        # k=6 was DV-deleted; the merge source legitimately re-inserts it
        assert got[1] == "z1" and got[6] == "z6"
        assert set(got) == {i for i in range(20) if i % 3 != 0} | {6}
        m = table.history()[-1]
        assert set(m["dvs"]) <= set(m["files"])  # no dangling DV mapping

    def test_optimize_materializes_deletes(self, table):
        table.delete_where("k % 3 = 0")
        before = _rows(table.snapshot())
        table.optimize(n_files=2)
        m = table.history()[-1]
        assert m["op"] == "optimize" and not m["dvs"]
        assert _rows(table.snapshot()) == before

    def test_vacuum_retains_referenced_dv_files(self, table):
        table.delete_where("k % 3 = 0")
        removed = table.vacuum(retention_s=0)
        assert removed == []
        assert len(_rows(table.snapshot())) == 13  # DVs still applied
        # an orphaned DV (lost commit race) IS reclaimed
        orphan = os.path.join(table._data, "dv-deadbeef.parquet")
        with open(orphan, "wb") as f:
            f.write(b"x")
        assert "dv-deadbeef.parquet" in table.vacuum(retention_s=0)

    def test_changes_reports_dv_deletes(self, table):
        v1 = table.version()
        v2 = table.delete_where("k % 3 = 0")
        ch = table.changes(v1, v2, keys=["k"])
        deleted = {r["k"] for r in ch.filter("_change_type = 'delete'").collect()}
        assert deleted == {i for i in range(20) if i % 3 == 0}
        assert ch.count() == len(deleted)  # no spurious updates


class TestRestore:
    def test_restore_replays_old_state_appending_history(self, spark, table):
        table.merge_into(spark.createDataFrame([Row(k=3, v="bad3"), Row(k=99, v="bad99")]), ["k"])
        table.delete_where("k % 2 = 0")
        assert len(_rows(table.snapshot())) < 20
        v = table.restore(1)
        assert v == 4
        assert _rows(table.snapshot()) == [(i, f"base{i}") for i in range(20)]
        ops = [m["op"] for m in table.history()]
        assert ops == ["create", "merge:update", "delete", "restore:1"]
        # the bad versions stay inspectable
        assert dict(_rows(table.snapshot(2)))[3] == "bad3"

    def test_restore_of_dv_version_reapplies_dvs(self, table):
        table.delete_where("k % 3 = 0")          # v2 with DVs
        table.optimize(n_files=2)                # v3 materializes them
        table.restore(2)                         # back to DV state
        assert {k for k, _ in _rows(table.snapshot())} == {
            i for i in range(20) if i % 3 != 0
        }
        assert table.history()[-1]["dvs"]        # DV map restored
        assert table.vacuum(retention_s=0) == [] # v3's files still referenced

    def test_restore_bounds_checked(self, table):
        with pytest.raises(ValueError, match="cannot restore"):
            table.restore(5)
        with pytest.raises(ValueError, match="cannot restore"):
            table.restore(0)

    def test_restore_preserves_txn_idempotence(self, spark, table):
        src = spark.createDataFrame([Row(k=1, v="txn1")])
        v = table.merge_into(src, ["k"], txn_app="etl", txn_version=7)
        table.restore(1)
        # batch 7 was applied pre-restore; a replay must still no-op
        assert table.merge_into(src, ["k"], txn_app="etl", txn_version=7) == v


class TestDVStreamAndPruning:
    def test_cdf_stream_emits_dv_deletes(self, spark, tmp_path):
        """A delete_where commit must flow through the STREAMING change
        feed exactly like a COW delete: one micro-batch of
        _change_type='delete' rows tagged with the delete's commit
        version — the DV anti-join happens inside the snapshot diff the
        planner spills, so the reader needs no DV awareness."""
        import time

        from iotdatapipeline_spark.sources.versioned import (
            cdf_schema_ddl,
            register_versioned_cdf,
        )

        register_versioned_cdf(spark)
        root = str(tmp_path / "dvs")
        t = VersionedTable(spark, root)
        t.create(
            spark.createDataFrame([Row(k=i, v=f"a{i}") for i in range(6)]),
            n_files=2, cluster_by=["k"],
        )
        t.delete_where("k % 2 = 0")
        ddl, ckpt, out = cdf_schema_ddl(t), str(tmp_path / "ck"), str(tmp_path / "out")
        q = (
            spark.readStream.format("versioned_cdf")
            .option("root", root).option("keys", "k").option("schema_ddl", ddl)
            .load()
            .writeStream.outputMode("append").format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .trigger(processingTime="50 milliseconds")
            .start()
        )
        try:
            deadline, rows = time.time() + 90, None
            while time.time() < deadline:
                try:
                    got = spark.read.parquet(out).collect()
                except Exception:
                    got = []
                if any(r["_commit_version"] == 2 for r in got):
                    rows = got
                    break
                time.sleep(0.2)
        finally:
            q.stop()
            q.awaitTermination()
        assert rows is not None
        v2 = sorted((r["k"], r["_change_type"]) for r in rows if r["_commit_version"] == 2)
        assert v2 == [(0, "delete"), (2, "delete"), (4, "delete")]

    def test_dv_attachment_respects_stats_pruning(self, spark, tmp_path):
        """On a clustered table a range delete must attach DV files only
        to the stats-pruned candidates — files whose [min,max] provably
        miss the predicate carry NO DV mapping (their reads stay plain
        parquet scans, no anti-join)."""
        t = VersionedTable(spark, str(tmp_path / "cl"))
        t.create(
            spark.createDataFrame([Row(k=i, v=f"a{i}") for i in range(1000)]),
            n_files=10, cluster_by=["k"],
        )
        m1 = t._read_manifest(1)
        stats = t._stats_of(m1)
        t.delete_where({"k": (100, 149)})
        m2 = t._read_manifest(2)
        assert {k for k, _ in _rows(t.snapshot())} == set(range(1000)) - set(range(100, 150))
        for f in m2["dvs"]:
            lo, hi = stats[f]["k"]
            assert lo <= 149 and hi >= 100, f"DV attached to non-candidate file {f}"
        assert 0 < len(m2["dvs"]) < len(m2["files"])


class TestDVConcurrency:
    def test_delete_retries_past_racing_merge_and_both_land(self, spark, table):
        """A merge that wins the version a delete_where targeted must
        not lose either effect: the delete retries on CommitConflict
        against the NEW snapshot (re-pruning, re-locating positions in
        the merge's rewritten files) and both commits land."""
        real = table._try_commit
        state = {"raced": False}

        def racing(base, files, op, *args, **kwargs):
            if op == "delete" and not state["raced"]:
                state["raced"] = True
                table.merge_into(
                    spark.createDataFrame([Row(k=3, v="RACED")]), ["k"]
                )
            return real(base, files, op, *args, **kwargs)

        table._try_commit = racing
        v = table.delete_where("k % 2 = 0")
        table._try_commit = real
        assert v == 3  # delete landed AFTER the merge
        got = dict(_rows(table.snapshot()))
        assert set(got) == {i for i in range(20) if i % 2 == 1}
        assert got[3] == "RACED"  # the racing merge's effect survives
        ops = [m["op"] for m in table.history()]
        assert ops == ["create", "merge:update", "delete"]


class TestDeleteMatching:
    """Keyed DV deletes (equality deletes): the DV twin of
    merge_into(when_matched='delete') for the delete-only case."""

    def test_keyed_delete_no_rewrite(self, spark, table):
        src = spark.createDataFrame([Row(k=k) for k in (2, 5, 11, 999)])
        files_v1 = table.history()[0]["files"]
        v = table.delete_matching(src, ["k"])
        assert v == 2
        got = {k for k, _ in _rows(table.snapshot())}
        assert got == set(range(20)) - {2, 5, 11}  # 999 never existed
        m = table.history()[-1]
        assert m["op"] == "delete" and m["files"] == files_v1 and m["dvs"]

    def test_no_match_is_noop(self, spark, table):
        src = spark.createDataFrame([Row(k=777)])
        assert table.delete_matching(src, ["k"]) == 1
        assert table.version() == 1

    def test_key_bounds_prune_on_clustered_table(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "km"))
        t.create(
            spark.createDataFrame([Row(k=i, v=f"a{i}") for i in range(1000)]),
            n_files=10, cluster_by=["k"],
        )
        stats = t._stats_of(t._read_manifest(1))
        src = spark.createDataFrame([Row(k=k) for k in range(120, 130)])
        t.delete_matching(src, ["k"])
        m = t._read_manifest(2)
        # DVs only on the file(s) whose range covers 120..129
        for f in m["dvs"]:
            lo, hi = stats[f]["k"]
            assert lo <= 129 and hi >= 120
        assert 0 < len(m["dvs"]) < len(m["files"])
        assert {k for k, _ in _rows(t.snapshot())} == set(range(1000)) - set(range(120, 130))

    def test_equivalent_to_cow_merge_delete_effect(self, spark, table):
        """Same end state as the COW formulation (delete-only source,
        no inserts), minus the file rewrites."""
        src = spark.createDataFrame([Row(k=k, v="x") for k in range(0, 20, 4)])
        table.delete_matching(src.select("k"), ["k"])
        dv_state = _rows(table.snapshot())
        t2_rows = [Row(k=i, v=f"base{i}") for i in range(20)]
        t2 = VersionedTable(spark, table.root + "_cow")
        t2.create(spark.createDataFrame(t2_rows), n_files=4)
        t2.merge_into(src.filter("k < 20"), ["k"], when_matched="delete")
        assert dv_state == _rows(t2.snapshot())


class TestMergeOnReadUpsert:
    """merge_into(strategy='mor'): one commit = DV entries for matched
    preimages + appended postimage files. Same logical snapshot as COW,
    O(changed rows) write cost; CDF, time travel, txn replay, stacking
    observability and targeted compaction all hold across it."""

    def test_same_snapshot_as_cow_pure_append(self, spark, table):
        src = spark.createDataFrame(
            [Row(k=3, v="new3"), Row(k=7, v="new7"), Row(k=99, v="new99")]
        )
        files_v1 = table.history()[0]["files"]
        v = table.merge_into(src, ["k"], strategy="mor")
        assert v == 2
        got = dict(_rows(table.snapshot()))
        assert got[3] == "new3" and got[7] == "new7" and got[99] == "new99"
        assert got[0] == "base0" and len(got) == 21
        m = table.history()[-1]
        assert m["op"] == "merge:update:mor"
        # pure append: every v1 file carried byte-identically, plus inserts
        assert set(files_v1) <= set(m["files"])
        assert len(m["files"]) > len(files_v1)
        assert m["dvs"] and set(m["dvs"]) <= set(files_v1)

    def test_cow_and_mor_snapshots_identical(self, spark, table):
        src = spark.createDataFrame([Row(k=i, v=f"u{i}") for i in range(0, 30, 2)])
        table.merge_into(src, ["k"], strategy="mor")
        mor_state = _rows(table.snapshot())
        t2 = VersionedTable(spark, table.root + "_cow")
        t2.create(spark.createDataFrame([Row(k=i, v=f"base{i}") for i in range(20)]), n_files=4)
        t2.merge_into(src, ["k"])
        assert mor_state == _rows(t2.snapshot())

    def test_mor_delete_mode(self, spark, table):
        src = spark.createDataFrame([Row(k=3, v="x"), Row(k=99, v="new99")])
        files_v1 = table.history()[0]["files"]
        table.merge_into(src, ["k"], when_matched="delete", strategy="mor")
        got = dict(_rows(table.snapshot()))
        assert 3 not in got and got[99] == "new99" and len(got) == 20
        m = table.history()[-1]
        assert m["op"] == "merge:delete:mor"
        assert set(files_v1) <= set(m["files"])

    def test_insert_only_mor_appends_without_dvs(self, spark, table):
        src = spark.createDataFrame([Row(k=100, v="n100"), Row(k=101, v="n101")])
        before_dvs = table.history()[-1].get("dvs") or {}
        table.merge_into(src, ["k"], strategy="mor")
        m = table.history()[-1]
        assert (m.get("dvs") or {}) == before_dvs  # nothing matched: no DV
        assert len(_rows(table.snapshot())) == 22

    def test_empty_source_is_noop(self, spark, table):
        src = spark.createDataFrame([], "k int, v string")
        assert table.merge_into(src, ["k"], strategy="mor") == 1
        assert table.version() == 1

    def test_repeated_mor_upserts_same_key(self, spark, table):
        for i in range(3):
            table.merge_into(spark.createDataFrame([Row(k=5, v=f"gen{i}")]), ["k"], strategy="mor")
        got = dict(_rows(table.snapshot()))
        assert got[5] == "gen2" and len(got) == 20  # exactly one live row

    def test_time_travel_sees_preimage(self, spark, table):
        table.merge_into(spark.createDataFrame([Row(k=5, v="post")]), ["k"], strategy="mor")
        assert dict(_rows(table.snapshot(1)))[5] == "base5"
        assert dict(_rows(table.snapshot(2)))[5] == "post"

    def test_cdf_across_mor_with_preimages(self, spark, table):
        src = spark.createDataFrame([Row(k=5, v="post5"), Row(k=99, v="new99")])
        v1 = table.version()
        v2 = table.merge_into(src, ["k"], strategy="mor")
        ch = table.changes(v1, v2, keys=["k"], include_preimages=True)
        by_type = {
            (r["_change_type"], r["k"]): r["v"] for r in ch.collect()
        }
        assert by_type[("update_preimage", 5)] == "base5"
        assert by_type[("update_postimage", 5)] == "post5"
        assert by_type[("insert", 99)] == "new99"
        assert len(by_type) == 3
        # default call keeps the historical three-type contract
        assert table.changes(v1, v2, keys=["k"]).count() == 2

    def test_txn_exactly_once(self, spark, table):
        src = spark.createDataFrame([Row(k=5, v="batch7")])
        v = table.merge_into(src, ["k"], strategy="mor", txn_app="stream", txn_version=7)
        again = table.merge_into(
            spark.createDataFrame([Row(k=5, v="replayed")]), ["k"],
            strategy="mor", txn_app="stream", txn_version=7,
        )
        assert again == v and table.version() == v
        assert dict(_rows(table.snapshot()))[5] == "batch7"

    def test_schema_evolution_mor(self, spark, table):
        src = spark.createDataFrame([Row(k=5, v="post5", extra=11)])
        table.merge_into(src, ["k"], strategy="mor", schema_evolution=True)
        snap = table.snapshot()
        got = {r["k"]: (r["v"], r["extra"]) for r in snap.collect()}
        assert got[5] == ("post5", 11)
        assert got[0] == ("base0", None)  # old files null-backfilled

    def test_mor_then_optimize_materializes(self, spark, table):
        table.merge_into(spark.createDataFrame([Row(k=5, v="post")]), ["k"], strategy="mor")
        before = _rows(table.snapshot())
        table.optimize(n_files=2)
        m = table.history()[-1]
        assert not m["dvs"]
        assert _rows(table.snapshot()) == before


class TestDVStackingAndCompaction:
    """dv_stacking observability + compact_dv_stacked: N sequential DV
    commits stack; targeted compaction rewrites only the stacked files,
    clears their DV lists, and never changes the snapshot."""

    def test_stacking_depth_reported_and_bounded_by_compaction(self, spark, table):
        for k in (1, 4, 7, 10, 13):
            table.delete_matching(spark.createDataFrame([Row(k=k)]), ["k"])
        depths = table.dv_stacking()
        assert depths and max(depths.values()) >= 2  # stacks grew
        before = _rows(table.snapshot())
        v = table.compact_dv_stacked(threshold=2)
        assert v == table.version()
        m = table.history()[-1]
        assert m["op"] == "optimize:dv"
        after_depths = table.dv_stacking()
        assert all(d < 2 for d in after_depths.values()) or not after_depths
        assert _rows(table.snapshot()) == before  # nothing resurrected/lost

    def test_below_threshold_is_noop(self, spark, table):
        table.delete_matching(spark.createDataFrame([Row(k=1)]), ["k"])
        v = table.version()
        assert table.compact_dv_stacked(threshold=99) == v
        assert table.version() == v

    def test_compaction_rewrites_only_stacked_files(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "stk"))
        t.create(
            spark.createDataFrame([Row(k=i, v=f"a{i}") for i in range(1000)]),
            n_files=10, cluster_by=["k"],
        )
        # repeatedly delete keys in ONE file's range -> only it stacks
        for k in (120, 121, 122):
            t.delete_matching(spark.createDataFrame([Row(k=k)]), ["k"])
        files_before = set(t.history()[-1]["files"])
        stacked = {f for f, d in t.dv_stacking().items() if d >= 3}
        assert stacked
        t.compact_dv_stacked(threshold=3)
        m = t.history()[-1]
        carried = files_before - stacked
        assert carried <= set(m["files"])  # non-stacked carried by reference
        assert not (stacked & set(m["files"]))  # stacked files rewritten away
        assert {k for k, _ in _rows(t.snapshot())} == set(range(1000)) - {120, 121, 122}


class TestMorConflictOrphans:
    def test_failed_mor_attempt_orphans_reclaimed_by_vacuum(self, spark, table):
        """A MOR merge that loses its first commit race leaves that
        attempt's appended postimage files AND DV parquet orphaned;
        the retry lands, and vacuum reclaims exactly the orphans —
        never a file referenced by any committed version."""
        orig = type(table)._try_commit
        state = {"failed": False}

        def fail_once(self, *a, **kw):
            if not state["failed"]:
                state["failed"] = True
                raise CommitConflict("simulated race loss")
            return orig(self, *a, **kw)

        table._try_commit = fail_once.__get__(table)
        src = spark.createDataFrame([Row(k=3, v="post3"), Row(k=99, v="new99")])
        v = table.merge_into(src, ["k"], strategy="mor", max_retries=3)
        assert v == 2 and state["failed"]
        all_files = set(os.listdir(table._data))
        referenced = set()
        for m in table.history():
            referenced |= set(m["files"])
            for dv_list in (m.get("dvs") or {}).values():
                referenced |= set(dv_list)
            # r12: commit-time CDF change files are referenced too
            if (m.get("cdf") or {}).get("mode") == "files":
                referenced |= set(m["cdf"].get("files") or [])
        orphans = all_files - referenced
        assert orphans  # the failed attempt left files behind
        removed = set(table.vacuum(retention_s=0))
        assert removed == orphans
        got = dict(_rows(table.snapshot()))
        assert got[3] == "post3" and got[99] == "new99" and len(got) == 21


class TestColumnMapping:
    """rename_column / drop_column via column mapping: zero data bytes
    move; files keep physical names forever, readers alias, writers
    translate, optimize clears the mapping debt."""

    def test_rename_no_rewrite_values_intact(self, spark, table):
        files_v1 = table.history()[0]["files"]
        v = table.rename_column("v", "val")
        assert v == 2
        m = table.history()[-1]
        assert m["files"] == files_v1  # not a byte rewritten
        assert m["col_map"] == {"val": "v"}
        snap = table.snapshot()
        assert snap.columns == ["k", "val"]
        assert sorted((r["k"], r["val"]) for r in snap.collect()) == [
            (i, f"base{i}") for i in range(20)
        ]

    def test_time_travel_and_restore_across_rename(self, spark, table):
        table.rename_column("v", "val")
        assert table.snapshot(1).columns == ["k", "v"]  # old manifest, old name
        table.restore(1)
        assert table.snapshot().columns == ["k", "v"]  # names came back
        assert len(_rows(table.snapshot())) == 20

    def test_merge_after_rename_cow_and_mor(self, spark, table):
        table.rename_column("v", "val")
        for strat in ("cow", "mor"):
            src = spark.createDataFrame([Row(k=3, val=f"{strat}3"), Row(k=100, val=f"{strat}100")])
            table.merge_into(src, ["k"], strategy=strat)
            got = {r["k"]: r["val"] for r in table.snapshot().collect()}
            assert got[3] == f"{strat}3" and got[100] == f"{strat}100"
            assert got[0] == "base0"
        # the appended files stored the PHYSICAL name: a fresh handle
        # (no cached state) must read them back through the mapping
        fresh = VersionedTable(spark, table.root)
        assert fresh.snapshot().columns == ["k", "val"]

    def test_rename_clustered_column_keeps_pruning(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "cm"))
        t.create(
            spark.createDataFrame([Row(k=i, v=f"a{i}") for i in range(1000)]),
            n_files=10, cluster_by=["k"],
        )
        t.rename_column("k", "key")
        assert t._read_manifest(t.version())["cluster_by"] == ["key"]
        kept, total = t.pruned_files({"key": (100, 150)})
        assert kept < total  # stats re-keyed: pruning still engages
        got = {r["key"] for r in t.scan({"key": (100, 150)}).collect()}
        assert got == set(range(100, 151))
        # merges still prune + cluster on the renamed key
        t.merge_into(spark.createDataFrame([Row(key=120, v="z")]), ["key"])
        assert {r["v"] for r in t.scan({"key": (120, 120)}).collect()} == {"z"}

    def test_drop_column_and_resurrection_guard(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "dc"))
        t.create(spark.createDataFrame([Row(k=i, v=f"a{i}", w=i * 2) for i in range(10)]))
        t.drop_column("w")
        snap = t.snapshot()
        assert snap.columns == ["k", "v"]
        assert t.snapshot(1).columns == ["k", "v", "w"]  # time travel intact
        m = t.history()[-1]
        assert m["retired_cols"] == ["w"] and m["files"] == t.history()[0]["files"]
        # re-adding the dropped name via evolution must NOT resurrect
        src = spark.createDataFrame([Row(k=1, v="x", w=999)])
        with pytest.raises(ValueError, match="re-add"):
            t.merge_into(src, ["k"], schema_evolution=True)
        # optimize clears the debt; then the re-add is safe
        t.optimize(n_files=2)
        assert t.history()[-1]["retired_cols"] == []
        t.merge_into(src, ["k"], schema_evolution=True)
        got = {r["k"]: r["w"] for r in t.snapshot().collect()}
        assert got[1] == 999 and got[2] is None  # old rows NOT resurrected

    def test_drop_guards(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "dg"))
        t.create(
            spark.createDataFrame([Row(k=1, v="a")]), cluster_by=["k"]
        )
        with pytest.raises(ValueError, match="cluster_by"):
            t.drop_column("k")
        with pytest.raises(ValueError, match="already exists"):
            t.rename_column("v", "k")
        with pytest.raises(ValueError, match="no such column"):
            t.rename_column("zz", "y")

    def test_rename_then_dv_delete_and_cdf(self, spark, table):
        table.rename_column("v", "val")
        table.delete_where("k % 5 = 0")
        got = {k for k, _ in sorted((r["k"], r["val"]) for r in table.snapshot().collect())}
        assert got == {i for i in range(20) if i % 5 != 0}
        ch = table.changes(2, 3, keys=["k"])
        assert {r["k"] for r in ch.collect()} == {0, 5, 10, 15}
        assert ch.columns == ["k", "val", "_change_type"]

    def test_cdf_across_rename_reports_only_real_changes(self, spark, table):
        """changes() across a rename boundary must align columns by
        PHYSICAL identity: a renamed-but-untouched row is NOT an
        update; real updates report under the v_to (new) name."""
        table.rename_column("v", "val")  # v2
        table.merge_into(spark.createDataFrame([Row(k=3, val="post3")]), ["k"])  # v3
        ch = table.changes(1, 3, keys=["k"])  # spans the rename
        got = {(r["k"], r["_change_type"], r["val"]) for r in ch.collect()}
        assert got == {(3, "update_postimage", "post3")}  # only the real change
        # rename-only span: zero changes
        assert table.changes(1, 2, keys=["k"]).count() == 0

    def test_chained_renames(self, spark, table):
        table.rename_column("v", "val")
        table.rename_column("val", "value")
        m = table.history()[-1]
        assert m["col_map"] == {"value": "v"}  # maps to the ORIGINAL physical name
        assert table.snapshot().columns == ["k", "value"]
        assert len(_rows_kv(table.snapshot(), "value")) == 20


def _rows_kv(df, vcol):
    return sorted((r["k"], r[vcol]) for r in df.collect())


class TestAddColumn:
    def test_add_column_null_backfilled_then_writable(self, spark, table):
        files_v1 = table.history()[0]["files"]
        v = table.add_column("score", "bigint")
        assert v == 2
        m = table.history()[-1]
        assert m["files"] == files_v1  # manifest-only
        snap = table.snapshot()
        assert snap.columns == ["k", "v", "score"]
        assert all(r["score"] is None for r in snap.collect())
        table.merge_into(spark.createDataFrame([Row(k=3, v="x", score=7)]), ["k"])
        got = {r["k"]: r["score"] for r in table.snapshot().collect()}
        assert got[3] == 7 and got[0] is None
        # time travel: v1 has no score column
        assert table.snapshot(1).columns == ["k", "v"]

    def test_add_guards(self, spark, table):
        with pytest.raises(ValueError, match="already exists"):
            table.add_column("v", "string")
        table.add_column("tmp", "int")
        table.drop_column("tmp")
        with pytest.raises(ValueError, match="re-add"):
            table.add_column("tmp", "int")
        table.optimize(n_files=2)
        assert table.add_column("tmp", "int") > 0  # debt cleared


class TestCheckConstraints:
    def test_writers_enforce_after_add(self, spark, table):
        from iotdatapipeline_spark.sources.versioned import ConstraintViolation

        table.add_constraint("k_bounds", "k >= 0 AND k < 1000")
        v = table.version()
        # valid write (both strategies) passes
        table.merge_into(spark.createDataFrame([Row(k=500, v="ok")]), ["k"])
        table.merge_into(spark.createDataFrame([Row(k=501, v="ok2")]), ["k"], strategy="mor")
        # violating write refuses, table untouched
        for strat in ("cow", "mor"):
            with pytest.raises(ConstraintViolation, match="k_bounds"):
                table.merge_into(
                    spark.createDataFrame([Row(k=-5, v="bad")]), ["k"], strategy=strat
                )
        got = dict(_rows(table.snapshot()))
        assert -5 not in got and got[500] == "ok" and got[501] == "ok2"
        assert table.version() == v + 2  # only the two valid merges committed

    def test_null_is_unknown_and_passes(self, spark, table):
        table.add_constraint("v_nonempty", "v <> ''")
        table.merge_into(spark.createDataFrame([Row(k=50, v=None)], "k int, v string"), ["k"])
        assert dict(_rows(table.snapshot()))[50] is None  # NULL passed (SQL CHECK)

    def test_existing_violations_block_add(self, spark, table):
        from iotdatapipeline_spark.sources.versioned import ConstraintViolation

        with pytest.raises(ConstraintViolation, match="existing rows"):
            table.add_constraint("impossible", "k > 5")
        assert table.version() == 1  # nothing committed

    def test_drop_constraint_reopens_writes(self, spark, table):
        table.add_constraint("k_bounds", "k < 100")
        table.drop_constraint("k_bounds")
        table.merge_into(spark.createDataFrame([Row(k=5000, v="big")]), ["k"])
        assert 5000 in dict(_rows(table.snapshot()))

    def test_alter_guards_constraint_refs(self, spark, table):
        table.add_constraint("k_bounds", "k >= 0")
        with pytest.raises(ValueError, match="referenced by CHECK"):
            table.rename_column("k", "key")
        table.add_constraint("v_len", "length(v) < 50")
        with pytest.raises(ValueError, match="referenced by CHECK"):
            table.drop_column("v")
        # unreferenced column still alterable
        table.add_column("w", "int")
        table.rename_column("w", "w2")

    def test_streaming_sink_inherits_enforcement(self, spark, tmp_path):
        from iotdatapipeline_spark.sources.versioned import ConstraintViolation, VersionedTable
        from iotdatapipeline_spark.streaming.sinks import versioned_upsert_foreach_batch

        root = str(tmp_path / "cons")
        sink = versioned_upsert_foreach_batch(root, ["k"], txn_app="q")
        sink(spark.createDataFrame([(1, 5, "a")], "k int, ts int, v string"), 0)
        VersionedTable(spark, root).add_constraint("pos", "k > 0")
        with pytest.raises(ConstraintViolation):
            sink(spark.createDataFrame([(-1, 6, "bad")], "k int, ts int, v string"), 1)


class TestPhysicalNameCollisions:
    """A legal DDL sequence must never produce two physical fields with
    one name (rename a->b frees logical 'a' but NOT physical 'a' —
    the old files still carry it). Every surface that introduces a
    column name rejects live physical names until optimize() rewrites
    the files under logical names and clears the debt."""

    def test_add_column_rejects_live_physical_name(self, spark, table):
        table.rename_column("v", "val")  # physical 'v' still in files
        with pytest.raises(ValueError, match="PHYSICAL"):
            table.add_column("v", "string")
        # optimize rewrites under logical names; then the add is safe
        table.optimize(n_files=2)
        table.add_column("v", "string")
        snap = table.snapshot()
        assert snap.columns == ["k", "val", "v"]
        got = {r["k"]: (r["val"], r["v"]) for r in snap.collect()}
        assert got[3] == ("base3", None)  # old values intact, new col null

    def test_rename_rejects_live_physical_name(self, spark, table):
        table.add_column("w", "string")
        table.rename_column("v", "val")
        with pytest.raises(ValueError, match="PHYSICAL"):
            table.rename_column("w", "v")  # would collide with val's physical
        # renaming BACK to this column's own physical name stays legal
        table.rename_column("val", "v")
        assert table.history()[-1]["col_map"] == {"v": "v"}
        assert dict((r["k"], r["v"]) for r in table.snapshot().collect())[3] == "base3"

    def test_rename_rejects_retired_physical_name(self, spark, table):
        table.add_column("w", "string")
        table.drop_column("w")
        with pytest.raises(ValueError, match="dropped"):
            table.rename_column("v", "w")

    def test_schema_evolution_rejects_live_physical_name(self, spark, table):
        table.rename_column("v", "val")
        src = spark.createDataFrame([Row(k=1, val="x", v="evil")])
        with pytest.raises(ValueError, match="PHYSICAL"):
            table.merge_into(src, ["k"], schema_evolution=True)
        table.optimize(n_files=2)
        table.merge_into(src, ["k"], schema_evolution=True)
        got = {r["k"]: r["v"] for r in table.snapshot().collect()}
        assert got[1] == "evil" and got[2] is None  # no resurrection


class TestRestoreConstraints:
    def test_restore_carries_restored_constraints_not_heads(self, spark, table):
        """A constraint added AFTER the restore point referencing a
        post-restore column must not poison writes after restore()."""
        from iotdatapipeline_spark.sources.versioned import ConstraintViolation

        table.add_column("score", "bigint")  # v2
        table.add_constraint("score_pos", "score >= 0")  # v3 — refs post-v1 col
        table.restore(1)  # v4: schema has no 'score'
        m = table.history()[-1]
        assert m["constraints"] == {}  # v1 had none; head's did NOT leak
        # writes work again (would raise unresolved-column if inherited)
        table.merge_into(spark.createDataFrame([Row(k=3, v="post")]), ["k"])
        assert dict(_rows(table.snapshot()))[3] == "post"
        # and a restore TO a constrained version re-arms enforcement
        table.add_constraint("k_cap", "k < 10000")  # v6
        v6 = table.version()
        table.drop_constraint("k_cap")  # v7
        table.restore(v6)  # v8
        with pytest.raises(ConstraintViolation, match="k_cap"):
            table.merge_into(spark.createDataFrame([Row(k=99999, v="big")]), ["k"])

    def test_constraint_guard_is_case_insensitive(self, spark, table):
        table.add_constraint("k_bounds", "K >= 0")  # upper-case identifier
        with pytest.raises(ValueError, match="referenced by CHECK"):
            table.rename_column("k", "key")  # Spark resolves case-insensitively
        with pytest.raises(ValueError, match="referenced by CHECK"):
            table.drop_column("k")


class TestCdfDropRenameCollision:
    def test_changes_across_drop_then_rename_to_dropped_name(self, spark, tmp_path):
        """drop a; rename x->a between v_from and v_to: two old columns
        would alias to one target — the dropped column's old values must
        be discarded, not collide."""
        t = VersionedTable(spark, str(tmp_path / "cdf"))
        t.create(
            spark.createDataFrame([Row(k=i, a=f"a{i}", x=f"x{i}") for i in range(5)])
        )  # v1
        t.drop_column("a")  # v2
        t.optimize(n_files=1)  # v3: clears retired debt so the rename is legal
        t.rename_column("x", "a")  # v4: logical 'a' now carries x's values
        t.merge_into(spark.createDataFrame([Row(k=2, a="post2")]), ["k"])  # v5
        ch = t.changes(1, t.version(), keys=["k"])
        got = {(r["k"], r["_change_type"], r["a"]) for r in ch.collect()}
        # physical identity: v_to's logical 'a' IS old 'x' (rename is not
        # a data change), and v1's dropped 'a' values are discarded rather
        # than colliding — only the real merge-update reports
        assert got == {(2, "update_postimage", "post2")}


class TestExpireVersions:
    """expire_versions (Delta logRetentionDuration parity): manifests
    below the floor are removed, time travel past the floor raises the
    clear error, vacuum may then collect files exclusive to the expired
    prefix — and every pointer/checkpoint stays consistent throughout."""

    def _age(self, table, versions, seconds=10_000):
        import time

        past = time.time() - seconds
        for v in versions:
            os.utime(table._manifest_path(v), (past, past))

    def test_keep_last_drops_prefix_and_time_travel_raises(self, spark, table):
        from iotdatapipeline_spark.sources.versioned import VersionExpired

        for i in range(5):  # v2..v6
            table.merge_into(spark.createDataFrame([Row(k=0, v=f"u{i}")]), ["k"])
        assert table.version() == 6
        expired = table.expire_versions(keep_last=2)
        assert expired == [1, 2, 3, 4]
        assert table.earliest_version() == 5
        assert table.version() == 6  # head untouched
        assert dict(_rows(table.snapshot()))[0] == "u4"
        assert dict(_rows(table.snapshot(5)))[0] == "u3"  # floor readable
        with pytest.raises(VersionExpired, match="earliest readable version is v5"):
            table.snapshot(3)
        with pytest.raises(VersionExpired):
            table.restore(2)
        # history starts at the floor, no ENOENT
        assert [m["version"] for m in table.history()] == [5, 6]
        # a COLD handle sees the same floor
        cold = VersionedTable(spark, table.root)
        assert cold.earliest_version() == 5
        with pytest.raises(VersionExpired):
            cold.snapshot(1)

    def test_retention_by_age_keeps_young_manifests(self, spark, table):
        for i in range(3):  # v2..v4
            table.merge_into(spark.createDataFrame([Row(k=1, v=f"u{i}")]), ["k"])
        self._age(table, [1, 2])  # v1, v2 old; v3, v4 young
        assert table.expire_versions(retention_s=3600) == [1, 2]
        assert table.earliest_version() == 3
        # nothing further to do — idempotent
        assert table.expire_versions(retention_s=3600) == []

    def test_head_always_survives_even_when_old(self, spark, table):
        self._age(table, [1])
        assert table.expire_versions(retention_s=3600) == []
        assert table.earliest_version() == 1

    def test_vacuum_collects_files_exclusive_to_expired_versions(self, spark, table):
        # v2 rewrites EVERY file (merge touches all 4), so v1's files
        # become exclusive to v1
        src = spark.createDataFrame([Row(k=i, v=f"u{i}") for i in range(20)])
        table.merge_into(src, ["k"])
        v1_files = set(self_m1 := table._read_manifest(1)["files"])
        v2_files = set(table._read_manifest(2)["files"])
        assert not (v1_files & v2_files)
        # before expiry vacuum protects v1's files (time travel)
        assert table.vacuum(retention_s=0) == []
        table.expire_versions(keep_last=1)
        removed = set(table.vacuum(retention_s=0))
        assert removed == v1_files
        assert dict(_rows(table.snapshot()))[0] == "u0"

    def test_vacuum_fallback_survives_missing_checkpoint(self, spark, table):
        table.merge_into(spark.createDataFrame([Row(k=0, v="u")]), ["k"])
        table.expire_versions(keep_last=1)
        os.unlink(table._ckpt_path())  # corrupt/lost checkpoint
        cold = VersionedTable(spark, table.root)
        assert cold.vacuum(retention_s=0) is not None  # no ENOENT crash
        assert dict(_rows(cold.snapshot()))[0] == "u"

    def test_sidecar_hygiene_shared_sidecar_survives(self, spark, tmp_path):
        # delete_where reuses the base's stats sidecar by reference:
        # v2 points at v1's sidecar, so expiring v1 must NOT unlink it
        t = VersionedTable(spark, str(tmp_path / "clustered"))
        t.create(
            spark.createDataFrame([Row(k=i, v=f"base{i}") for i in range(20)]),
            n_files=4,
            cluster_by=["k"],
        )
        t.delete_where("k >= 15")  # v2 (DV delete: stats_file_ref)
        m1, m2 = t._read_manifest(1), t._read_manifest(2)
        assert m1["stats_file"] and m1["stats_file"] == m2["stats_file"]
        t.merge_into(spark.createDataFrame([Row(k=0, v="u")]), ["k"])  # v3
        t.expire_versions(keep_last=2)  # drops v1 only
        shared = os.path.join(t._log, m2["stats_file"])
        assert os.path.exists(shared)
        assert len(_rows(t.snapshot())) == 15
        # now expire v2 as well: its sidecar is orphaned and goes
        t.expire_versions(keep_last=1)
        assert not os.path.exists(shared)
        m3 = t._read_manifest(3)
        if m3.get("stats_file"):
            assert os.path.exists(os.path.join(t._log, m3["stats_file"]))

    def test_commits_continue_after_expiry(self, spark, table):
        table.merge_into(spark.createDataFrame([Row(k=0, v="u")]), ["k"])
        table.expire_versions(keep_last=1)
        v = table.merge_into(spark.createDataFrame([Row(k=1, v="w")]), ["k"])
        assert v == 3
        got = dict(_rows(table.snapshot()))
        assert got[0] == "u" and got[1] == "w"
        assert [m["version"] for m in table.history()] == [2, 3]


class TestTimestampTravel:
    """TIMESTAMP AS OF: manifests record commit wall-clock ('ts');
    version_at_timestamp resolves the latest version at-or-before a
    bound, with Delta's edge semantics (after-head -> head, before-
    first -> error, expired prefix -> VersionExpired)."""

    def test_resolution_between_commits(self, spark, table):
        t1 = table.commit_timestamp(1)
        table.merge_into(spark.createDataFrame([Row(k=0, v="u")]), ["k"])  # v2
        t2 = table.commit_timestamp(2)
        assert t1 <= t2
        assert table.version_at_timestamp(t1) == 1
        assert table.version_at_timestamp((t1 + t2) / 2) in (1, 2)  # ties at equal clocks
        assert table.version_at_timestamp(t2) == 2
        assert table.version_at_timestamp(t2 + 3600) == 2  # after head -> head
        got = dict(_rows(table.snapshot(timestamp=t1)))
        assert got[0] == "base0"
        import datetime

        dt = datetime.datetime.fromtimestamp(t2 + 1)
        assert dict(_rows(table.snapshot(timestamp=dt)))[0] == "u"

    def test_before_first_commit_raises(self, table):
        with pytest.raises(ValueError, match="at or before"):
            table.version_at_timestamp(table.commit_timestamp(1) - 10)
        with pytest.raises(ValueError, match="not both"):
            table.snapshot(1, timestamp=0.0)

    def test_expired_prefix_raises_version_expired(self, spark, table):
        from iotdatapipeline_spark.sources.versioned import VersionExpired

        t1 = table.commit_timestamp(1)
        table.merge_into(spark.createDataFrame([Row(k=0, v="u")]), ["k"])
        table.expire_versions(keep_last=1)
        with pytest.raises(VersionExpired, match="expired"):
            table.version_at_timestamp(t1 - 0.001 + 0)  # strictly before v2? guard below
        # precisely: any ts < v2's commit now fails as expired
        with pytest.raises(VersionExpired):
            table.version_at_timestamp(min(t1, table.commit_timestamp(2) - 0.001))

    def test_mtime_fallback_for_pre_field_manifests(self, spark, table):
        # simulate a pre-'ts' manifest: strip the field on disk
        import json as _json

        p = table._manifest_path(1)
        with open(p) as f:
            m = _json.load(f)
        ts_recorded = m.pop("ts")
        with open(p, "w") as f:
            _json.dump(m, f)
        cold = VersionedTable(spark, table.root)
        got = cold.commit_timestamp(1)
        assert abs(got - os.path.getmtime(p)) < 1e-6
        assert cold.version_at_timestamp(max(got, ts_recorded) + 1) == 1


class TestClone:
    def test_clone_is_zero_copy_and_independent(self, spark, table, tmp_path):
        table.merge_into(spark.createDataFrame([Row(k=0, v="u")]), ["k"])  # v2
        dest_root = str(tmp_path / "clone")
        dest = table.clone_to(dest_root, version=1)
        # snapshot equals the source AT THE CLONED VERSION
        assert _rows(dest.snapshot()) == _rows(table.snapshot(1))
        assert dest.version() == 1
        assert dest._read_manifest(1)["op"] == f"clone:{table.root}@v1"
        # zero-copy: shared inodes, no duplicated bytes
        m = table._read_manifest(1)
        for f in m["files"]:
            src, dst = os.path.join(table._data, f), os.path.join(dest._data, f)
            assert os.stat(src).st_ino == os.stat(dst).st_ino
        # independence: writes diverge both ways
        dest.merge_into(spark.createDataFrame([Row(k=1, v="clone1")]), ["k"])
        table.merge_into(spark.createDataFrame([Row(k=1, v="src1")]), ["k"])
        assert dict(_rows(dest.snapshot()))[1] == "clone1"
        assert dict(_rows(table.snapshot()))[1] == "src1"
        assert dict(_rows(dest.snapshot()))[0] == "base0"  # cloned v1, not v2
        # independence under hygiene: source vacuum/expire leave clone intact
        table.expire_versions(keep_last=1)
        table.vacuum(retention_s=0)
        assert dict(_rows(dest.snapshot(1)))[0] == "base0"

    def test_clone_carries_constraints_dvs_and_mapping(self, spark, tmp_path):
        from iotdatapipeline_spark.sources.versioned import ConstraintViolation

        t = VersionedTable(spark, str(tmp_path / "src"))
        t.create(
            spark.createDataFrame([Row(k=i, v=f"a{i}") for i in range(20)]),
            n_files=4,
            cluster_by=["k"],
        )
        t.add_constraint("k_nonneg", "k >= 0")
        t.delete_where("k >= 18")  # DV delete
        t.rename_column("v", "val")  # column mapping
        dest = t.clone_to(str(tmp_path / "dst"))
        assert sorted(dest.snapshot().columns) == ["k", "val"]
        assert dest.snapshot().count() == 18
        # DV map carried: the deleted rows stay deleted in the clone
        assert not {r["k"] for r in dest.snapshot().collect()} & {18, 19}
        # constraints carried and enforced in the clone
        with pytest.raises(ConstraintViolation):
            dest.merge_into(spark.createDataFrame([Row(k=-5, val="bad")]), ["k"])
        # txn map starts EMPTY: a source micro-batch replay must apply
        assert dest._read_manifest(1)["txns"] == {}

    def test_clone_timestamp_and_errors(self, spark, table, tmp_path):
        t1 = table.commit_timestamp(1)
        table.merge_into(spark.createDataFrame([Row(k=0, v="u")]), ["k"])
        dest = table.clone_to(str(tmp_path / "ts_clone"), timestamp=t1)
        assert dict(_rows(dest.snapshot()))[0] == "base0"
        with pytest.raises(ValueError, match="already exists"):
            table.clone_to(str(tmp_path / "ts_clone"))
        with pytest.raises(ValueError, match="not both"):
            table.clone_to(str(tmp_path / "x"), version=1, timestamp=t1)


class TestBloomIndex:
    """Per-file Bloom filter index (Delta bloom-filter-index parity):
    point-lookup skipping on a column UNCORRELATED with the clustering,
    where min/max ranges prune nothing. False positives may keep extra
    files; a pruned file must be provably value-free."""

    @pytest.fixture()
    def btable(self, spark, tmp_path):
        # k-clustered, val scattered (Knuth-hash) so every file's
        # [min(val), max(val)] spans the domain — ranges are useless
        t = VersionedTable(spark, str(tmp_path / "bloom"))
        rows = [Row(k=i, val=(i * 2654435761) % 1_000_000, tag=f"t{i%7}") for i in range(400)]
        t.create(spark.createDataFrame(rows), n_files=8, cluster_by=["k"])
        return t

    def test_point_lookup_prunes_and_matches_filter(self, spark, btable):
        v = btable.add_bloom_index(["val"])
        assert v == 2
        probe = (5 * 2654435761) % 1_000_000  # k=5's value
        kept, total = btable.pruned_files(f"val = {probe}")
        assert total == 8 and kept < total  # ranges alone keep all 8
        got = btable.scan(f"val = {probe}").collect()
        assert [r["k"] for r in got] == [5]
        # range-only pruning really is useless here (the bloom did it)
        kept_r, _ = btable.pruned_files({"val": (probe, probe + 1)})
        assert kept_r == 8

    def test_absent_value_reads_nothing_wrong(self, btable):
        btable.add_bloom_index(["val"])
        assert btable.scan("val = 999999999").count() == 0

    def test_string_column_and_type_guard(self, spark, btable, tmp_path):
        btable.add_bloom_index(["tag"])
        got = btable.scan("tag = 't3'")
        assert got.count() == len([i for i in range(400) if i % 7 == 3])
        with pytest.raises(ValueError, match="no such column"):
            btable.add_bloom_index(["nope"])
        t2 = VersionedTable(spark, str(tmp_path / "floaty"))
        t2.create(spark.createDataFrame([Row(k=1, x=1.5)], "k int, x double"))
        with pytest.raises(ValueError, match="integral or string"):
            t2.add_bloom_index(["x"])

    def test_new_files_conservative_then_incremental_reindex(self, spark, btable):
        btable.add_bloom_index(["val"])
        # new rows via merge -> new files lack bloom entries -> kept
        new = spark.createDataFrame([Row(k=1000, val=777_777, tag="tx")])
        btable.merge_into(new, ["k"])
        got = btable.scan("val = 777777").collect()
        assert [r["k"] for r in got] == [1000]
        kept_before, total_before = btable.pruned_files("val = 777777")
        # incremental: only the new files are hashed; pruning resumes
        v = btable.add_bloom_index(["val"])
        assert v == btable.version()
        kept_after, total_after = btable.pruned_files("val = 777777")
        assert kept_after <= kept_before
        assert btable.scan("val = 777777").count() == 1
        # idempotent no-op when fully indexed
        assert btable.add_bloom_index(["val"]) == btable.version()

    def test_nulls_are_not_indexed_and_dont_break(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "bn"))
        rows = [Row(k=i, val=None if i % 3 == 0 else i * 37) for i in range(60)]
        t.create(spark.createDataFrame(rows, "k int, val long"), n_files=4, cluster_by=["k"])
        t.add_bloom_index(["val"])
        assert t.scan("val = 37").count() == 1
        assert t.snapshot().filter("val is null").count() == 20

    def test_float_literal_never_false_negative_prunes(self, spark, btable):
        """r11 ADVICE (high): `val = 5.0` parses to float; str(5.0) is
        '5.0' but the index stores CAST(val AS STRING) = '5' — an
        unguarded probe would prune EVERY file and silently lose the
        match. Float equality must skip the bloom (keep all files) and
        the scan must still return the row."""
        btable.add_bloom_index(["val"])
        probe = (5 * 2654435761) % 1_000_000  # k=5's value, an integer
        kept, total = btable.pruned_files(f"val = {probe}.0")
        assert kept == total == 8  # probe skipped: conservative keep
        assert [r["k"] for r in btable.scan(f"val = {probe}.0").collect()] == [5]

    def test_cross_type_equality_never_false_negative_prunes(self, spark, tmp_path):
        """r11 review: SQL coercion makes "k = '05'" TRUE for int k=5,
        but str '05' != the indexed canon '5' — probes must be
        SAME-TYPE as the indexed column or conservatively keep. Mirror
        case: an int literal against a string column holding '05'."""
        t = VersionedTable(spark, str(tmp_path / "bx"))
        rows = [Row(k=i, sv=f"{i:02d}") for i in range(40)]
        t.create(spark.createDataFrame(rows), n_files=4, cluster_by=["k"])
        t.add_bloom_index(["k", "sv"])
        # quoted numeric on the int column: probe skipped, rows correct
        assert [r["k"] for r in t.scan("k = '5'").collect()] == [5]
        kept, total = t.pruned_files("k = '5'")
        assert kept == total
        # int literal on the string column ('05'): coercion matches,
        # the bloom must not prune the true file
        assert [r["k"] for r in t.scan("sv = 5").collect()] == [5]
        # same-type probes still prune
        kept_i, total_i = t.pruned_files("sv = '05'")
        assert kept_i < total_i
        assert [r["k"] for r in t.scan("sv = '05'").collect()] == [5]

    def test_datetime_literal_never_false_negative_prunes(self, spark, tmp_path):
        """A 'T'-separated timestamp STRING column: the parser turns the
        literal into a datetime whose str() uses ' ' — probing with it
        would prune the file holding the true match. Must keep."""
        t = VersionedTable(spark, str(tmp_path / "bdt"))
        rows = [Row(k=i, ts=f"2024-01-0{1 + i % 9}T10:00:00") for i in range(40)]
        t.create(spark.createDataFrame(rows), n_files=4, cluster_by=["k"])
        t.add_bloom_index(["ts"])
        got = t.scan("ts = '2024-01-03T10:00:00'")
        assert got.count() == len([i for i in range(40) if i % 9 == 2])

    def test_rename_rekeys_bloom(self, spark, btable):
        btable.add_bloom_index(["val"])
        btable.rename_column("val", "value")
        probe = (5 * 2654435761) % 1_000_000
        kept, total = btable.pruned_files(f"value = {probe}")
        assert kept < total  # still prunes under the new name
        assert [r["k"] for r in btable.scan(f"value = {probe}").collect()] == [5]

    def test_bloom_survives_clone_restore_expire(self, spark, btable, tmp_path):
        btable.add_bloom_index(["val"])
        probe = (5 * 2654435761) % 1_000_000
        clone = btable.clone_to(str(tmp_path / "bclone"))
        kept, total = clone.pruned_files(f"val = {probe}")
        assert kept < total
        btable.merge_into(spark.createDataFrame([Row(k=5, val=0, tag="z")]), ["k"])
        btable.restore(2)  # back to the indexed state
        kept, total = btable.pruned_files(f"val = {probe}")
        assert kept < total
        btable.expire_versions(keep_last=1)
        cold = VersionedTable(spark, btable.root)
        kept, total = cold.pruned_files(f"val = {probe}")
        assert kept < total
        assert [r["k"] for r in cold.scan(f"val = {probe}").collect()] == [5]


class TestWidenColumn:
    """Type widening (Delta parity): manifest-only ALTER COLUMN TYPE;
    narrow old files and wide new files coexist under one logical
    schema; narrowing and lossy conversions refuse."""

    def test_widen_int_to_bigint_reads_both_file_generations(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "w"))
        t.create(
            spark.createDataFrame([(i, i * 10) for i in range(10)], "k int, v int"),
            n_files=2,
            cluster_by=["k"],
        )
        v = t.widen_column("v", "bigint")
        assert v == 2
        assert dict(t.snapshot().dtypes)["v"] == "bigint"
        # post-widen writer lands values beyond int32 range
        big = 2**40
        t.merge_into(spark.createDataFrame([(99, big)], "k int, v long"), ["k"])
        got = {r["k"]: r["v"] for r in t.snapshot().collect()}
        assert got[99] == big and got[3] == 30
        # time travel: pre-widen version still reads as int
        assert dict(t.snapshot(1).dtypes)["v"] == "int"
        # idempotent no-op
        assert t.widen_column("v", "bigint") == t.version()

    def test_narrowing_and_lossy_refuse(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "w2"))
        t.create(spark.createDataFrame([(1, 2, 1.5)], "k int, v bigint, f float"))
        with pytest.raises(ValueError, match="widenings"):
            t.widen_column("v", "int")  # narrowing
        with pytest.raises(ValueError, match="widenings"):
            t.widen_column("v", "double")  # lossy above 2^53
        with pytest.raises(ValueError, match="no such column"):
            t.widen_column("nope", "bigint")
        assert t.widen_column("f", "double") == 2  # float -> double OK
        assert dict(t.snapshot().dtypes)["f"] == "double"

    def test_widen_stays_legal_under_check_constraint(self, spark, tmp_path):
        """r11 ADVICE follow-up: widening deliberately skips the
        constraint-ref guard (unlike rename/drop) — it is value-
        preserving, so the CHECK expression keeps evaluating
        identically, before and after, old files and new."""
        t = VersionedTable(spark, str(tmp_path / "wg"))
        t.create(spark.createDataFrame([(1, 2)], "k int, v int"))
        t.add_constraint("v_pos", "v > 0")
        assert t.widen_column("v", "bigint") > 0
        assert dict(t.snapshot().dtypes)["v"] == "bigint"
        # the constraint survives the widen and still enforces
        with pytest.raises(Exception, match="v_pos"):
            t.merge_into(spark.createDataFrame([(9, -5)], "k int, v bigint"), ["k"])
        t.merge_into(spark.createDataFrame([(9, 2**40)], "k int, v bigint"), ["k"])
        got = {r["k"]: r["v"] for r in t.snapshot().collect()}
        assert got == {1: 2, 9: 2**40}

    def test_cdf_across_widen_boundary(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "w3"))
        t.create(
            spark.createDataFrame([(i, i * 10) for i in range(5)], "k int, v int"),
            cluster_by=["k"],
        )
        t.widen_column("v", "bigint")  # v2: metadata-only
        t.merge_into(spark.createDataFrame([(2, 2**35)], "k int, v long"), ["k"])  # v3
        ch = t.changes(1, 3)
        got = {(r["k"], r["_change_type"], r["v"]) for r in ch.collect()}
        # the widen itself is NOT a data change; only the real update reports
        assert got == {(2, "update_postimage", 2**35)}

    def test_stats_pruning_and_bloom_survive_widen(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "w4"))
        rows = [(i, (i * 2654435761) % 1_000_000) for i in range(200)]
        t.create(spark.createDataFrame(rows, "k int, val int"), n_files=8, cluster_by=["k"])
        t.add_bloom_index(["val"])
        t.widen_column("val", "bigint")
        probe = (5 * 2654435761) % 1_000_000
        kept, total = t.pruned_files(f"val = {probe}")
        assert kept < total  # bloom canonical form is width-independent
        assert [r["k"] for r in t.scan(f"val = {probe}").collect()] == [5]
        # range pruning on the widened CLUSTER column still works
        kept_k, total_k = t.pruned_files({"k": (0, 10)})
        assert kept_k < total_k


class TestBloomConcurrency:
    def test_add_bloom_index_retries_over_concurrent_merge(self, spark, tmp_path):
        """OCC: a merge landing between the index build and its commit
        must CommitConflict the index commit; the retry recomputes over
        the new head, so the final index covers the merged files too."""
        root = str(tmp_path / "bocc")
        t = VersionedTable(spark, root)
        rows = [Row(k=i, val=(i * 2654435761) % 1_000_000) for i in range(200)]
        t.create(spark.createDataFrame(rows), n_files=8, cluster_by=["k"])

        t2 = VersionedTable(spark, root)
        real = t._try_commit
        fired = {"n": 0}

        def racing(*args, **kwargs):
            if fired["n"] == 0:
                fired["n"] += 1
                t2.merge_into(
                    spark.createDataFrame([Row(k=999, val=424_242)]), ["k"]
                )  # wins the version this index commit targeted
            return real(*args, **kwargs)

        t.__dict__["_try_commit"] = racing
        v = t.add_bloom_index(["val"])
        del t.__dict__["_try_commit"]
        assert fired["n"] == 1
        assert v == t.version() == 3  # create, racing merge, index
        # the retried index covers the racer's file: both probes prune
        cold = VersionedTable(spark, root)
        for probe, want_k in [((5 * 2654435761) % 1_000_000, 5), (424_242, 999)]:
            kept, total = cold.pruned_files(f"val = {probe}")
            assert kept < total
            assert [r["k"] for r in cold.scan(f"val = {probe}").collect()] == [want_k]


class TestBloomMergePruning:
    """Bloom-refined candidate pruning on the merge/keyed-delete path:
    scattered keys on a non-clustered column defeat [min, max] bounds
    (one global range keeps every file); the per-file bloom probe keeps
    only files where some source key is maybe-present."""

    @pytest.fixture()
    def ptable(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "bm"))
        rows = [Row(k=i, val=(i * 2654435761) % 1_000_000, v=f"a{i}") for i in range(400)]
        t.create(spark.createDataFrame(rows), n_files=8, cluster_by=["k"])
        t.add_bloom_index(["val"])
        return t

    def test_keyed_dv_delete_touches_only_bloom_hit_files(self, spark, ptable):
        targets = [(5 * 2654435761) % 1_000_000, (200 * 2654435761) % 1_000_000]
        src = spark.createDataFrame([(v,) for v in targets], "val long")
        v = ptable.delete_matching(src, ["val"])
        dvs = ptable._read_manifest(v).get("dvs") or {}
        # without the bloom every file is a candidate; with it, only
        # the (<=2 + fp) files actually holding the keys grew DVs
        assert 1 <= len(dvs) <= 3
        left = {r["k"] for r in ptable.snapshot().collect()}
        assert 5 not in left and 200 not in left and len(left) == 398

    def test_cow_merge_rewrites_only_bloom_hit_files(self, spark, ptable):
        before = set(ptable._read_manifest(ptable.version())["files"])
        probe = (7 * 2654435761) % 1_000_000
        src = spark.createDataFrame([(7, probe, "UPDATED")], "k bigint, val long, v string")
        v = ptable.merge_into(src, ["val"])
        after = set(ptable._read_manifest(v)["files"])
        # untouched files carried by reference: at most 1-2 rewritten
        assert len(before & after) >= len(before) - 2
        got = {r["k"]: r["v"] for r in ptable.snapshot().collect()}
        assert got[7] == "UPDATED" and got[8] == "a8" and len(got) == 400

    def test_all_null_source_keys_touch_nothing(self, spark, ptable):
        src = spark.createDataFrame([(9999, None, "x")], "k bigint, val long, v string")
        base = ptable.version()
        ptable.merge_into(src, ["val"])
        # NULL never equality-matches: pure insert, no file rewritten
        m = ptable._read_manifest(ptable.version())
        assert set(ptable._read_manifest(base)["files"]) <= set(m["files"])
        assert ptable.snapshot().count() == 401

    def test_large_source_skips_probe_but_stays_correct(self, spark, ptable):
        cap = VersionedTable.BLOOM_MERGE_PROBE_CAP
        vals = [((i + 10_000) * 97) % 2_000_000 for i in range(cap + 50)]
        src = spark.createDataFrame(
            [(100_000 + i, v, "bulk") for i, v in enumerate(vals)],
            "k bigint, val long, v string",
        )
        ptable.merge_into(src, ["val"])
        assert ptable.snapshot().count() >= 400  # correctness over pruning


class TestConvert:
    def test_convert_links_files_and_table_is_fully_functional(self, spark, tmp_path):
        src_dir = str(tmp_path / "plain")
        df = spark.createDataFrame([Row(k=i, v=f"p{i}") for i in range(40)])
        df.repartition(4).write.parquet(src_dir)
        root = str(tmp_path / "converted")
        t = VersionedTable.convert_parquet_dir(spark, src_dir, root, cluster_by=["k"])
        assert t.version() == 1
        assert t._read_manifest(1)["op"] == f"convert:{src_dir}"
        assert _rows(t.snapshot()) == [(i, f"p{i}") for i in range(40)]
        # zero-copy: shared inodes with the (untouched) source
        for f in t._read_manifest(1)["files"]:
            assert os.stat(os.path.join(src_dir, f)).st_ino == os.stat(
                os.path.join(t._data, f)
            ).st_ino
        # the converted table is a first-class table: merge, DV, travel
        t.merge_into(spark.createDataFrame([Row(k=3, v="upd")]), ["k"])
        t.delete_where("k >= 38")
        got = dict(_rows(t.snapshot()))
        assert got[3] == "upd" and 38 not in got and len(got) == 38
        assert dict(_rows(t.snapshot(1)))[3] == "p3"
        # source dir unchanged throughout
        assert spark.read.parquet(src_dir).count() == 40

    def test_convert_guards(self, spark, tmp_path):
        empty = tmp_path / "empty"
        empty.mkdir()
        with pytest.raises(ValueError, match="no parquet files"):
            VersionedTable.convert_parquet_dir(spark, str(empty), str(tmp_path / "x"))
        src_dir = str(tmp_path / "p2")
        spark.createDataFrame([Row(k=1, v="a")]).write.parquet(src_dir)
        root = str(tmp_path / "c2")
        VersionedTable.convert_parquet_dir(spark, src_dir, root)
        with pytest.raises(ValueError, match="already exists"):
            VersionedTable.convert_parquet_dir(spark, src_dir, root)


class TestOperationMetrics:
    def test_metrics_recorded_per_commit(self, spark, table):
        src = spark.createDataFrame([Row(k=0, v="u0"), Row(k=99, v="new")])
        table.merge_into(src, ["k"])
        h = table.history()
        m1, m2 = h[0].get("metrics") or {}, h[1].get("metrics") or {}
        assert m1["files_added"] == 4 and m1["files_removed"] == 0
        assert m1["rows_added"] == 20
        # the merge rewrote only touched files and added their rows +
        # the insert; removed = the rewritten originals
        assert m2["files_added"] >= 1 and m2["files_removed"] >= 1
        assert m2["rows_added"] >= 2
        # metadata-only commits move no rows
        table.add_constraint("k_pos", "k >= 0")
        m3 = table.history()[-1]["metrics"]
        assert m3 == {"files_added": 0, "files_removed": 0, "rows_added": 0}


class TestModelBasedLifecycle:
    @pytest.mark.slow
    @pytest.mark.parametrize("seed", [4, 13, 202, 777, 3141])
    def test_random_lifecycle_ops_match_dict_model(self, spark, tmp_path, seed):
        """Model-based check of the r10 lifecycle surface woven into
        the write protocol: widen_column, add_bloom_index, restore,
        clone_to and expire_versions interleaved with COW/MOR upserts
        and DV deletes must agree with a plain-dict model at every
        step, keep bloom-probed point lookups exact, keep clones
        isolated, and keep time travel correct for every version that
        is still readable after expiry."""
        import random

        from iotdatapipeline_spark.sources.versioned import VersionExpired

        rng = random.Random(seed)
        t = VersionedTable(spark, str(tmp_path / f"lc{seed}"))
        # model: k -> (q, v)
        model = {i: (i * 11, f"v0-{i}") for i in range(0, 24, 2)}
        t.create(
            spark.createDataFrame(
                [Row(k=k, q=q, v=v) for k, (q, v) in model.items()],
                "k bigint, q int, v string",
            ),
            n_files=3,
            cluster_by=["k"],
        )
        snapshots = {1: dict(model)}
        widened = False
        clones = 0
        ops = [
            "upsert", "mor_upsert", "dv_delete", "widen", "bloom",
            "restore", "clone", "expire", "cdf_toggle",
        ]

        def expected_changes(old, new):
            out = set()
            for k, qv in new.items():
                if k not in old:
                    out.add((k, qv[0], qv[1], "insert"))
                elif old[k] != qv:
                    out.add((k, qv[0], qv[1], "update_postimage"))
            for k, qv in old.items():
                if k not in new:
                    out.add((k, qv[0], qv[1], "delete"))
            return out
        for step in range(14):
            op = rng.choice(ops)
            head_before = t.version()
            # the live schema decides what a correct writer sends: a
            # restore below the widen point narrows q back to int, and
            # a wider-typed source is now REFUSED (not silently
            # committed as corruption — the bug this fuzz found)
            widened = dict(t.snapshot().dtypes)["q"] == "bigint"
            if op == "widen":
                t.widen_column("q", "bigint")  # no-op after the first
                widened = True
            elif op == "bloom":
                t.add_bloom_index(["q"])  # incremental / no-op when covered
            elif op == "dv_delete":
                m_, r_ = rng.choice([(3, 0), (5, 1)])
                t.delete_where(f"k % {m_} = {r_}")
                model = {k: qv for k, qv in model.items() if k % m_ != r_}
            elif op == "restore":
                readable = [v for v in snapshots if v >= t.earliest_version()]
                v = rng.choice(readable)
                t.restore(v)
                model = dict(snapshots[v])
            elif op == "clone":
                clones += 1
                c = t.clone_to(str(tmp_path / f"lc{seed}-clone{clones}"))
                got_c = {r["k"]: (r["q"], r["v"]) for r in c.snapshot().collect()}
                assert got_c == model, f"step {step}: clone diverged at birth"
                # clone writes never leak back
                c.merge_into(
                    spark.createDataFrame([Row(k=777, q=1, v="clone-only")], "k bigint, q bigint, v string")
                    if widened
                    else spark.createDataFrame([Row(k=777, q=1, v="clone-only")], "k bigint, q int, v string"),
                    ["k"],
                )
            elif op == "expire":
                t.expire_versions(keep_last=rng.randint(2, 4))
                floor = t.earliest_version()
                snapshots = {v: s for v, s in snapshots.items() if v >= floor}
            elif op == "cdf_toggle":
                # r12: flip the commit-time feed property — later
                # changes() ranges mix fast-served and derive-mode
                # commits; both must net to the model's diff
                t.set_cdf(rng.random() < 0.5)
            else:
                ks = rng.sample(range(30), rng.randint(1, 4))
                big = widened and rng.random() < 0.5
                rows = [
                    Row(k=k, q=(2**40 + k) if big else k * 7, v=f"s{step}-{k}") for k in ks
                ]
                src = spark.createDataFrame(
                    rows, f"k bigint, q {'bigint' if widened else 'int'}, v string"
                )
                t.merge_into(src, ["k"], strategy="mor" if op == "mor_upsert" else "cow")
                model.update({r.k: (r.q, r.v) for r in rows})
            got = {r["k"]: (r["q"], r["v"]) for r in t.snapshot().collect()}
            assert got == model, f"step {step} ({op})"
            if t.version() > head_before:
                snapshots[t.version()] = dict(model)
            # bloom-probed point lookup stays exact through every op mix
            if model and rng.random() < 0.5:
                k_probe = rng.choice(list(model))
                q_probe = model[k_probe][0]
                got_q = {
                    r["k"] for r in t.scan(f"q = {q_probe}").collect()
                }
                assert got_q == {k for k, (q, _) in model.items() if q == q_probe}, (
                    f"step {step} ({op}) bloom probe q={q_probe}"
                )
            # r12: the change feed over a random readable range must net
            # to exactly the model diff — whether served from commit
            # files, the snapshot-diff fallback, or a mix (restores,
            # cdf_toggle windows and pre/post segments interleave here)
            if rng.random() < 0.4:
                head = t.version()
                readable = [v for v in snapshots if v >= t.earliest_version() and v <= head]
                if readable:
                    v_from = rng.choice(readable)
                    got_ch = {
                        (r["k"], r["q"], r["v"], r["_change_type"])
                        for r in t.changes(v_from, head, ["k"]).collect()
                    }
                    assert got_ch == expected_changes(snapshots[v_from], model), (
                        f"step {step} ({op}) changes({v_from}, {head})"
                    )
        # every still-readable version time-travels to its recorded state
        floor = t.earliest_version()
        for v, expect in snapshots.items():
            if v >= floor:
                assert {
                    r["k"]: (r["q"], r["v"]) for r in t.snapshot(v).collect()
                } == expect, f"time travel v{v}"
        # and versions below the floor raise the clear error
        if floor > 1:
            with pytest.raises(VersionExpired):
                t.snapshot(floor - 1)


class TestModelBasedIdentitySync:
    @pytest.mark.slow
    @pytest.mark.parametrize("seed", [7, 420, 1618, 2718, 8128])
    def test_identity_and_sync_ops_match_dict_model(self, spark, tmp_path, seed):
        """Model-based check of the r11 surface: set/drop_identity and
        NOT-MATCHED-BY-SOURCE sync merges interleaved with COW/MOR
        upserts, DV deletes and restores must agree with a dict model
        at every step — in particular the watermark must survive a
        restore FLOORED at the head's (ids assigned after the restore
        point are never reissued) and identity declarations must
        restore with the restored version's metadata."""
        import random

        rng = random.Random(seed)
        t = VersionedTable(spark, str(tmp_path / f"is{seed}"))
        # model: k -> (q, v, rid); rid pre-assigned 1..N by k order
        ks0 = list(range(0, 24, 2))
        model = {k: (k * 11, f"v0-{k}", i + 1) for i, k in enumerate(ks0)}
        t.create(
            spark.createDataFrame(
                [Row(k=k, q=q, v=v, rid=rid) for k, (q, v, rid) in model.items()],
                "k bigint, q int, v string, rid bigint",
            ),
            n_files=3,
            cluster_by=["k"],
        )
        declared, wm = False, None
        snapshots = {1: (dict(model), declared, wm)}
        ops = [
            "upsert", "mor_upsert", "sync", "mor_sync",
            "declare", "drop", "dv_delete", "restore",
        ]

        def make_src(ks, step):
            """Source rows honoring the identity contract; returns
            (df, rows) where rows include the rid the MODEL expects."""
            nonlocal wm
            fresh = sorted(k for k in ks if k not in model)
            if declared:
                rows = []
                for k in ks:
                    if k in model:
                        rid = model[k][2]
                    else:
                        rid = wm + 1 + fresh.index(k)
                    rows.append((k, k * 7, f"s{step}-{k}", rid))
                wm += len(fresh)
                df = spark.createDataFrame(
                    [Row(k=k, q=q, v=v) for k, q, v, _ in rows],
                    "k bigint, q int, v string",
                )
            else:
                rows = [(k, k * 7, f"s{step}-{k}", 100000 + step * 1000 + k) for k in ks]
                df = spark.createDataFrame(
                    [Row(k=k, q=q, v=v, rid=r) for k, q, v, r in rows],
                    "k bigint, q int, v string, rid bigint",
                )
            return df, rows

        for step in range(14):
            op = rng.choice(ops)
            head_before = t.version()
            if op == "declare":
                if declared:
                    continue
                t.set_identity("rid")
                declared = True
                wm = max(r for (_, _, r) in model.values()) if model else 0
            elif op == "drop":
                if not declared:
                    continue
                t.drop_identity("rid")
                declared, wm = False, None
            elif op == "dv_delete":
                m_, r_ = rng.choice([(3, 0), (5, 1)])
                t.delete_where(f"k % {m_} = {r_}")
                model = {k: x for k, x in model.items() if k % m_ != r_}
            elif op == "restore":
                readable = [v for v in snapshots if v >= t.earliest_version()]
                v = rng.choice(readable)
                head_wm = wm if declared else 0
                t.restore(v)
                model, declared, r_wm = snapshots[v]
                model = dict(model)
                # declarations restore with the version; the watermark
                # floors at the head's so ids are never reissued
                wm = max(r_wm or 0, head_wm or 0) if declared else None
            elif op in ("sync", "mor_sync"):
                ks = rng.sample(range(30), rng.randint(1, 4))
                m_, r_ = rng.choice([(4, 1), (7, 2)])
                df, rows = make_src(ks, step)
                t.merge_into(
                    df,
                    ["k"],
                    strategy="mor" if op == "mor_sync" else "cow",
                    not_matched_by_source="delete",
                    not_matched_by_source_condition=f"k % {m_} = {r_}",
                )
                ks_set = set(ks)
                model = {
                    k: x for k, x in model.items() if k in ks_set or k % m_ != r_
                }
                model.update({k: (q, v, r) for k, q, v, r in rows})
            else:
                ks = rng.sample(range(30), rng.randint(1, 4))
                df, rows = make_src(ks, step)
                t.merge_into(df, ["k"], strategy="mor" if op == "mor_upsert" else "cow")
                model.update({k: (q, v, r) for k, q, v, r in rows})
            got = {r["k"]: (r["q"], r["v"], r["rid"]) for r in t.snapshot().collect()}
            assert got == model, f"step {step} ({op})"
            # live manifest agrees on declaration + watermark
            det = t.describe()
            if declared:
                assert det["identity"] == {"rid": wm}, f"step {step} ({op}) watermark"
            else:
                assert det["identity"] == {}, f"step {step} ({op}) declaration"
            if t.version() > head_before:
                snapshots[t.version()] = (dict(model), declared, wm)
        # ids unique at every recorded (still-readable) version
        floor = t.earliest_version()
        for v, (expect, _, _) in snapshots.items():
            if v >= floor:
                got_v = {
                    r["k"]: (r["q"], r["v"], r["rid"]) for r in t.snapshot(v).collect()
                }
                assert got_v == expect, f"time travel v{v}"
                rids = [r for (_, _, r) in got_v.values()]
                assert len(rids) == len(set(rids)), f"duplicate rid at v{v}"


class TestMergeTypeReconciliation:
    """_align_insert type policy: narrower/equal source casts up;
    wider refuses without schema_evolution (auto-widens with);
    incompatible refuses. Before this, a wider source committed wide
    files under the narrow manifest schema — table bricked."""

    @pytest.fixture()
    def ntable(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "tr"))
        t.create(
            spark.createDataFrame([(i, i * 10) for i in range(10)], "k bigint, q int"),
            n_files=2,
            cluster_by=["k"],
        )
        return t

    def test_wider_source_refused_with_pointer(self, spark, ntable):
        src = spark.createDataFrame([(3, 2**40)], "k bigint, q bigint")
        with pytest.raises(ValueError, match="widen_column"):
            ntable.merge_into(src, ["k"])
        with pytest.raises(ValueError, match="widen_column"):
            ntable.merge_into(src, ["k"], strategy="mor")
        # the refused merges left no commit and the table still reads
        assert ntable.version() == 1
        assert ntable.snapshot().count() == 10

    def test_wider_source_auto_widens_with_schema_evolution(self, spark, ntable):
        src = spark.createDataFrame([(3, 2**40)], "k bigint, q bigint")
        ntable.merge_into(src, ["k"], schema_evolution=True)
        assert dict(ntable.snapshot().dtypes)["q"] == "bigint"
        got = {r["k"]: r["q"] for r in ntable.snapshot().collect()}
        assert got[3] == 2**40 and got[4] == 40 and len(got) == 10

    def test_narrower_source_casts_up_silently(self, spark, ntable):
        ntable.widen_column("q", "bigint")
        src = spark.createDataFrame([(3, 777)], "k bigint, q int")  # narrow source
        ntable.merge_into(src, ["k"])
        got = {r["k"]: r["q"] for r in ntable.snapshot().collect()}
        assert got[3] == 777 and dict(ntable.snapshot().dtypes)["q"] == "bigint"

    def test_complex_type_nullability_only_difference_merges(self, spark, tmp_path):
        """r11 ADVICE (medium): DataType equality is strict about
        containsNull, so a source array<int> (containsNull=false)
        against the table's array<int> (containsNull=true) fell
        through both _WIDENINGS lookups and refused — but the cast is
        a value-preserving no-op. Equal simpleString must merge."""
        from pyspark.sql.types import (
            ArrayType, IntegerType, LongType, StructField, StructType,
        )

        t = VersionedTable(spark, str(tmp_path / "nul"))
        t.create(
            spark.createDataFrame(
                [(1, [1, 2]), (2, [3])], "k bigint, arr array<int>"
            ),
            cluster_by=["k"],
        )
        tight = StructType(
            [
                StructField("k", LongType(), False),
                StructField("arr", ArrayType(IntegerType(), containsNull=False), False),
            ]
        )
        src = spark.createDataFrame([(2, [7, 8]), (3, [9])], tight)
        t.merge_into(src, ["k"])
        got = {r["k"]: r["arr"] for r in t.snapshot().collect()}
        assert got == {1: [1, 2], 2: [7, 8], 3: [9]}
        assert dict(t.snapshot().dtypes)["arr"] == "array<int>"

    def test_loose_source_into_tight_table_loosens_the_manifest(self, spark, tmp_path):
        """r11 review: the REVERSE nullability direction — a
        containsNull=true source into a containsNull=false table —
        must merge (values identical) and the committed schema must
        LOOSEN, never keep claiming a tightness incoming data may
        violate."""
        from pyspark.sql.types import (
            ArrayType, IntegerType, LongType, StructField, StructType,
        )

        t = VersionedTable(spark, str(tmp_path / "tight"))
        tight = StructType(
            [
                StructField("k", LongType(), False),
                StructField("arr", ArrayType(IntegerType(), containsNull=False), False),
            ]
        )
        t.create(spark.createDataFrame([(1, [1, 2])], tight), cluster_by=["k"])
        loose = spark.createDataFrame([(2, [None, 9])], "k bigint, arr array<int>")
        t.merge_into(loose, ["k"])
        got = {r["k"]: r["arr"] for r in t.snapshot().collect()}
        assert got == {1: [1, 2], 2: [None, 9]}
        assert t.snapshot().schema["arr"].dataType.containsNull is True

    def test_incompatible_source_refused(self, spark, ntable):
        src = spark.createDataFrame([(3, "oops")], "k bigint, q string")
        with pytest.raises(ValueError, match="incompatible"):
            ntable.merge_into(src, ["k"])

    def test_restore_below_widen_then_wide_merge_cannot_brick(self, spark, ntable):
        """The exact fuzz-found sequence, pinned: widen -> merge wide ->
        restore narrow -> merge wide again must refuse (or auto-widen),
        never commit unreadable files."""
        ntable.widen_column("q", "bigint")
        wide = spark.createDataFrame([(5, 2**40)], "k bigint, q bigint")
        ntable.merge_into(wide, ["k"])
        ntable.restore(1)  # schema narrow again
        assert dict(ntable.snapshot().dtypes)["q"] == "int"
        with pytest.raises(ValueError, match="widen_column"):
            ntable.merge_into(wide, ["k"])
        ntable.merge_into(wide, ["k"], schema_evolution=True)  # the sanctioned path
        got = {r["k"]: r["q"] for r in ntable.snapshot().collect()}
        assert got[5] == 2**40
        # every version in the history still reads
        for v in range(1, ntable.version() + 1):
            ntable.snapshot(v).count()


class TestIdentityColumns:
    """GENERATED ALWAYS AS IDENTITY (Delta parity, deterministic):
    declaration validates non-NULL uniqueness and records max() as the
    watermark; merges refuse sources carrying the column, matched rows
    keep their value, fresh rows get watermark + key-ordered rank."""

    @pytest.fixture()
    def itable(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "ident"))
        rows = [Row(k=i * 10, rid=i + 1, v=f"v{i}") for i in range(5)]  # rid 1..5
        t.create(spark.createDataFrame(rows), n_files=2, cluster_by=["k"])
        t.set_identity("rid")
        return t

    def test_insert_assigns_and_update_keeps(self, spark, itable):
        src = spark.createDataFrame(
            [Row(k=20, v="upd"), Row(k=77, v="new1"), Row(k=55, v="new2")]
        )
        itable.merge_into(src, ["k"])
        got = {r["k"]: (r["rid"], r["v"]) for r in itable.snapshot().collect()}
        assert got[20] == (3, "upd")  # matched: kept rid
        # fresh: watermark 5 + rank by k (55 < 77)
        assert got[55] == (6, "new2") and got[77] == (7, "new1")
        # watermark advanced in the manifest
        m = itable.history()[-1]
        assert m["identity"] == {"rid": 7}

    def test_mor_matches_cow(self, spark, itable):
        src = spark.createDataFrame([Row(k=20, v="upd"), Row(k=99, v="new")])
        itable.merge_into(src, ["k"], strategy="mor")
        got = {r["k"]: r["rid"] for r in itable.snapshot().collect()}
        assert got[20] == 3 and got[99] == 6

    def test_source_carrying_column_refused(self, spark, itable):
        src = spark.createDataFrame([Row(k=1, rid=99, v="x")])
        with pytest.raises(ValueError, match="IDENTITY"):
            itable.merge_into(src, ["k"])

    def test_alter_guards_and_drop(self, spark, itable):
        with pytest.raises(ValueError, match="IDENTITY"):
            itable.rename_column("rid", "rid2")
        with pytest.raises(ValueError, match="IDENTITY"):
            itable.drop_column("rid")
        itable.drop_identity("rid")
        src = spark.createDataFrame([Row(k=1, rid=99, v="x")])
        itable.merge_into(src, ["k"])  # carrying is legal again
        assert {r["rid"] for r in itable.snapshot().filter("k = 1").collect()} == {99}

    def test_widen_to_non_integral_refused(self, spark, tmp_path):
        """r11 review: int -> double is a legal widening in general but
        would commit floating-point ids — identity columns must stay
        integral until drop_identity."""
        t = VersionedTable(spark, str(tmp_path / "iw"))
        t.create(
            spark.createDataFrame([(i, i + 1, f"v{i}") for i in range(5)],
                                  "k int, rid int, v string")
        )
        t.set_identity("rid")
        with pytest.raises(ValueError, match="integral"):
            t.widen_column("rid", "double")
        t.widen_column("rid", "bigint")  # integral widening stays legal
        t.merge_into(spark.createDataFrame([(999, "w")], "k int, v string"), ["k"])
        got = {r["k"]: r["rid"] for r in t.snapshot().collect()}
        assert got[999] == 6  # assignment still integer under the wide type

    def test_declaration_validates(self, spark, tmp_path):
        from iotdatapipeline_spark.sources.versioned import ConstraintViolation

        t = VersionedTable(spark, str(tmp_path / "iv"))
        t.create(
            spark.createDataFrame(
                [Row(k=1, rid=7, s="a"), Row(k=2, rid=7, s="b")]
            )
        )
        with pytest.raises(ConstraintViolation, match="unique"):
            t.set_identity("rid")
        with pytest.raises(ValueError, match="integral"):
            t.set_identity("s")
        with pytest.raises(ValueError, match="no such column"):
            t.set_identity("nope")
        t2 = VersionedTable(spark, str(tmp_path / "iv2"))
        t2.create(
            spark.createDataFrame(
                [(1, None)], "k int, rid bigint"
            )
        )
        with pytest.raises(ConstraintViolation, match="NULL"):
            t2.set_identity("rid")

    def test_identity_survives_clone_restore(self, spark, itable, tmp_path):
        clone = itable.clone_to(str(tmp_path / "iclone"))
        src = spark.createDataFrame([Row(k=123, v="c")])
        clone.merge_into(src, ["k"])
        got = {r["k"]: r["rid"] for r in clone.snapshot().collect()}
        assert got[123] == 6  # watermark carried through the clone
        itable.merge_into(spark.createDataFrame([Row(k=200, v="z")]), ["k"])
        itable.restore(itable.version() - 1)
        itable.merge_into(spark.createDataFrame([Row(k=300, v="y")]), ["k"])
        rids = [r["rid"] for r in itable.snapshot().collect()]
        assert len(rids) == len(set(rids))  # never a duplicate id


class TestMergeWhenMatchedCondition:
    """WHEN MATCHED AND <cond> THEN UPDATE (t./s. aliases): the
    out-of-order guard — stale source rows leave the target row
    untouched and are dropped; only cond-TRUE pairs update; unmatched
    rows insert; a fully-stale batch commits nothing."""

    @pytest.fixture()
    def gtable2(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "wmc"))
        rows = [Row(k=i, vid=100 + i, v=f"t{i}") for i in range(8)]
        t.create(spark.createDataFrame(rows), n_files=2, cluster_by=["k"])
        return t

    def test_out_of_order_guard_cow(self, spark, gtable2):
        src = spark.createDataFrame(
            [
                Row(k=2, vid=999, v="fresh"),   # newer: updates
                Row(k=3, vid=1, v="stale"),     # older: must not regress
                Row(k=50, vid=5, v="new"),      # unmatched: inserts
            ]
        )
        gtable2.merge_into(src, ["k"], when_matched_condition="s.vid > t.vid")
        got = {r["k"]: (r["vid"], r["v"]) for r in gtable2.snapshot().collect()}
        assert got[2] == (999, "fresh")
        assert got[3] == (103, "t3")  # stale row dropped, target kept
        assert got[50] == (5, "new")
        assert len(got) == 9

    def test_fully_stale_batch_is_a_noop(self, spark, gtable2):
        stale = spark.createDataFrame([Row(k=1, vid=0, v="x"), Row(k=2, vid=0, v="y")])
        v = gtable2.version()
        gtable2.merge_into(stale, ["k"], when_matched_condition="s.vid > t.vid")
        assert gtable2.version() == v  # nothing rewritten, no commit

    def test_out_of_order_guard_mor(self, spark, gtable2):
        src = spark.createDataFrame(
            [Row(k=2, vid=999, v="fresh"), Row(k=3, vid=1, v="stale")]
        )
        gtable2.merge_into(
            src, ["k"], strategy="mor", when_matched_condition="s.vid > t.vid"
        )
        got = {r["k"]: (r["vid"], r["v"]) for r in gtable2.snapshot().collect()}
        assert got[2] == (999, "fresh") and got[3] == (103, "t3")
        m = gtable2.history()[-1]
        assert m["op"] == "merge:update:mor"
        # exactly one preimage DV-killed (the cond-true match only)
        assert sum(len(v) for v in (m.get("dvs") or {}).values()) == 1

    def test_combines_with_sync_delete(self, spark, gtable2):
        # k=2 updates (newer), k=3 stays (stale), k>=6 unmatched deletes
        src = spark.createDataFrame(
            [Row(k=2, vid=999, v="fresh"), Row(k=3, vid=1, v="stale")]
        )
        gtable2.merge_into(
            src,
            ["k"],
            when_matched_condition="s.vid > t.vid",
            not_matched_by_source="delete",
            # nmbs condition is target-frame SQL (unqualified names)
            not_matched_by_source_condition="k >= 6",
        )
        got = {r["k"]: r["v"] for r in gtable2.snapshot().collect()}
        assert got[2] == "fresh" and got[3] == "t3"
        assert 6 not in got and 7 not in got
        assert set(got) == {0, 1, 2, 3, 4, 5}

    def test_validation(self, spark, gtable2):
        src = spark.createDataFrame([Row(k=1, vid=0, v="x")])
        with pytest.raises(ValueError, match="when_matched_condition"):
            gtable2.merge_into(
                src, ["k"], when_matched="delete", when_matched_condition="s.vid > t.vid"
            )

    @pytest.mark.parametrize("strategy", ["cow", "mor"])
    def test_duplicate_key_targets_replace_at_key_level(self, spark, tmp_path, strategy):
        """r11 review: a target holding TWO rows for one key, where one
        pair passes the condition and the other fails — the merge is
        KEY-level (like the unconditioned form), so both rows are
        replaced by the one source row, identically under COW and MOR."""
        t = VersionedTable(spark, str(tmp_path / f"dup_{strategy}"))
        t.create(
            spark.createDataFrame(
                [Row(k=1, vid=5, v="old5"), Row(k=1, vid=9, v="old9"), Row(k=2, vid=3, v="keep")]
            ),
            cluster_by=["k"],
        )
        src = spark.createDataFrame([Row(k=1, vid=7, v="mid")])
        t.merge_into(
            src, ["k"], strategy=strategy, when_matched_condition="s.vid > t.vid"
        )
        got = sorted(
            (r["k"], r["vid"], r["v"]) for r in t.snapshot().collect()
        )
        assert got == [(1, 7, "mid"), (2, 3, "keep")]

    @pytest.mark.parametrize("strategy", ["cow", "mor"])
    def test_duplicate_key_split_across_files(self, spark, tmp_path, strategy):
        """r12 advice (medium): same key-level contract as above, but
        the duplicate key's rows live in DIFFERENT files and only the
        cond-FALSE row's file holds no cond-TRUE pair. The COW touched
        set must be derived from files holding ANY row of a
        matched-true KEY — deriving it from cond-TRUE pair rows alone
        left the cond-FALSE row's file untouched, surviving as a stale
        duplicate next to the inserted source row."""
        t = VersionedTable(spark, str(tmp_path / f"dupsplit_{strategy}"))
        t.create(
            spark.createDataFrame([Row(k=1, vid=5, v="old5"), Row(k=2, vid=3, v="keep")]),
            cluster_by=["k"],
        )
        # append the second k=1 row through a non-matching merge: it
        # inserts into its OWN file, so k=1 now spans two files
        t.merge_into(spark.createDataFrame([Row(k=1, vid=9, v="old9")]), ["k", "vid"])
        assert len(t._read_manifest(t.version())["files"]) >= 2
        src = spark.createDataFrame([Row(k=1, vid=7, v="mid")])
        t.merge_into(
            src, ["k"], strategy=strategy, when_matched_condition="s.vid > t.vid"
        )
        got = sorted((r["k"], r["vid"], r["v"]) for r in t.snapshot().collect())
        assert got == [(1, 7, "mid"), (2, 3, "keep")]


class TestMergeWhenNotMatchedCondition:
    """WHEN NOT MATCHED AND <cond> THEN INSERT (source-column
    predicate, unqualified names): gates FRESH rows only — matched
    postimages flow through regardless; NULL/FALSE drop the row;
    composes with the matched-condition guard and delete-mode."""

    @pytest.fixture()
    def gtable3(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "wnm"))
        rows = [Row(k=i, vid=100 + i, v=f"t{i}") for i in range(8)]
        t.create(spark.createDataFrame(rows), n_files=2, cluster_by=["k"])
        return t

    @pytest.mark.parametrize("strategy", ["cow", "mor"])
    def test_fresh_rows_gated_matched_pass(self, spark, gtable3, strategy):
        src = spark.createDataFrame(
            [
                Row(k=2, vid=1, v="upd"),       # matched: updates even with vid=1
                Row(k=50, vid=9, v="in"),       # fresh, cond TRUE: inserts
                Row(k=60, vid=0, v="out"),      # fresh, cond FALSE: dropped
                Row(k=70, vid=None, v="null"),  # fresh, cond NULL: dropped
            ],
            "k bigint, vid int, v string",
        )
        v0 = gtable3.version()
        gtable3.merge_into(
            src, ["k"], strategy=strategy, when_not_matched_condition="vid >= 5"
        )
        got = {r["k"]: (r["vid"], r["v"]) for r in gtable3.snapshot().collect()}
        assert got[2] == (1, "upd")
        assert got[50] == (9, "in")
        assert 60 not in got and 70 not in got
        assert len(got) == 9
        # the commit-time feed reflects the gated insert set exactly
        ch = {
            (r["k"], r["_change_type"])
            for r in gtable3.changes(v0, gtable3.version(), ["k"]).collect()
        }
        assert ch == {(2, "update_postimage"), (50, "insert")}

    @pytest.mark.parametrize("strategy", ["cow", "mor"])
    def test_composes_with_matched_condition(self, spark, gtable3, strategy):
        src = spark.createDataFrame(
            [
                Row(k=2, vid=999, v="fresh"),  # matched, guard passes: updates
                Row(k=3, vid=1, v="stale"),    # matched, guard fails: dropped
                Row(k=50, vid=9, v="in"),      # fresh, insert cond TRUE
                Row(k=60, vid=1, v="out"),     # fresh, insert cond FALSE
            ]
        )
        gtable3.merge_into(
            src,
            ["k"],
            strategy=strategy,
            when_matched_condition="s.vid > t.vid",
            when_not_matched_condition="vid >= 5",
        )
        got = {r["k"]: (r["vid"], r["v"]) for r in gtable3.snapshot().collect()}
        assert got[2] == (999, "fresh")
        assert got[3] == (103, "t3")
        assert got[50] == (9, "in") and 60 not in got

    def test_delete_mode_gates_inserts(self, spark, gtable3):
        src = spark.createDataFrame(
            [Row(k=2, vid=0, v="x"), Row(k=50, vid=9, v="in"), Row(k=60, vid=1, v="out")]
        )
        gtable3.merge_into(
            src, ["k"], when_matched="delete", when_not_matched_condition="vid >= 5"
        )
        got = {r["k"] for r in gtable3.snapshot().collect()}
        assert 2 not in got and 50 in got and 60 not in got

    def test_all_fresh_rows_rejected_with_no_match_is_noop(self, spark, gtable3):
        v = gtable3.version()
        src = spark.createDataFrame([Row(k=50, vid=0, v="out")])
        gtable3.merge_into(src, ["k"], when_not_matched_condition="vid >= 5")
        assert gtable3.version() == v  # nothing touched, nothing committed


class TestMergeNotMatchedBySource:
    """WHEN NOT MATCHED BY SOURCE THEN DELETE (Delta's third merge
    clause): unmatched TARGET rows are removed — full sync without a
    condition, scoped sync with one (condition NULL keeps the row,
    SQL-style). COW and MOR must commit the identical snapshot."""

    @pytest.fixture()
    def ttable(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "nmbs"))
        rows = [Row(k=i, v=i * 10, grp=i % 3) for i in range(20)]
        t.create(spark.createDataFrame(rows), n_files=4, cluster_by=["k"])
        return t

    def test_full_sync_cow(self, spark, ttable):
        # source: updates 0-9 (+1), inserts 100; rows 10-19 are absent
        src = spark.createDataFrame(
            [Row(k=i, v=i * 10 + 1, grp=i % 3) for i in range(10)]
            + [Row(k=100, v=5, grp=0)]
        )
        ttable.merge_into(src, ["k"], not_matched_by_source="delete")
        got = {r["k"]: r["v"] for r in ttable.snapshot().collect()}
        assert got == {**{i: i * 10 + 1 for i in range(10)}, 100: 5}
        assert ttable.history()[-1]["op"] == "merge:update+syncdel"

    def test_full_sync_mor_matches_cow(self, spark, ttable):
        src = spark.createDataFrame(
            [Row(k=i, v=i * 10 + 1, grp=i % 3) for i in range(10)]
            + [Row(k=100, v=5, grp=0)]
        )
        ttable.merge_into(src, ["k"], not_matched_by_source="delete", strategy="mor")
        got = {r["k"]: r["v"] for r in ttable.snapshot().collect()}
        assert got == {**{i: i * 10 + 1 for i in range(10)}, 100: 5}
        # the deletes landed as DV entries, not rewrites
        m = ttable.history()[-1]
        assert m["op"] == "merge:update+syncdel:mor"
        assert sum(len(v) for v in (m.get("dvs") or {}).values()) > 0

    def test_condition_scopes_the_delete_and_prunes_files(self, spark, ttable):
        # unmatched rows: 10-19. condition k >= 15: only those delete;
        # 10-14 stay. The k-clustered layout means files whose [min,max]
        # k-range misses BOTH the source keys and the condition range
        # must not be rewritten.
        src = spark.createDataFrame([Row(k=0, v=999, grp=0)])
        v = ttable.merge_into(
            src,
            ["k"],
            not_matched_by_source="delete",
            not_matched_by_source_condition="k >= 15",
        )
        got = {r["k"]: r["v"] for r in ttable.snapshot().collect()}
        want = {0: 999, **{i: i * 10 for i in range(1, 15)}}
        assert got == want
        mt = ttable._read_manifest(v).get("metrics") or {}
        n_before = len(ttable._read_manifest(v - 1)["files"])
        assert mt.get("files_removed", n_before) < n_before

    def test_condition_null_keeps_the_row(self, spark, ttable):
        # v NULL on an unmatched row: the condition evaluates NULL, so
        # the row survives (SQL semantics, like Delta)
        t = ttable
        t.merge_into(
            spark.createDataFrame([Row(k=50, v=None, grp=0)], "k bigint, v bigint, grp bigint"),
            ["k"],
        )
        src = spark.createDataFrame([Row(k=0, v=0, grp=0)])
        t.merge_into(
            src,
            ["k"],
            not_matched_by_source="delete",
            not_matched_by_source_condition="v > 5",
        )
        keys = {r["k"] for r in t.snapshot().collect()}
        assert 50 in keys  # NULL condition kept it
        assert keys == {0, 50}  # every v>5 unmatched row deleted

    def test_combines_with_matched_delete(self, spark, ttable):
        # matched rows delete AND unmatched cond rows delete: only the
        # unmatched cond-false band survives, plus nothing inserted
        src = spark.createDataFrame([Row(k=i, v=0, grp=0) for i in range(5)])
        ttable.merge_into(
            src,
            ["k"],
            when_matched="delete",
            not_matched_by_source="delete",
            not_matched_by_source_condition="k >= 10",
        )
        keys = sorted(r["k"] for r in ttable.snapshot().collect())
        assert keys == [5, 6, 7, 8, 9]

    def test_validation(self, spark, ttable):
        src = spark.createDataFrame([Row(k=0, v=0, grp=0)])
        with pytest.raises(ValueError, match="not_matched_by_source"):
            ttable.merge_into(src, ["k"], not_matched_by_source="update")
        with pytest.raises(ValueError, match="requires"):
            ttable.merge_into(src, ["k"], not_matched_by_source_condition="k > 0")

    def test_combines_with_schema_evolution(self, spark, ttable):
        """Evolved insert files + condition-scoped sync deletes must
        land in ONE commit: the new column reads null on surviving old
        rows, updated/inserted rows carry it, the cond band deletes."""
        src = spark.createDataFrame(
            [Row(k=3, v=99, grp=0, extra="x"), Row(k=50, v=1, grp=0, extra="y")]
        )
        ttable.merge_into(
            src,
            ["k"],
            schema_evolution=True,
            not_matched_by_source="delete",
            not_matched_by_source_condition="k >= 15",
        )
        got = {r["k"]: (r["v"], r["extra"]) for r in ttable.snapshot().collect()}
        assert got[3] == (99, "x") and got[50] == (1, "y")
        assert 15 not in got and got[14] == (140, None)

    def test_combines_with_identity(self, spark, tmp_path):
        """Sync deletes must not disturb identity: matched rows keep
        their id, fresh rows get watermark + rank, deleted rows' ids
        are simply retired (never reissued — monotone watermark)."""
        t = VersionedTable(spark, str(tmp_path / "nmid"))
        t.create(
            spark.createDataFrame([Row(k=i, rid=i + 1, v=i) for i in range(6)]),
            cluster_by=["k"],
        )
        t.set_identity("rid")
        src = spark.createDataFrame([Row(k=2, v=99), Row(k=30, v=1)])
        t.merge_into(
            src,
            ["k"],
            not_matched_by_source="delete",
            not_matched_by_source_condition="k >= 4",
        )
        got = {r["k"]: (r["rid"], r["v"]) for r in t.snapshot().collect()}
        assert got == {0: (1, 0), 1: (2, 1), 2: (3, 99), 3: (4, 3), 30: (7, 1)}

    def test_cdf_reports_sync_deletes(self, spark, ttable):
        """changes() across a sync merge must emit delete rows for the
        unmatched-condition band and update/insert rows for the source
        — CDC consumers (mirrors) see the full effect of the clause."""
        src = spark.createDataFrame([Row(k=0, v=999, grp=0), Row(k=50, v=1, grp=0)])
        v0 = ttable.version()
        ttable.merge_into(
            src,
            ["k"],
            not_matched_by_source="delete",
            not_matched_by_source_condition="k >= 15",
        )
        ch = {
            (r["k"], r["_change_type"])
            for r in ttable.changes(v0, ttable.version(), keys=["k"]).collect()
        }
        assert (0, "update_postimage") in ch
        assert (50, "insert") in ch
        for k in range(15, 20):
            assert (k, "delete") in ch
        assert not any(k in range(1, 15) for k, _ in ch)


class TestExpireCrashSafety:
    """expire_versions' documented crash order: (1) checkpoint, (2)
    floor pointer, (3) unlinks. A crash between any two steps leaves a
    table that merely over-retains — and a RERUN must finish the job,
    not leak the stranded prefix forever."""

    def _prepare(self, spark, tmp_path, name):
        t = VersionedTable(spark, str(tmp_path / name))
        t.create(spark.createDataFrame([Row(k=i, v=f"b{i}") for i in range(10)]), n_files=2)
        for i in range(4):
            t.merge_into(spark.createDataFrame([Row(k=0, v=f"u{i}")]), ["k"])
        return t  # v5 head

    def test_crash_before_any_replace_is_a_clean_noop(self, spark, tmp_path, monkeypatch):
        t = self._prepare(spark, tmp_path, "c0")
        real = os.replace

        def boom(src, dst):
            if "/.ckpt-" in src or ".ckpt-" in os.path.basename(src):
                raise OSError("injected crash at step 1")
            return real(src, dst)

        monkeypatch.setattr(os, "replace", boom)
        with pytest.raises(OSError, match="injected"):
            t.expire_versions(keep_last=2)
        monkeypatch.undo()
        # nothing deleted, everything readable, rerun completes
        assert [m["version"] for m in t.history()] == [1, 2, 3, 4, 5]
        assert t.expire_versions(keep_last=2) == [1, 2, 3]

    def test_crash_after_floor_pointer_rerun_reclaims_stranded_prefix(
        self, spark, tmp_path, monkeypatch
    ):
        t = self._prepare(spark, tmp_path, "c1")
        real_unlink = os.unlink

        def boom(path):
            if os.path.basename(str(path)).startswith("v") and str(path).endswith(".json"):
                raise OSError("injected crash at step 3")
            return real_unlink(path)

        monkeypatch.setattr(os, "unlink", boom)
        with pytest.raises(OSError, match="injected"):
            t.expire_versions(keep_last=2)
        monkeypatch.undo()
        # pointer advanced but manifests stranded: over-retention, head fine
        cold = VersionedTable(spark, t.root)
        assert cold.earliest_version() == 4
        assert dict(_rows(cold.snapshot()))[0] == "u3"
        # rerun sweeps from the true on-disk minimum: the stranded
        # prefix is reclaimed, not leaked forever
        expired = cold.expire_versions(keep_last=2)
        assert expired == [1, 2, 3]
        assert not os.path.exists(cold._manifest_path(1))
        assert dict(_rows(cold.snapshot()))[0] == "u3"


class TestScopedOptimize:
    """OPTIMIZE ... WHERE: compact only the files the predicate's
    stats-pruning selects; everything else is carried by reference."""

    @pytest.fixture()
    def frag(self, spark, tmp_path):
        # clustered table, then many tiny in-range insert files
        t = VersionedTable(spark, str(tmp_path / "so"))
        t.create(
            spark.createDataFrame([Row(k=i, v=f"b{i}") for i in range(80)]),
            n_files=4,
            cluster_by=["k"],
        )
        for i in range(5):  # five 1-row files, all in k<=9
            t.merge_into(spark.createDataFrame([Row(k=i, v=f"u{i}")]), ["k"])
        return t

    def test_scoped_compaction_carries_cold_files(self, spark, frag):
        m0 = frag._read_manifest(frag.version())
        total0 = len(m0["files"])
        cold0 = set(frag._keep_files(m0, {"k": (40, 79)}))
        v = frag.optimize(n_files=1, where={"k": (0, 20)})
        m1 = frag._read_manifest(v)
        # cold files carried by identity, hot range compacted
        assert cold0 <= set(m1["files"])
        assert len(m1["files"]) < total0
        got = dict(_rows(frag.snapshot()))
        assert got[0] == "u0" and got[50] == "b50" and len(got) == 80
        # stats survive for carried files: cold-range scans still prune
        kept, total = frag.pruned_files({"k": (60, 70)})
        assert kept < total

    def test_scoped_optimize_materializes_in_scope_dvs_only(self, spark, frag):
        frag.delete_where("k = 2")   # DV in the hot range
        frag.delete_where("k = 77")  # DV in the cold range
        assert frag.dv_stacking()
        n_dv_before = len(frag.dv_stacking())
        v = frag.optimize(n_files=1, where="k <= 20")
        depths = frag.dv_stacking(v)
        # the hot file's DV materialized into the rewrite; the cold
        # file's DV is carried untouched
        assert len(depths) == n_dv_before - 1 == 1
        got = dict(_rows(frag.snapshot()))
        assert 2 not in got and 77 not in got and len(got) == 78

    def test_scoped_optimize_preserves_column_mapping(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "so2"))
        t.create(
            spark.createDataFrame([Row(k=i, val=i * 3) for i in range(40)]),
            n_files=4,
            cluster_by=["k"],
        )
        t.rename_column("val", "value")
        v = t.optimize(n_files=1, where={"k": (0, 9)})
        m = t._read_manifest(v)
        assert m.get("col_map")  # mapping NOT reset (unlike full optimize)
        got = {r["k"]: r["value"] for r in t.snapshot().collect()}
        assert got[5] == 15 and len(got) == 40

    def test_out_of_scope_predicate_is_noop_and_zorder_refuses(self, spark, frag):
        base = frag.version()
        assert frag.optimize(n_files=1, where={"k": (10_000, 20_000)}) == base
        with pytest.raises(ValueError, match="cannot compose"):
            frag.optimize(n_files=2, zorder_by=("k", "k"), where={"k": (0, 1)})


class TestDescribe:
    def test_describe_and_history_df(self, spark, table):
        table.add_constraint("k_pos", "k >= 0")
        table.rename_column("v", "val")
        table.add_bloom_index(["val"])
        table.merge_into(spark.createDataFrame([Row(k=0, val="u")]), ["k"])
        d = table.describe()
        assert d["version"] == table.version() and d["earliest_version"] == 1
        assert d["schema"] == {"k": "long", "val": "string"}
        assert d["constraints"] == {"k_pos": "k >= 0"}
        assert d["column_mapping"] == {"val": "v"}
        assert d["bloom_indexed"] == ["val"]
        assert d["n_files"] >= 1 and d["metrics"]["files_added"] >= 1
        h = table.history_df()
        rows = {r["version"]: r for r in h.collect()}
        assert rows[1]["op"] == "create" and rows[1]["rows_added"] == 20
        assert rows[table.version()]["op"] == "merge:update"
        # queryable: total rows written across history
        from pyspark.sql import functions as F

        total = h.agg(F.sum("rows_added")).collect()[0][0]
        assert total >= 20

    def test_describe_empty_table(self, spark, tmp_path):
        from pyspark.sql import functions as F  # noqa: F401

        t = VersionedTable(spark, str(tmp_path / "none"))
        assert t.describe() == {"version": 0}


class TestGeneratedColumns:
    """GENERATED ALWAYS AS: declaration validates existing rows;
    writers compute omitted generated columns and refuse contradicting
    sources; ALTERs on either side of the expression refuse."""

    @pytest.fixture()
    def gtable(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "gen"))
        t.create(
            spark.createDataFrame(
                [Row(k=i, cents=i * 137, kilo=(i * 137) // 1000) for i in range(30)]
            ),
            n_files=3,
            cluster_by=["k"],
        )
        t.set_generated("kilo", "CAST(floor(cents / 1000) AS BIGINT)")
        return t

    def test_declaration_validates_existing_rows(self, spark, tmp_path):
        from iotdatapipeline_spark.sources.versioned import ConstraintViolation

        t = VersionedTable(spark, str(tmp_path / "bad"))
        t.create(spark.createDataFrame([Row(k=1, cents=500, kilo=99)]))
        with pytest.raises(ConstraintViolation, match="contradict"):
            t.set_generated("kilo", "CAST(floor(cents / 1000) AS BIGINT)")
        with pytest.raises(ValueError, match="no such column"):
            t.set_generated("nope", "k + 1")

    def test_writer_computes_omitted_column(self, spark, gtable):
        src = spark.createDataFrame([Row(k=3, cents=4321), Row(k=99, cents=2500)])
        gtable.merge_into(src, ["k"])  # source has NO kilo column
        got = {r["k"]: (r["cents"], r["kilo"]) for r in gtable.snapshot().collect()}
        assert got[3] == (4321, 4) and got[99] == (2500, 2)
        assert got[5] == (685, 0)  # untouched rows intact

    def test_writer_refuses_contradicting_source(self, spark, gtable):
        from iotdatapipeline_spark.sources.versioned import ConstraintViolation

        bad = spark.createDataFrame([Row(k=3, cents=4321, kilo=77)])
        v = gtable.version()
        with pytest.raises(ConstraintViolation, match="GENERATED"):
            gtable.merge_into(bad, ["k"])
        with pytest.raises(ConstraintViolation, match="GENERATED"):
            gtable.merge_into(bad, ["k"], strategy="mor")
        assert gtable.version() == v  # nothing committed
        ok = spark.createDataFrame([Row(k=3, cents=4321, kilo=4)])
        gtable.merge_into(ok, ["k"])  # correct precomputed value passes

    def test_alter_guards_and_drop_generated(self, spark, gtable):
        with pytest.raises(ValueError, match="generated"):
            gtable.rename_column("cents", "pennies")  # expression input
        with pytest.raises(ValueError, match="generated"):
            gtable.drop_column("kilo")  # the generated column itself
        # widening is value-preserving, so it stays legal under a
        # generated declaration (the expression reads the same values)
        gtable.widen_column("cents", "bigint")
        gtable.drop_generated("kilo")
        gtable.rename_column("cents", "pennies")  # now legal
        assert "pennies" in gtable.snapshot().columns

    def test_mor_and_streaming_sink_inherit(self, spark, gtable, tmp_path):
        src = spark.createDataFrame([Row(k=0, cents=9999)])
        gtable.merge_into(src, ["k"], strategy="mor")
        got = {r["k"]: r["kilo"] for r in gtable.snapshot().collect()}
        assert got[0] == 9

    def test_restore_and_clone_carry_declarations(self, spark, gtable, tmp_path):
        from iotdatapipeline_spark.sources.versioned import ConstraintViolation

        clone = gtable.clone_to(str(tmp_path / "gclone"))
        with pytest.raises(ConstraintViolation):
            clone.merge_into(spark.createDataFrame([Row(k=1, cents=1, kilo=5)]), ["k"])
        gtable.merge_into(spark.createDataFrame([Row(k=1, cents=2000)]), ["k"])
        gtable.restore(2)  # the version where the declaration landed
        assert "kilo" in (gtable._read_manifest(gtable.version()).get("generated") or {})


class TestConcurrentWriters:
    """r12 verdict #3: two writers racing on one table. Baseline
    contract: optimistic CommitConflict retries serialize to a correct
    outcome. New contract: a merge whose READ SET is provably disjoint
    from the intervening commits REBASES — re-commits its finished
    files against the new head without re-running the merge (Delta's
    logical conflict detection) — while overlapping reads, maybe-match
    added files, NOT MATCHED BY SOURCE, and metadata changes all force
    the full retry."""

    def _fresh(self, spark, tmp_path, name="ccw", cdf=True):
        root = str(tmp_path / name)
        t = VersionedTable(spark, root)
        rows = [Row(k=i, v=i * 10) for i in range(100)]
        t.create(
            spark.createDataFrame(rows), n_files=4, cluster_by=["k"], cdf=cdf
        )
        return t

    @staticmethod
    def _inject_before_commit(writer, action):
        """Run ``action`` once, right before the writer's next commit
        attempt — a deterministic lost race."""
        orig = type(writer)._try_commit
        state = {"fired": False}

        def hooked(self, *a, **kw):
            if not state["fired"]:
                state["fired"] = True
                action()
            return orig(self, *a, **kw)

        writer._try_commit = hooked.__get__(writer)
        return state

    @staticmethod
    def _count_writes(writer):
        orig = type(writer)._write_files
        calls = {"n": 0}

        def counting(self, *a, **kw):
            calls["n"] += 1
            return orig(self, *a, **kw)

        writer._write_files = counting.__get__(writer)
        return calls

    @pytest.mark.parametrize("strategy", ["cow", "mor"])
    def test_disjoint_merges_rebase_without_rerun(self, spark, tmp_path, strategy):
        a = self._fresh(spark, tmp_path, f"dis_{strategy}")
        b = VersionedTable(spark, a.root)
        src_a = spark.createDataFrame([Row(k=2, v=9999), Row(k=3, v=8888)])
        src_b = spark.createDataFrame([Row(k=90, v=7777)])
        self._inject_before_commit(a, lambda: b.merge_into(src_b, ["k"]))
        writes = self._count_writes(a)
        v = a.merge_into(src_a, ["k"], strategy=strategy)
        assert v == 3  # create, B's commit, A's rebase
        m = a.history()[-1]
        assert m["op"].endswith(":rebase"), m["op"]
        # the merge was NOT re-run: exactly the first attempt's three
        # writes (COW: kept rewrite + insert files + cdf change files;
        # MOR: DV parquet + postimage append + cdf change files)
        assert writes["n"] == 3
        got = {r["k"]: r["v"] for r in a.snapshot().collect()}
        assert got[2] == 9999 and got[3] == 8888 and got[90] == 7777
        assert len(got) == 100
        # the rebased commit's change feed is intact and fast-served
        ch = {
            (r["k"], r["_change_type"])
            for r in a.changes(2, 3, ["k"]).collect()
        }
        assert ch == {(2, "update_postimage"), (3, "update_postimage")}

    def test_same_file_conflict_full_retry(self, spark, tmp_path):
        a = self._fresh(spark, tmp_path, "overlap")
        b = VersionedTable(spark, a.root)
        # k=2 and k=3 cluster into the same file: B rewrites it under A
        src_a = spark.createDataFrame([Row(k=2, v=9999)])
        src_b = spark.createDataFrame([Row(k=3, v=7777)])
        self._inject_before_commit(a, lambda: b.merge_into(src_b, ["k"]))
        v = a.merge_into(src_a, ["k"])
        assert v == 3
        assert not a.history()[-1]["op"].endswith(":rebase")
        got = {r["k"]: r["v"] for r in a.snapshot().collect()}
        assert got[2] == 9999 and got[3] == 7777 and len(got) == 100

    def test_added_maybe_match_forces_retry(self, spark, tmp_path):
        """B INSERTS a key inside A's source bounds while A is
        committing: the added file may hold a match A never saw — the
        rebase must refuse, and the retry must fold B's row in."""
        a = self._fresh(spark, tmp_path, "addmatch")
        b = VersionedTable(spark, a.root)
        # A updates k=150 (not present yet); B inserts k=150 first
        src_a = spark.createDataFrame([Row(k=150, v=2)])
        src_b = spark.createDataFrame([Row(k=150, v=1)])
        self._inject_before_commit(a, lambda: b.merge_into(src_b, ["k"]))
        v = a.merge_into(src_a, ["k"])
        assert v == 3
        assert not a.history()[-1]["op"].endswith(":rebase")
        got = {r["k"]: r["v"] for r in a.snapshot().collect()}
        assert got[150] == 2  # A applied OVER B's insert, one row only
        assert len(got) == 101

    def test_added_outside_bounds_rebases(self, spark, tmp_path):
        a = self._fresh(spark, tmp_path, "addout")
        b = VersionedTable(spark, a.root)
        src_a = spark.createDataFrame([Row(k=2, v=9999)])
        src_b = spark.createDataFrame([Row(k=500, v=1)])  # outside A's bounds
        self._inject_before_commit(a, lambda: b.merge_into(src_b, ["k"]))
        v = a.merge_into(src_a, ["k"])
        assert v == 3
        assert a.history()[-1]["op"].endswith(":rebase")
        got = {r["k"]: r["v"] for r in a.snapshot().collect()}
        assert got[2] == 9999 and got[500] == 1 and len(got) == 101

    def test_nmbs_never_rebases(self, spark, tmp_path):
        a = self._fresh(spark, tmp_path, "nmbs")
        b = VersionedTable(spark, a.root)
        src_a = spark.createDataFrame([Row(k=2, v=9999)])
        src_b = spark.createDataFrame([Row(k=500, v=1)])
        self._inject_before_commit(a, lambda: b.merge_into(src_b, ["k"]))
        v = a.merge_into(
            src_a, ["k"], not_matched_by_source="delete",
            not_matched_by_source_condition="k >= 600",
        )
        assert v == 3
        assert not a.history()[-1]["op"].endswith(":rebase")
        # B's k=500 row survives (condition k>=600), A's update applied
        got = {r["k"]: r["v"] for r in a.snapshot().collect()}
        assert got[2] == 9999 and got[500] == 1

    def test_metadata_change_forces_retry(self, spark, tmp_path):
        a = self._fresh(spark, tmp_path, "meta")
        b = VersionedTable(spark, a.root)
        src_a = spark.createDataFrame([Row(k=2, v=9999)])
        self._inject_before_commit(a, lambda: b.add_constraint("pos", "v >= 0"))
        v = a.merge_into(src_a, ["k"])
        assert v == 3
        assert not a.history()[-1]["op"].endswith(":rebase")
        assert {r["k"]: r["v"] for r in a.snapshot().collect()}[2] == 9999

    def test_txn_replay_race_applies_once(self, spark, tmp_path):
        """The streaming-upsert vs backfill race: both writers carry
        the SAME (txn_app, version). B lands first; A's conflict path
        must recognize the batch as applied and NOT double-apply."""
        a = self._fresh(spark, tmp_path, "txn")
        b = VersionedTable(spark, a.root)
        batch = spark.createDataFrame([Row(k=2, v=9999)])
        self._inject_before_commit(
            a, lambda: b.merge_into(batch, ["k"], txn_app="s", txn_version=7)
        )
        v = a.merge_into(batch, ["k"], txn_app="s", txn_version=7)
        # B's commit is v2; A recognizes the applied txn and adds NOTHING
        assert v == 2 and a.version() == 2
        assert {r["k"]: r["v"] for r in a.snapshot().collect()}[2] == 9999

    def test_streaming_upsert_vs_backfill_guarded(self, spark, tmp_path):
        """The r11 out-of-order scenario under a race: a guarded
        backfill (when_matched_condition on a version column) loses its
        commit race to the streaming upsert sink touching OTHER keys —
        rebase applies, the guard semantics hold."""
        from iotdatapipeline_spark.streaming.sinks import versioned_upsert_foreach_batch

        root = str(tmp_path / "sb")
        t = VersionedTable(spark, root)
        rows = [Row(k=i, ts=5, v=f"t{i}") for i in range(40)]
        t.create(spark.createDataFrame(rows), n_files=4, cluster_by=["k"])
        sink = versioned_upsert_foreach_batch(
            root, ["k"], txn_app="stream", when_matched_condition="s.ts > t.ts"
        )
        backfill = VersionedTable(spark, root)
        src = spark.createDataFrame(
            [Row(k=1, ts=9, v="new"), Row(k=2, ts=1, v="stale")]
        )
        self._inject_before_commit(
            backfill,
            lambda: sink(
                spark.createDataFrame([Row(k=30, ts=9, v="live")]), 1
            ),
        )
        backfill.merge_into(src, ["k"], when_matched_condition="s.ts > t.ts")
        got = {r["k"]: (r["ts"], r["v"]) for r in backfill.snapshot().collect()}
        assert got[1] == (9, "new")      # fresh backfill row applied
        assert got[2] == (5, "t2")       # stale row rejected by the guard
        assert got[30] == (9, "live")    # the racing stream batch kept
        assert backfill.history()[-1]["op"].endswith(":rebase")

    def test_randomized_disjoint_interleave_converges(self, spark, tmp_path):
        """Alternating writers on disjoint key bands, every commit of
        writer A losing one race to writer B: the final table equals
        the sequential expectation regardless of rebase/retry mix."""
        a = self._fresh(spark, tmp_path, "fuzz")
        b = VersionedTable(spark, a.root)
        expected = {i: i * 10 for i in range(100)}
        for rnd in range(4):
            ka, kb = 2 + rnd, 90 + rnd
            src_a = spark.createDataFrame([Row(k=ka, v=1000 + rnd)])
            src_b = spark.createDataFrame([Row(k=kb, v=2000 + rnd)])
            self._inject_before_commit(a, lambda s=src_b: b.merge_into(s, ["k"]))
            a.merge_into(src_a, ["k"], strategy="mor" if rnd % 2 else "cow")
            expected[ka] = 1000 + rnd
            expected[kb] = 2000 + rnd
        got = {r["k"]: r["v"] for r in a.snapshot().collect()}
        assert got == expected
        # the feed over the whole history nets exactly the edits
        ch = {
            (r["k"], r["v"]) for r in a.changes(1, a.version(), ["k"]).collect()
        }
        assert ch == {(k, v) for k, v in expected.items() if v >= 1000}


class TestRecordTxn:
    """record_txn (r13): the metadata-only cursor stamp the maintained-
    table consumers use when a source range nets to zero changes."""

    def test_stamp_and_idempotence(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "rt"))
        t.create(
            spark.createDataFrame([Row(k=i, v=i) for i in range(10)]),
            cluster_by=["k"],
        )
        v = t.record_txn("app-x", 7)
        assert v == 2
        m = t._read_manifest(2)
        assert m["op"] == "txn"
        assert (m.get("txns") or {}).get("app-x") == [7, 2]
        # data plane untouched: same files, same rows
        assert m["files"] == t._read_manifest(1)["files"]
        assert t.snapshot().count() == 10
        # stamping at-or-below the recorded cursor is a no-op
        assert t.record_txn("app-x", 7) == 2
        assert t.record_txn("app-x", 3) == 2
        assert t.version() == 2
        # a later cursor commits again
        assert t.record_txn("app-x", 9) == 3

    def test_missing_table_refused(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "rt2"))
        with pytest.raises(ValueError, match="create"):
            t.record_txn("a", 1)


class TestDvDeleteAndOptimizeRebase:
    """r13 verdict #4: logical-conflict rebase extended beyond merge.
    A delete_where/delete_matching that loses its commit race to a
    PROVABLY DISJOINT writer re-commits its finished DV + change files
    against the new head (op 'delete:rebase', zero re-written files);
    an intersecting writer still forces the full retry. optimize picks
    up the same machinery: layout is best-effort, so purely-ADDED
    files never conflict ('optimize:rebase' / 'optimize:where:rebase'),
    while a rewrite of an in-scope file forces the retry."""

    _inject = staticmethod(TestConcurrentWriters._inject_before_commit)
    _count = staticmethod(TestConcurrentWriters._count_writes)

    def _fresh(self, spark, tmp_path, name):
        root = str(tmp_path / name)
        t = VersionedTable(spark, root)
        t.create(
            spark.createDataFrame([Row(k=i, v=i * 10) for i in range(100)]),
            n_files=4,
            cluster_by=["k"],
        )
        return t

    def test_delete_where_rebases_on_disjoint_upsert(self, spark, tmp_path):
        a = self._fresh(spark, tmp_path, "dwr")
        b = VersionedTable(spark, a.root)
        # control: writes a non-conflicted delete_where performs
        control = self._fresh(spark, tmp_path, "dwr_ctl")
        ctl = self._count(control)
        control.delete_where("k >= 80")
        baseline_writes = ctl["n"]
        # race: B rewrites the file holding k=2 (stats far from k>=80)
        calls = self._count(a)
        self._inject(
            a, lambda: b.merge_into(spark.createDataFrame([Row(k=2, v=9)]), ["k"])
        )
        a.delete_where("k >= 80")
        assert a._read_manifest(a.version())["op"] == "delete:rebase"
        assert calls["n"] == baseline_writes  # DV+cdf written ONCE
        got = {r["k"]: r["v"] for r in a.snapshot().collect()}
        assert got[2] == 9 and max(got) == 79 and len(got) == 80

    def test_delete_where_retries_on_intersecting_insert(self, spark, tmp_path):
        a = self._fresh(spark, tmp_path, "dwi")
        b = VersionedTable(spark, a.root)
        calls = self._count(a)
        # B INSERTS k=200 — inside the delete's predicate scope, so the
        # finished DV set is stale (k=200 must die too): full retry
        self._inject(
            a,
            lambda: b.merge_into(spark.createDataFrame([Row(k=200, v=1)]), ["k"]),
        )
        a.delete_where("k >= 80")
        assert a._read_manifest(a.version())["op"] == "delete"
        assert calls["n"] > 2  # re-ran, not re-linked
        got = {r["k"] for r in a.snapshot().collect()}
        assert 200 not in got and max(got) == 79

    def test_delete_matching_rebases_on_disjoint_upsert(self, spark, tmp_path):
        a = self._fresh(spark, tmp_path, "dmr")
        b = VersionedTable(spark, a.root)
        calls = self._count(a)
        self._inject(
            a, lambda: b.merge_into(spark.createDataFrame([Row(k=2, v=9)]), ["k"])
        )
        dels = spark.createDataFrame([Row(k=95), Row(k=97)])
        a.delete_matching(dels, ["k"], txn_app="t", txn_version=1)
        m = a._read_manifest(a.version())
        assert m["op"] == "delete:rebase"
        assert (m.get("txns") or {}).get("t") == [1, a.version()]
        got = {r["k"]: r["v"] for r in a.snapshot().collect()}
        assert 95 not in got and 97 not in got and got[2] == 9
        assert calls["n"] == 2  # DV + cdf files written once

    def test_scoped_optimize_rebases_on_added_file(self, spark, tmp_path):
        a = self._fresh(spark, tmp_path, "sor")
        b = VersionedTable(spark, a.root)
        # B APPENDS a brand-new key (pure insert): layout is
        # best-effort, the added file simply stays uncompacted
        self._inject(
            a,
            lambda: b.merge_into(spark.createDataFrame([Row(k=500, v=5)]), ["k"]),
        )
        a.optimize(n_files=1, where="k < 50")
        assert a._read_manifest(a.version())["op"] == "optimize:where:rebase"
        got = {r["k"]: r["v"] for r in a.snapshot().collect()}
        assert len(got) == 101 and got[500] == 5

    def test_scoped_optimize_retries_on_selected_file_rewrite(
        self, spark, tmp_path
    ):
        a = self._fresh(spark, tmp_path, "sow")
        b = VersionedTable(spark, a.root)
        # B rewrites a file INSIDE the optimize scope: retry required
        self._inject(
            a, lambda: b.merge_into(spark.createDataFrame([Row(k=2, v=9)]), ["k"])
        )
        a.optimize(n_files=1, where="k < 50")
        assert a._read_manifest(a.version())["op"] == "optimize:where"
        got = {r["k"]: r["v"] for r in a.snapshot().collect()}
        assert got[2] == 9 and len(got) == 100

    def test_full_optimize_rebases_on_pure_insert(self, spark, tmp_path):
        a = self._fresh(spark, tmp_path, "for")
        b = VersionedTable(spark, a.root)
        self._inject(
            a,
            lambda: b.merge_into(spark.createDataFrame([Row(k=500, v=5)]), ["k"]),
        )
        a.optimize(n_files=2)
        assert a._read_manifest(a.version())["op"] == "optimize:rebase"
        got = {r["k"]: r["v"] for r in a.snapshot().collect()}
        assert len(got) == 101 and got[500] == 5
        # and a DV delete against the rebased layout still works
        a.delete_where("k = 500")
        assert 500 not in {r["k"] for r in a.snapshot().collect()}

    def test_full_optimize_skips_rebase_under_column_mapping(
        self, spark, tmp_path
    ):
        """A full optimize RESETS column-mapping debt; the rebase
        inherits the head's mapping instead, so a mapped table must
        take the full retry (which re-runs and resets correctly)."""
        a = self._fresh(spark, tmp_path, "fom")
        a.rename_column("v", "val")  # creates col_map debt
        b = VersionedTable(spark, a.root)
        self._inject(
            a,
            lambda: b.merge_into(
                spark.createDataFrame([Row(k=500, val=5)]), ["k"]
            ),
        )
        a.optimize(n_files=2)
        m = a._read_manifest(a.version())
        assert m["op"] == "optimize"  # retried, not rebased
        assert not (m.get("col_map") or {})  # debt reset by the rewrite
        got = {r["k"]: r["val"] for r in a.snapshot().collect()}
        assert len(got) == 101 and got[500] == 5
