"""r13 verdict #5: multi-writer soak — randomized interleave of
merge / delete_matching / delete_where / optimize / compact_dv /
set_cdf from concurrent threads against ONE VersionedTable, with a
final serializability assert.

The injected-race gate (`events_merge_concurrent_rebase`) pins one
schedule; this pins the SPACE: threads interleave however the OS
schedules them, every commit serializes through the optimistic
manifest-link protocol (rebasing when provably disjoint, retrying
otherwise), and the model assert holds for every interleaving because
each writer owns a disjoint key range — any global schedule is then
equivalent to the per-key-space serial order, so the final table must
equal the union of each thread's serially-computed expectation, and
each thread's txn cursor must show its LAST txn-keyed op exactly once.

Seeds are fixed (thread i uses random.Random(1300 + i)) so a failure
replays deterministically.
"""

from __future__ import annotations

import random
import threading

import pytest
from pyspark.sql import Row

from iotdatapipeline_spark.sources.versioned import VersionedTable

RETRIES = 120  # 3-way contention can burn many optimistic rounds


class TestMultiWriterSoak:
    N_THREADS = 3
    KEYS_PER = 40  # thread i owns k in [i*1000, i*1000 + KEYS_PER)
    OPS_PER = 8

    def _own(self, i: int) -> range:
        return range(i * 1000, i * 1000 + self.KEYS_PER)

    def test_disjoint_writers_serialize(self, spark, tmp_path):
        root = str(tmp_path / "soak")
        t = VersionedTable(spark, root)
        seed_rows = [
            Row(k=k, v=k)
            for i in range(self.N_THREADS)
            for k in self._own(i)
        ]
        t.create(spark.createDataFrame(seed_rows), n_files=6, cluster_by=["k"])

        expected: list[dict[int, int]] = [
            {k: k for k in self._own(i)} for i in range(self.N_THREADS)
        ]
        errors: list[BaseException] = []
        barrier = threading.Barrier(self.N_THREADS + 1)

        def writer(i: int) -> None:
            rng = random.Random(1300 + i)
            w = VersionedTable(spark, root)
            own = list(self._own(i))
            exp = expected[i]
            try:
                barrier.wait()
                for seq in range(1, self.OPS_PER + 1):
                    op = rng.choice(
                        ["merge", "merge", "merge", "del_keys", "del_range", "layout"]
                    )
                    if op == "merge":
                        ks = rng.sample(own, rng.randint(1, 6))
                        val = i * 100000 + seq * 100
                        src = spark.createDataFrame(
                            [Row(k=k, v=val + j) for j, k in enumerate(ks)]
                        )
                        w.merge_into(
                            src,
                            ["k"],
                            txn_app=f"w{i}",
                            txn_version=seq,
                            strategy=rng.choice(["cow", "mor"]),
                            max_retries=RETRIES,
                        )
                        for j, k in enumerate(ks):
                            exp[k] = val + j
                    elif op == "del_keys":
                        ks = rng.sample(own, rng.randint(1, 4))
                        w.delete_matching(
                            spark.createDataFrame([Row(k=k) for k in ks]),
                            ["k"],
                            txn_app=f"w{i}",
                            txn_version=seq,
                            max_retries=RETRIES,
                        )
                        for k in ks:
                            exp.pop(k, None)
                    elif op == "del_range":
                        lo = rng.choice(own[: self.KEYS_PER - 8])
                        hi = lo + rng.randint(0, 6)
                        w.delete_where(
                            f"k >= {lo} AND k <= {hi}", max_retries=RETRIES
                        )
                        for k in range(lo, hi + 1):
                            exp.pop(k, None)
                    else:  # layout / maintenance — data state unchanged
                        # a whole-table maintenance pass re-runs its
                        # full read-modify-write per optimistic round,
                        # so under THIS deliberately hot schedule it
                        # can starve: giving up is the correct
                        # best-effort behavior (production runs it
                        # from a scheduler that just tries again
                        # later), and data-state serializability —
                        # the soak's actual claim — must hold either
                        # way, so the model ignores the outcome
                        from iotdatapipeline_spark.sources.versioned import (
                            CommitConflict,
                        )

                        try:
                            if rng.random() < 0.5:
                                w.optimize(
                                    n_files=2,
                                    where=f"k >= {own[0]} AND k <= {own[-1]}",
                                    max_retries=RETRIES,
                                )
                            else:
                                w.compact_dv_stacked(
                                    threshold=2, max_retries=RETRIES
                                )
                        except CommitConflict:
                            pass  # starved by the hot schedule: retry-later op
            except BaseException as e:  # surfaced by the main thread
                errors.append(e)

        # a metadata chaos monkey: cdf toggles race the writers' commits
        # (forcing full retries through the rebase metadata check) but
        # never change data state
        stop = threading.Event()

        def toggler() -> None:
            w = VersionedTable(spark, root)
            try:
                barrier.wait()
                flag = False
                while not stop.is_set():
                    w.set_cdf(flag, max_retries=RETRIES)
                    flag = not flag
                    stop.wait(0.4)
                w.set_cdf(True, max_retries=RETRIES)
            except BaseException as e:
                errors.append(e)

        threads = [
            threading.Thread(target=writer, args=(i,))
            for i in range(self.N_THREADS)
        ]
        tog = threading.Thread(target=toggler)
        for th in threads:
            th.start()
        tog.start()
        for th in threads:
            th.join(timeout=600)
        stop.set()
        tog.join(timeout=60)
        assert not errors, f"writer failed: {errors[0]!r}"
        assert all(not th.is_alive() for th in threads)

        # serializability: final table == union of per-thread serial
        # outcomes (disjoint key spaces make any schedule equivalent
        # to the per-space serial order)
        want: dict[int, int] = {}
        for exp in expected:
            want.update(exp)
        got = {r["k"]: r["v"] for r in t.snapshot().collect()}
        assert got == want
        # every writer's LAST txn-keyed op landed exactly once: the txn
        # map's cursor equals the thread's final seq for ops that stamp
        txns = t._read_manifest(t.version()).get("txns") or {}
        for i in range(self.N_THREADS):
            rng = random.Random(1300 + i)
            last_stamped = 0
            for seq in range(1, self.OPS_PER + 1):
                op = rng.choice(
                    ["merge", "merge", "merge", "del_keys", "del_range", "layout"]
                )
                # consume the same rng draws the writer made
                if op == "merge":
                    rng.sample(list(self._own(i)), rng.randint(1, 6))
                    rng.choice(["cow", "mor"])
                    last_stamped = seq
                elif op == "del_keys":
                    rng.sample(list(self._own(i)), rng.randint(1, 4))
                    last_stamped = seq
                elif op == "del_range":
                    rng.choice(list(self._own(i))[: self.KEYS_PER - 8])
                    rng.randint(0, 6)
                else:
                    rng.random()
            seen = txns.get(f"w{i}")
            if last_stamped:
                assert seen is not None and int(seen[0]) == last_stamped
        # the table survived the soak structurally: history replays,
        # a fresh optimize compacts, reads stay consistent
        t.optimize(n_files=4)
        assert {r["k"]: r["v"] for r in t.snapshot().collect()} == want

    def test_restore_race_yields_a_serial_outcome(self, spark, tmp_path):
        """restore racing a merge must land on ONE of the two serial
        outcomes — merge-then-restore (merge gone) or
        restore-then-merge (merge applied over restored state) — and
        the loser must have retried against the winner's head, never
        interleaved half-states."""
        root = str(tmp_path / "rr")
        t = VersionedTable(spark, root)
        t.create(
            spark.createDataFrame([Row(k=i, v=i) for i in range(50)]),
            n_files=2,
            cluster_by=["k"],
        )
        t.merge_into(
            spark.createDataFrame([Row(k=1, v=111)]), ["k"]
        )  # v2 — the state restore returns to is v1
        a = VersionedTable(spark, root)
        b = VersionedTable(spark, root)
        done = threading.Barrier(2)
        errs: list[BaseException] = []

        def do_merge() -> None:
            try:
                done.wait()
                a.merge_into(
                    spark.createDataFrame([Row(k=2, v=222)]),
                    ["k"],
                    max_retries=RETRIES,
                )
            except BaseException as e:
                errs.append(e)

        def do_restore() -> None:
            try:
                done.wait()
                b.restore(1, max_retries=RETRIES)
            except BaseException as e:
                errs.append(e)

        th1, th2 = threading.Thread(target=do_merge), threading.Thread(
            target=do_restore
        )
        th1.start(), th2.start()
        th1.join(120), th2.join(120)
        assert not errs, f"racer failed: {errs[0]!r}"
        got = {r["k"]: r["v"] for r in t.snapshot().collect()}
        base = {k: k for k in range(50)}
        serial_restore_then_merge = {**base, 2: 222}
        serial_merge_then_restore = dict(base)
        assert got in (serial_restore_then_merge, serial_merge_then_restore)


class TestRefresherSoak:
    """r13: maintained-view refreshers racing the source writer AND
    each other — the matview concurrency contract under a real
    schedule fuzz instead of one injected race. Two refresher threads
    hammer refresh() on the SAME view while the main thread commits
    source bands; every refresh must either apply, no-op, or back off
    quietly (never the spurious divergence raise), and the final
    refreshed view must equal the direct aggregate."""

    def test_concurrent_refreshers_converge(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from iotdatapipeline_spark.matview import MaterializedView

        root = str(tmp_path / "rsrc")
        src = VersionedTable(spark, root)
        src.create(
            spark.range(4000).select(
                F.col("id").alias("k"), (F.col("id") % 16).alias("g"),
                F.lit(1).alias("v"),
            ),
            n_files=4,
            cluster_by=["k"],
        )
        mv = MaterializedView.create(
            spark, str(tmp_path / "rmv"), root,
            group_by=["g"], sum_cols=["v"], keys=["k"],
        )
        stop = threading.Event()
        errors: list[BaseException] = []

        def refresher(i: int) -> None:
            h = MaterializedView(spark, str(tmp_path / "rmv"))
            try:
                while not stop.is_set():
                    h.refresh()
            except BaseException as e:
                errors.append(e)

        threads = [
            threading.Thread(target=refresher, args=(i,)) for i in range(2)
        ]
        for th in threads:
            th.start()
        rng = random.Random(1313)
        try:
            for band in range(8):
                lo = rng.randrange(0, 3500)
                src.merge_into(
                    spark.range(lo, lo + 200).select(
                        F.col("id").alias("k"), (F.col("id") % 16).alias("g"),
                        F.lit(10 + band).alias("v"),
                    ),
                    ["k"],
                    max_retries=RETRIES,
                )
                src.delete_where(
                    f"k >= {lo} AND k <= {lo + 20}", max_retries=RETRIES
                )
        finally:
            stop.set()
            for th in threads:
                th.join(timeout=300)
        assert not errors, f"refresher failed: {errors[0]!r}"
        mv.refresh()  # final catch-up after the writers stopped
        want = {
            (r["g"], r["cnt"], r["s"])
            for r in src.snapshot().groupBy("g").agg(
                F.count("*").cast("long").alias("cnt"),
                F.sum("v").cast("long").alias("s"),
            ).collect()
        }
        got = {(r["g"], r["cnt"], r["sum_v"]) for r in mv.snapshot().collect()}
        assert got == want
