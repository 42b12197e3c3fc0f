"""T8 — the hot-reload control plane (Prensas.py:835-947).

A driver-side loop: re-read the config DataFrame every ``poll_s``,
fingerprint each group (C7), and restart only the queries whose
fingerprint changed — start new, stop removed. Not an operator; kept
deliberately thin (SURVEY.md §7 step 7)."""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from iotdatapipeline_spark.functions import config_fingerprint


def config_fingerprints(config: DataFrame, group_col: str) -> dict[str, str]:
    """md5 per group over the sorted member rows (deterministic)."""
    cols = [c for c in config.columns if c != group_col]
    per_row = config.select(
        F.col(group_col).cast("string").alias("__g"),
        config_fingerprint(*[F.col(c) for c in cols]).alias("__h"),
    )
    agg = per_row.groupBy("__g").agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list("__h")))).alias("__fp"))
    return {r["__g"]: r["__fp"] for r in agg.collect()}


class Supervisor:
    """Tracks one StreamingQuery per config group; diffing restarts
    only what changed (Prensas.py:866-944)."""

    def __init__(self, start_query: Callable[[str], StreamingQuery]):
        self._start = start_query
        self._queries: dict[str, StreamingQuery] = {}
        self._fps: dict[str, str] = {}

    def reconcile(self, fingerprints: dict[str, str]) -> dict[str, str]:
        """Apply one diff round; returns {group: action} taken."""
        actions: dict[str, str] = {}
        for group, fp in fingerprints.items():
            if group not in self._fps:
                self._queries[group] = self._start(group)
                actions[group] = "started"
            elif self._fps[group] != fp:
                self._queries[group].stop()
                self._queries[group] = self._start(group)
                actions[group] = "restarted"
        for group in list(self._fps):
            if group not in fingerprints:
                self._queries.pop(group).stop()
                actions[group] = "stopped"
        self._fps = dict(fingerprints)
        return actions

    def run(self, load_config: Callable[[], dict[str, str]], poll_s: float = 3.0, rounds: int | None = None):
        """The 3 s reload loop (Prensas.py:69,862). ``rounds`` bounds
        iteration for tests; None runs until KeyboardInterrupt."""
        n = 0
        while rounds is None or n < rounds:
            self.reconcile(load_config())
            n += 1
            time.sleep(poll_s)

    def stop_all(self) -> None:
        for q in self._queries.values():
            q.stop()
        self._queries.clear()
        self._fps.clear()
