"""Driver-side profile of the T4 state-fn Python body (no Spark).

Reproduces the ×40 soak's per-group shape — ~60 k (station, part)
keys, small per-invocation batches — and times make_state_fn's body
directly with a mock GroupState, so the Python-side share of the
per-group cost is measurable and cProfile-attributable separately
from Spark's Arrow transfer.

    python tools/profile_statefn.py [n_groups] [rows_per_group] [--profile]
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from iotdatapipeline_spark.streaming.stateful import make_state_fn  # noqa: E402


class MockState:
    """Just enough of pyspark GroupState for the fn body."""

    hasTimedOut = False

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def getCurrentWatermarkMs(self):
        return 0

    def setTimeoutTimestamp(self, ms):
        pass

    def setTimeoutDuration(self, ms):
        pass


def build_groups(n_groups: int, rows: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    groups = []
    base = pd.Timestamp("2024-03-01 06:00:00")
    for g in range(n_groups):
        counters = np.maximum.accumulate(rng.integers(0, 50, size=rows).cumsum() - rng.integers(0, 5, size=rows))
        ts = base + pd.to_timedelta(rng.integers(60, 4000, size=rows).cumsum(), unit="s")
        pdf = pd.DataFrame(
            {
                "station": np.int64(g),
                "part": f"P{g % 97}",
                "ts": ts,
                "event_id": np.arange(rows, dtype=np.int64),
                "counter": counters.astype(np.int64),
            }
        )
        groups.append(((g, f"P{g % 97}"), pdf))
    return groups


def run(groups, fn):
    n_out = 0
    states = {}
    for key, pdf in groups:
        st = states.setdefault(key, MockState())
        for out in fn(key, iter([pdf]), st):
            n_out += len(out)
    return n_out


def main():
    n_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 17
    groups = build_groups(n_groups, rows)
    fn = make_state_fn("reference", timeout_ms=3_600_000, timeout_mode="event")
    # warm
    run(groups[:200], fn)
    t0 = time.perf_counter()
    n_out = run(groups, fn)
    wall = time.perf_counter() - t0
    total_rows = n_groups * rows
    print(
        f"groups={n_groups} rows/group={rows} total={total_rows} "
        f"emits={n_out} wall={wall:.2f}s rows/s={total_rows / wall:,.0f} "
        f"us/group={wall / n_groups * 1e6:.0f}"
    )
    if "--profile" in sys.argv:
        pr = cProfile.Profile()
        pr.enable()
        run(groups, fn)
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
        print(s.getvalue())


if __name__ == "__main__":
    main()
