"""Interleaved ABBA for the r13 resample rework: times the OLD
(HEAD~-sourced) and NEW resample_ffill / resample_interpolate bindings
in ONE session with the noop sink, median of 7 interleaved reps each,
plus an exceptAll row-identity check both ways.

Usage: python tools/bench_resample_ab.py [sf_dir] [old_git_rev]
"""

from __future__ import annotations

import importlib.util
import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iotdatapipeline_spark import get_spark  # noqa: E402
from iotdatapipeline_spark.operators import timeseries as new_ts  # noqa: E402
from iotdatapipeline_spark.sources import load_table  # noqa: E402


def load_old(rev: str):
    src = subprocess.run(
        ["git", "show", f"{rev}:iotdatapipeline_spark/operators/timeseries.py"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    with tempfile.NamedTemporaryFile("w", suffix="_old_ts.py", delete=False) as f:
        f.write(src)
        path = f.name
    spec = importlib.util.spec_from_file_location("old_timeseries", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(df):
    t0 = time.perf_counter()
    noop(df)
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rev = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
    old_ts = load_old(rev)
    spark = get_spark("bench-resample-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("station"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    kw = dict(key="station", ts_col="ts", value_col="v_cents", step="1 hour",
              trunc_unit="hour", tiebreak_cols=("ts", "event_id"), out_ts="hour_ts")
    pairs = {
        "ffill": (old_ts.resample_ffill(ev, **kw), new_ts.resample_ffill(ev, **kw)),
        "interpolate": (
            old_ts.resample_interpolate(ev, **kw),
            new_ts.resample_interpolate(ev, **kw),
        ),
    }
    for name, (old_df, new_df) in pairs.items():
        a = old_df.exceptAll(new_df).count()
        b = new_df.exceptAll(old_df).count()
        print(f"{name}: exceptAll old-new={a} new-old={b}")
        assert a == 0 and b == 0, name
        # warm both plans
        noop(old_df)
        noop(new_df)
        olds, news = [], []
        for _ in range(7):
            olds.append(timed(old_df))
            news.append(timed(new_df))
            news.append(timed(new_df))
            olds.append(timed(old_df))
        mo = statistics.median(olds)
        mn = statistics.median(news)
        print(f"{name}: old median {mo:.3f}s  new median {mn:.3f}s  ({mo/mn:.2f}x)")


if __name__ == "__main__":
    main()
