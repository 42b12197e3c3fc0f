"""One-off equivalence check for the r13 ordered_funnel rework:
new window-chain form vs the old join-chain form (exceptAll both ways)
at each test SF, plus schema comparison. Oracle parity is checked
separately via tools/parity_check.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from iotdatapipeline_spark import get_spark  # noqa: E402
from iotdatapipeline_spark.plans import QUERIES  # noqa: E402
from iotdatapipeline_spark.sources import load_table  # noqa: E402


def old_funnel(df: DataFrame, user_col, type_col, ts_col, stages, window_expr):
    ev = df.select(user_col, type_col, ts_col)
    prior = (
        ev.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    result = prior
    for i, stage in enumerate(stages[1:], start=2):
        tcol, out = f"t{i - 1}", f"t{i}"
        e = ev.filter(F.col(type_col) == stage).select(user_col, ts_col)
        nxt = (
            e.join(result.select(user_col, tcol), user_col)
            .filter(
                (F.col(ts_col) >= F.col(tcol))
                & (F.col(ts_col) < F.col(tcol) + F.expr(window_expr))
            )
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(out))
        )
        result = result.join(nxt, user_col, "left")
    return result.select(user_col, *[f"t{i}" for i in range(1, len(stages) + 1)])


def main() -> None:
    spark = get_spark("funnel-equiv")
    spark.sparkContext.setLogLevel("ERROR")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        new = QUERIES["events_funnel_stages"](spark, sf_dir)
        ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
        old = old_funnel(
            ev, "user_id", "event_type", "ts",
            ("view", "click", "purchase"), "INTERVAL 48 HOURS",
        )
        a = new.exceptAll(old).count()
        b = old.exceptAll(new).count()
        n = new.count()
        print(f"{sf}: rows={n} new-minus-old={a} old-minus-new={b} "
              f"schema_match={new.schema == old.schema}")
        if new.schema != old.schema:
            print("  new:", new.schema.simpleString())
            print("  old:", old.schema.simpleString())
        assert a == 0 and b == 0
    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
