"""VERDICT r13 item 10's one sanctioned weak-list experiment: can a
scoped mapInArrow JSON parse (guide §4.2 — hand whole Arrow batches to
a vectorized native engine, DuckDB here, and return per-batch PARTIAL
aggregates so only tiny rows cross the Python->JVM boundary) beat the
Jackson parse floor of events_props_variant? Usage:

    python tools/bench_props_mia_ab.py <sf_dir> [--reps N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table
from tools.bench_q3_shootout import interleaved_ab


def _parse_batches(batches):
    """Per-task: one DuckDB connection (guide §4.5 — heavyweight init
    once per task), one SQL pass per Arrow batch producing per-station
    partials. The injected-truncation rule (event_id % 97) and the
    valid/invalid accounting mirror events_props_variant exactly; the
    oracle itself is DuckDB, so the JSON semantics agree by
    construction."""
    import duckdb
    import pyarrow as pa

    con = duckdb.connect()
    for batch in batches:
        tbl = pa.Table.from_batches([batch])
        con.register("b", tbl)
        out = con.sql(
            """
            WITH p AS (
                SELECT user_id,
                       CASE WHEN event_id % 97 = 0 THEN substr(props, 1, 3)
                            ELSE props END AS payload
                FROM b
            ),
            v AS (
                SELECT user_id,
                       CASE WHEN json_valid(payload) THEN payload END AS j
                FROM p
            )
            SELECT user_id AS station,
                   CAST(sum(CAST(json_extract(j, '$.k') AS BIGINT)) AS BIGINT) AS k_part,
                   CAST(count(j) AS BIGINT) AS n_parsed_part,
                   CAST(sum(CASE WHEN j IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_part,
                   CAST(count(*) AS BIGINT) AS n_events_part
            FROM v GROUP BY user_id
            """
        ).arrow()
        con.unregister("b")
        yield from out.to_batches()


def mia_variant(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # project ONLY the columns the parse needs before the opaque op
    # (guide §4.1: Spark cannot see which columns the function touches)
    partials = ev.select("user_id", "event_id", "props").mapInArrow(
        _parse_batches,
        "station bigint, k_part bigint, n_parsed_part bigint, n_bad_part bigint, n_events_part bigint",
    )
    return partials.groupBy("station").agg(
        F.sum("k_part").cast("long").alias("k_total"),
        F.sum("n_parsed_part").cast("long").alias("n_parsed"),
        F.sum("n_bad_part").cast("long").alias("n_bad"),
        F.sum("n_events_part").cast("long").alias("n_events"),
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark("props-mia-ab")
    spark.sparkContext.setLogLevel("ERROR")
    _small = "/testdata/" in sf_dir
    spark.conf.set("spark.sql.shuffle.partitions", "8" if _small else os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.sql.adaptive.enabled", "false" if _small else "true")

    cur = QUERIES["events_props_variant"](spark, sf_dir)
    mia = mia_variant(spark, sf_dir)
    da, db = mia.exceptAll(cur).count(), cur.exceptAll(mia).count()
    print("exceptAll", da, db)
    assert da == 0 and db == 0

    run = lambda q: (lambda: q.write.format("noop").mode("overwrite").save())  # noqa: E731
    interleaved_ab("variant (JVM) ", run(cur), "mapInArrow+ddb", run(mia), reps=reps)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
