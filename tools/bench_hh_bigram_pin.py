"""x160 decomposition for the two unscoped weak rows (r11 verdict #3/#4).

NOTE (post-fix): the hh "stage_verify" below reconstructs the OLD
two-pass verify shape (broadcast-semi counts + separate total) for the
decomposition record — the SHIPPED heavy_hitters now runs the
single-scan candidate-or-NULL verify this decomposition motivated
(plans/sketches.py), so "full" reflects the new plan while
"stage_verify" documents what was removed. Same for bigram: "full"
carries the broadcast-model plan; the variants record the shoot-out.

events_heavy_hitters (20.2x at x160 in r10): stage timings — keyed
projection + freqItems candidate pass, exact verify pass, and the
plain GROUP BY/HAVING alternative (what the DuckDB oracle runs) — to
decide between an adaptive fast path and a formal scope line.

docs_bigram_lm_score (3.26x at x160 in r10): cumulative noop prefixes
(bigram explode, model aggregates, scoring join, per-doc reduce) plus
two candidate re-plans — per-doc pre-aggregation before the model
join, and an explicit broadcast of the per-bigram model.

Usage: python tools/bench_hh_bigram_pin.py [--tiles 160] [hh|bigram]
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
from pyspark.sql import functions as F

from bench import _duck_source, ensure_crossover_dir
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import ORACLE, QUERIES
from iotdatapipeline_spark.sources import load_table

ap = argparse.ArgumentParser()
ap.add_argument("--tiles", type=int, default=160)
ap.add_argument("which", nargs="*", default=["hh", "bigram"])
args = ap.parse_args()

xdir = ensure_crossover_dir("/root/testdata/sf0.1", tiles=args.tiles)
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("bench-hh-bigram-pin")
spark.sparkContext.setLogLevel("FATAL")
spark.conf.set("spark.sql.shuffle.partitions", cpus)
spark.conf.set("spark.sql.adaptive.enabled", "true")

con = duckdb.connect()
con.sql(f"SET threads TO {cpus}")
for t in ("events", "documents"):
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM {_duck_source(xdir, t)}")


def med(fn, reps=3):
    s = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        s.append(time.perf_counter() - t0)
    return round(statistics.median(s), 3)


def noop(df):
    return lambda: df.write.format("noop").mode("overwrite").save()


out = {"tiles": args.tiles}

if "hh" in args.which:
    hh = {}
    name = "events_heavy_hitters"
    run_full = lambda: QUERIES[name](spark, xdir).write.format("noop").mode(
        "overwrite"
    ).save()
    run_full()
    hh["full"] = med(run_full)
    duck = lambda: con.sql(ORACLE[name]).fetchall()
    duck()
    hh["duckdb"] = med(duck)

    ev = load_table(spark, xdir, "events")
    key = F.when(
        F.col("event_id") % 3 == 0, F.concat(F.lit("hot-"), F.col("event_type"))
    ).otherwise(F.concat(F.lit("cold-"), F.col("user_id").cast("string")))
    keyed = ev.select(key.alias("value"))
    cand_stage = lambda: keyed.stat.freqItems(["value"], support=0.0297).collect()
    cand_stage()
    hh["stage_freqitems"] = med(cand_stage)

    cands = [
        c
        for c in keyed.stat.freqItems(["value"], support=0.0297).collect()[0][0]
        if c is not None
    ]
    hh["n_candidates"] = len(cands)
    cand_df = spark.createDataFrame([(c,) for c in sorted(cands)], "value string")
    exact = keyed.join(F.broadcast(cand_df), "value").groupBy("value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = keyed.agg(F.count(F.lit(1)).alias("__n"))
    verify = (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= 0.03 * F.col("__n"))
        .select("value", "cnt")
    )
    v = noop(verify)
    v()
    hh["stage_verify"] = med(v)

    # the in-memory-scale alternative: one exact GROUP BY + HAVING
    plain = (
        keyed.groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= 0.03 * F.col("__n"))
        .select("value", "cnt")
    )
    p = noop(plain)
    p()
    hh["alt_plain_groupby"] = med(p)
    hh["n_distinct_keys"] = keyed.distinct().count()
    out["heavy_hitters"] = hh

if "bigram" in args.which:
    bg = {}
    name = "docs_bigram_lm_score"
    run_full = lambda: QUERIES[name](spark, xdir).write.format("noop").mode(
        "overwrite"
    ).save()
    run_full()
    bg["full"] = med(run_full)
    duck = lambda: con.sql(ORACLE[name]).fetchall()
    duck()
    bg["duckdb"] = med(duck)

    docs = load_table(spark, xdir, "documents")
    ws = docs.select("doc_id", F.split("text", " ").alias("ws"))
    bi = (
        ws.filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 2),"
                    " i -> struct(ws[i] AS prev, ws[i + 1] AS wd))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.prev").alias("prev"), F.col("b.wd").alias("wd"))
    )
    c2 = bi.groupBy("prev", "wd").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    v = ws.select(F.explode("ws").alias("x")).agg(F.countDistinct("x").alias("v"))
    p = F.floor(1_000_000.0 * (F.col("c2") + 1) / (F.col("c1") + F.col("v")))
    per_bigram = (
        c2.join(c1, ["prev"]).crossJoin(F.broadcast(v)).select("prev", "wd", p.alias("p"))
    )
    for label, df in (("bi_explode", bi), ("c2_model", c2), ("per_bigram_model", per_bigram)):
        r = noop(df)
        r()
        bg[f"stage_{label}"] = med(r)
    bg["n_distinct_bigrams"] = c2.count()

    # V2: pre-aggregate (doc, bigram) multiplicity before the model join
    dbi = bi.groupBy("doc_id", "prev", "wd").agg(F.count(F.lit(1)).alias("n"))
    scored2 = dbi.join(per_bigram, ["prev", "wd"]).select(
        "doc_id", "n", (F.col("p") * F.col("n")).alias("pn")
    )
    v2 = scored2.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.floor(F.sum("pn") / F.sum("n")).cast("long").alias("fluency_avg_x1e6"),
    )
    r = noop(v2)
    r()
    bg["variant_preagg_per_doc"] = med(r)

    # V3: force the model side to broadcast in the scoring join
    scored3 = bi.join(F.broadcast(per_bigram), ["prev", "wd"]).select("doc_id", "p")
    v3 = scored3.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.floor(F.sum("p") / F.count(F.lit(1))).cast("long").alias("fluency_avg_x1e6"),
    )
    r = noop(v3)
    r()
    bg["variant_broadcast_model"] = med(r)

    # V4: both — pre-agg left, broadcast model
    scored4 = dbi.join(F.broadcast(per_bigram), ["prev", "wd"]).select(
        "doc_id", "n", (F.col("p") * F.col("n")).alias("pn")
    )
    v4 = scored4.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.floor(F.sum("pn") / F.sum("n")).cast("long").alias("fluency_avg_x1e6"),
    )
    r = noop(v4)
    r()
    bg["variant_preagg_broadcast"] = med(r)
    out["bigram"] = bg

print(json.dumps(out))
