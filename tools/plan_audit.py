"""Registry-wide physical-plan audit: one row per registered query with
the plan facts that matter at 100 TB — shuffle count, scan count,
broadcast vs sort-merge vs shuffled-hash joins, whole-stage-codegen
coverage, and the
two anti-patterns (CartesianProduct, row-wise Python).

Usage:

    python tools/plan_audit.py [sf_dir] [query ...]   # table to stdout
    python tools/plan_audit.py --md                   # markdown table

The per-plan numbers are *shape* facts (from ``explain``), not wall
times — bench.py measures time; this tool answers "would this plan
survive a 100× scale-up" at a glance and catches regressions (a new
Exchange, a lost broadcast, a CartesianProduct creeping in).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iotdatapipeline_spark import get_spark  # noqa: E402
from iotdatapipeline_spark.plans import QUERIES  # noqa: E402

COLUMNS = ("query", "exchanges", "scans", "bhj", "smj", "shj", "bnlj", "flags")


def audit_one(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BatchEvalPython" in plan:
        flags.append("ROW_PYTHON")
    return {
        "exchanges": plan.count("Exchange") - plan.count("BroadcastExchange"),
        "scans": plan.count("Scan parquet"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "flags": ",".join(flags) or "-",
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    md = "--md" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            rows.append({"query": name, **audit_one(fn(spark, sf_dir))})
        except Exception as e:
            rows.append({"query": name, "exchanges": -1, "scans": -1, "bhj": -1, "smj": -1, "shj": -1, "bnlj": -1, "flags": f"ERROR:{type(e).__name__}"})
    widths = {c: max(len(c), *(len(str(r[c])) for r in rows)) for c in COLUMNS}
    sep = " | " if md else "  "
    line = sep.join(c.ljust(widths[c]) for c in COLUMNS)
    print(f"| {line} |" if md else line)
    if md:
        print("|" + "|".join("-" * (widths[c] + 2) for c in COLUMNS) + "|")
    for r in rows:
        line = sep.join(str(r[c]).ljust(widths[c]) for c in COLUMNS)
        print(f"| {line} |" if md else line)
    flagged = [r for r in rows if r["flags"] not in ("-",) and not r["flags"].startswith("ERROR")]
    errors = [r for r in rows if str(r["flags"]).startswith("ERROR")]
    print(f"\n{len(rows)} plans; {len(flagged)} flagged; {len(errors)} errors")
    spark.stop()
    return 1 if (flagged or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
