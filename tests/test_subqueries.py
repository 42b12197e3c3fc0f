"""Gate tests for the subquery/decorrelation registry
(plans/subqueries.py): plan-shape pins for the properties that matter
at cluster scale, plus the semantic invariants the DuckDB hash-match
can't state directly (e.g. "outer join preserved the zero groups").

Value parity itself is covered by tools/parity_check.py /
CORRECTNESS_r{N}.json — these tests pin the HOW.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iotdatapipeline_spark.plans import ORACLE, QUERIES
from iotdatapipeline_spark.sources import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


NEW_QUERIES = [
    "q2_max_acctbal_supplier",
    "q4_priority_exists",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q10_returned_customers",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_bands",
    "q21_sole_blame_supplier",
    "q22_idle_customers",
    "loyal_customers_division",
]


class TestRegistry:
    def test_all_registered_with_oracles(self):
        for name in NEW_QUERIES:
            assert name in QUERIES, name
            assert name in ORACLE, name


class TestPlanShapes:
    def test_q2_correlated_max_is_one_window_no_self_join(self, spark, sf_small):
        # the correlated scalar subquery must decorrelate to a window,
        # not a supplier-vs-aggregated-supplier self-join
        plan = _plan(QUERIES["q2_max_acctbal_supplier"](spark, sf_small))
        assert plan.count("Window") == 1, plan
        assert "SortMergeJoin" not in plan, plan
        # supplier scanned once: a second scan means the window
        # collapsed back into an agg+join rewrite
        assert plan.count("FileScan") == 2, plan  # supplier + nation

    def test_q4_exists_is_semi_join(self, spark, sf_small):
        plan = _plan(QUERIES["q4_priority_exists"](spark, sf_small))
        assert "LeftSemi" in plan, plan

    def test_q13_priority_filter_stays_in_outer_join(self, spark, sf_small):
        # the <> predicate must ride the join condition; filtering
        # orders *after* a left join would also work, but filtering
        # customers out (inner join) would lose the zero groups
        plan = _plan(QUERIES["q13_order_count_distribution"](spark, sf_small))
        assert "LeftOuter" in plan, plan

    def test_q16_not_in_becomes_broadcast_anti_join(self, spark, sf_small):
        plan = _plan(QUERIES["q16_supplier_part_counts"](spark, sf_small))
        assert "LeftAnti" in plan, plan
        assert "BroadcastHashJoin" in plan, plan

    def test_q17_correlated_avg_is_one_window_one_lineitem_scan(self, spark, sf_small):
        # sum_qty and n_items share one partitionBy(l_partkey) spec →
        # must collapse to a single Window node over a single shuffle
        plan = _plan(QUERIES["q17_small_quantity_revenue"](spark, sf_small))
        assert plan.count("Window") == 1, plan
        assert plan.count("FileScan") == 2, plan  # lineitem + part, each once

    def test_q19_implied_filters_reach_both_scans(self, spark, sf_small):
        # the OR-of-conjunctions can't sink below the join; the implied
        # per-side filters must still prune both scans
        plan = _plan(QUERIES["q19_disjunctive_bands"](spark, sf_small))
        assert "BroadcastHashJoin" in plan, plan
        pushed_li = [s for s in plan.splitlines() if "PushedFilters" in s and "l_quantity" in s]
        assert pushed_li, plan  # quantity hull [1,30] reached the lineitem scan

    def test_q21_existence_counts_are_one_window_one_lineitem_scan(self, spark, sf_small):
        # r13: n_supp / n_r_supp are distinct-count window aggregates
        # sharing one partitionBy(l_orderkey) spec — the agg+join form
        # scanned lineitem twice and shuffled both sides by orderkey
        plan = _plan(QUERIES["q21_sole_blame_supplier"](spark, sf_small))
        assert plan.count("Window") == 1, plan
        assert plan.count("FileScan") == 3, plan  # lineitem + orders + supplier
        assert plan.count("Join") == 2, plan  # orders filter + supplier dim

    def test_q22_threshold_is_broadcast_not_driver_roundtrip(self, spark, sf_small):
        # scalar threshold joins in as a 1-row broadcast (nested-loop
        # cross) — no collect() on the driver, anti join for NOT EXISTS
        plan = _plan(QUERIES["q22_idle_customers"](spark, sf_small))
        assert "BroadcastNestedLoopJoin" in plan, plan
        assert "LeftAnti" in plan, plan


class TestInvariants:
    def test_q13_zero_order_customers_survive(self, spark, sf_small):
        # Σ custdist == |customer|: the histogram partitions ALL
        # customers, including those with zero qualifying orders
        dist = QUERIES["q13_order_count_distribution"](spark, sf_small)
        total = dist.agg(F.sum(F.col("custdist"))).collect()[0][0]
        n_cust = load_table(spark, sf_small, "customer").count()
        assert total == n_cust

    def test_q15_all_rows_tie_at_max(self, spark, sf_small):
        rows = QUERIES["q15_top_supplier"](spark, sf_small).collect()
        assert rows
        cents = {r["total_cents"] for r in rows}
        assert len(cents) == 1

    def test_division_agg_runs_below_customer_join(self, spark, sf_small):
        # the "for all quarters" aggregate must shrink the key set
        # BEFORE the dimension join — the plan joins the filtered
        # aggregate, never the raw orders, to customer
        df = QUERIES["loyal_customers_division"](spark, sf_small)
        plan = _plan(df)
        agg_pos = plan.find("HashAggregate")
        join_pos = plan.find("Join")
        assert agg_pos != -1 and join_pos != -1
        rows = df.collect()
        # every qualifying customer has >= 4 orders (one per quarter)
        assert all(r["n_orders"] >= 4 for r in rows)

    def test_q2_every_nation_represented(self, spark, sf_small):
        rows = QUERIES["q2_max_acctbal_supplier"](spark, sf_small).collect()
        n_nations = (
            load_table(spark, sf_small, "supplier").select("s_nationkey").distinct().count()
        )
        assert len({r["n_name"] for r in rows}) == n_nations
