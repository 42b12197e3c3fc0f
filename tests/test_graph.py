"""Connected components (operators.graph): correctness against a
pure-Python union-find reference, convergence on adversarial shapes
(long chains — the case diameter-bound label propagation can't
afford), and the fuzzy-entity gate composition."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iotdatapipeline_spark.operators.graph import connected_components

SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find reference: node → min node id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in parent}


def run_cc(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src bigint, dst bigint"
    )
    out = connected_components(df).collect()
    return {r["node"]: r["component_id"] for r in out}


class TestConnectedComponents:
    def test_two_components_and_chain(self, spark):
        edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10)]
        got = run_cc(spark, edges)
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_cycle_and_self_loop(self, spark):
        edges = [(5, 6), (6, 7), (7, 5), (8, 8)]
        got = run_cc(spark, edges)
        # self-loop-only node 8 contributes no real edge → absent
        assert got == {5: 5, 6: 5, 7: 5}

    def test_long_chain_converges_in_log_rounds(self, spark):
        # a 64-node path: diameter 63, but star contraction needs only
        # O(log n) rounds — max_iter=10 would fail a diameter-bound
        # algorithm and passes here
        edges = [(i, i + 1) for i in range(64)]
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        out = connected_components(df, max_iter=10).collect()
        assert {r["node"] for r in out} == set(range(65))
        assert {r["component_id"] for r in out} == {0}

    def test_empty_edges(self, spark):
        df = spark.createDataFrame([], "src bigint, dst bigint")
        assert connected_components(df).count() == 0

    @SET
    @given(
        st.lists(
            st.tuples(st.integers(0, 24), st.integers(0, 24)),
            min_size=0,
            max_size=40,
        )
    )
    def test_matches_union_find(self, spark, edges):
        real = [(a, b) for a, b in edges if a != b]
        assert run_cc(spark, edges) == uf_components(real)


class TestBomExplosion:
    def test_matches_python_recursion(self, spark, sf_small):
        from collections import defaultdict

        from iotdatapipeline_spark.plans import QUERIES
        from iotdatapipeline_spark.sources import load_table

        keys = [
            r.p_partkey for r in load_table(spark, sf_small, "part").select("p_partkey").collect()
        ]
        want_n: dict = defaultdict(int)
        want_q: dict = defaultdict(int)
        for k in keys:
            node, pq = k, 1
            while node > 0:
                want_n[node] += 1
                want_q[node] += pq
                pq *= node % 7 + 1
                node //= 10
        got = {
            r.node: (r.n_descendants, r.extended_qty)
            for r in QUERIES["parts_bom_explosion"](spark, sf_small).collect()
        }
        assert got == {n: (want_n[n], want_q[n]) for n in want_n}
