"""PageRank (operators/graph.py): hand-computed values on a 3-node
graph, determinism across partitionings, and sink behavior of the
documented simplified form."""

from __future__ import annotations

import pytest

from vectordb_from_scratch_spark.operators import graph


@pytest.fixture(scope="module")
def tiny(spark):
    # 1→2, 1→3, 2→3 ; node 3 is a sink
    return spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long"
    )


def test_pagerank_hand_computed_one_iter(spark, tiny):
    res = {r.node: r.pr for r in graph.pagerank(tiny, iters=1).collect()}
    base = (1.0 - 0.85) / 3.0
    assert res[1] == pytest.approx(base, abs=0)
    assert res[2] == pytest.approx(base + 0.85 * ((1 / 3) / 2), rel=1e-15)
    assert res[3] == pytest.approx(base + 0.85 * ((1 / 3) / 2 + (1 / 3) / 1), rel=1e-15)
    # sink ranks highest, source lowest
    assert res[3] > res[2] > res[1]


def test_pagerank_partitioning_invariant(spark, tiny):
    a = {r.node: r.pr for r in graph.pagerank(tiny, iters=3).collect()}
    b = {
        r.node: r.pr
        for r in graph.pagerank(tiny.repartition(7), iters=3).collect()
    }
    assert a == b  # bit-identical, not approximately equal


def test_pagerank_uniform_cycle(spark):
    """A directed cycle is rank-uniform at every iteration and conserves
    total mass exactly (no sinks)."""
    cyc = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src long, dst long"
    )
    res = [r.pr for r in graph.pagerank(cyc, iters=4).collect()]
    assert all(p == pytest.approx(0.2, rel=1e-12) for p in res)


class TestLabelPropagation:
    def test_two_cliques_separate_communities(self, spark):
        from vectordb_from_scratch_spark.operators.graph import label_propagation

        # clique A {1,2,3,4}, clique B {10,11,12,13}, one bridge 4-10
        def clique(ns):
            return [(a, b) for a in ns for b in ns if a < b]

        edges = spark.createDataFrame(
            clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)],
            "src long, dst long",
        )
        out = {r["node"]: r["label"] for r in label_propagation(edges, iters=4).collect()}
        a_labels = {out[n] for n in (1, 2, 3)}
        b_labels = {out[n] for n in (11, 12, 13)}
        # clique cores converge to one label each, and the two differ
        assert len(a_labels) == 1 and len(b_labels) == 1
        assert a_labels != b_labels

    def test_synchronous_determinism_under_repartition(self, spark):
        from vectordb_from_scratch_spark.operators.graph import label_propagation

        edges = spark.createDataFrame(
            [(i, (i + 1) % 20) for i in range(20)] + [(i, (i + 7) % 20) for i in range(20)],
            "src long, dst long",
        )
        a = sorted((r["node"], r["label"]) for r in label_propagation(edges, iters=3).collect())
        b = sorted(
            (r["node"], r["label"])
            for r in label_propagation(edges.repartition(11), iters=3).collect()
        )
        assert a == b


class TestTriangleCount:
    def _counts(self, spark, edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        return {r.node: r.n_triangles for r in graph.triangle_count(df).collect()}

    def test_k4_every_vertex_in_three_triangles(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        assert self._counts(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_path_graph_has_no_triangles(self, spark):
        assert self._counts(spark, [(1, 2), (2, 3), (3, 4)]) == {
            1: 0, 2: 0, 3: 0, 4: 0
        }

    def test_direction_and_duplicates_ignored(self, spark):
        # triangle given with mixed directions + a duplicate + a self-loop
        edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2)]
        assert self._counts(spark, edges) == {1: 1, 2: 1, 3: 1}

    def test_two_triangles_sharing_an_edge(self, spark):
        # {1,2,3} and {2,3,4}: shared edge (2,3) → nodes 2,3 in 2 triangles
        edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
        assert self._counts(spark, edges) == {1: 1, 2: 2, 3: 2, 4: 1}
