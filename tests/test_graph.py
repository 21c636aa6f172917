"""PageRank (operators/graph.py)."""

import pytest

from farmrpg_etl_spark.operators.graph import DAMPING, pagerank


def test_uniform_ring_stays_uniform(spark):
    """On a directed ring every node has in/out degree 1, so the
    uniform distribution is the exact fixpoint and every round must
    reproduce it (up to the micro quantization floor)."""
    n = 8
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    ranks = {r.id: r.rank for r in pagerank(nodes, edges, n_iter=4).collect()}
    for v in ranks.values():
        assert v == pytest.approx(1.0 / n, abs=2e-5)


def test_hub_outranks_leaves_and_mass_conserved(spark):
    """Star graph: every leaf links to the hub, the hub links back to
    one leaf. The hub must end far above the teleport floor; total
    mass stays ~1 (no dangling nodes; quantization only floors)."""
    n = 10
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    rows = [(i, 0) for i in range(1, n)] + [(0, 1)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    ranks = {r.id: r.rank for r in pagerank(nodes, edges, n_iter=5).collect()}
    floor = (1 - DAMPING) / n
    assert ranks[0] > 5 * floor
    # leaves with no in-links sit at the teleport floor
    for i in range(2, n):
        assert ranks[i] == pytest.approx(floor, abs=1e-9)
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-3)
