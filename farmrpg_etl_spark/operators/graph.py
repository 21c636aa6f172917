"""Iterative graph computation (PageRank) as relational rounds.

The canonical iterative-join Spark workload: rank mass flows along
edges for a FIXED number of rounds. Everything is a composition of
equi-joins and partial-aggregated groupBys keyed on node ids — no
per-node loops, no driver-side graph structure.

Cross-engine determinism discipline (the same rules as the decimal
aggregates elsewhere): per-edge contributions are floor-quantized to
micros and summed as exact integers, so the per-destination sum is
order-independent and the DuckDB oracle reproduces every round
bit-for-bit; the damping factor is DYADIC (0.875) so the literal
parses to the same double in both engines.

Scale shape (a web-scale link graph):
* each round is one shuffle keyed on ``dst`` (partial-agg combines
  per-destination mass map-side; hub destinations are absorbed there,
  the classic skew answer for power-law graphs) plus a broadcast-able
  out-degree join;
* plan lineage is cut per round with the reliable checkpoint
  (``iterate.truncate_lineage``) — the analyzer blow-up failure mode
  documented in docs/SCALE.md for the BPE loop applies verbatim to
  any relational fixpoint loop;
* the node count enters as one driver-side scalar (``nodes.count()``)
  — a single bounded action, the same contract as the k-means
  centroid collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from farmrpg_etl_spark.operators.iterate import truncate_lineage

DAMPING = 0.875  # dyadic, not the folklore 0.85 — exact in both engines


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 5,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-``n_iter`` PageRank with uniform teleport. ``nodes`` is
    one row per node id; ``edges`` is the directed link list
    (self-loops allowed; parallel edges contribute multiply, per the
    matrix formulation). Nodes with no in-links settle at the teleport
    floor ``(1-d)/N``. Dangling mass (a node with no out-links) is
    dropped rather than redistributed — deterministic, documented, and
    absent from the synthesized fixed-out-degree graphs this engine's
    rows build; pass a graph with out-degree ≥ 1 everywhere if the
    redistribution semantics matter.

    Returns ``(id, rank)`` with the exact double rank.
    """
    n = nodes.count()
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select(
        F.col(id_col), (F.lit(1.0) / F.lit(n).cast("double")).alias("rank")
    )
    teleport = F.lit(1.0 - DAMPING) / F.lit(n).cast("double")
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks, edges[src_col] == ranks[id_col])
            .join(deg, src_col)
            .select(
                F.col(dst_col).alias("__dst"),
                F.floor(
                    ((F.col("rank") * F.lit(DAMPING)) / F.col("outdeg"))
                    * F.lit(1000000.0)
                )
                .cast("long")
                .alias("__cm"),
            )
        )
        agg = contrib.groupBy("__dst").agg(F.sum("__cm").alias("__sm"))
        ranks = (
            nodes.join(agg, nodes[id_col] == agg["__dst"], "left")
            .select(
                F.col(id_col),
                (
                    teleport
                    + F.coalesce(F.col("__sm"), F.lit(0)) / F.lit(1000000.0)
                ).alias("rank"),
            )
        )
        ranks = truncate_lineage(ranks)
    return ranks
