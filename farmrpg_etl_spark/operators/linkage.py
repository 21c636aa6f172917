"""Entity resolution (record linkage): blocked fuzzy matching +
transitive closure.

The classic data-engineering workload the warehouse runs before any
customer analytics: the same real-world entity arrives as multiple
records with typos. The scalable shape is three stages — BLOCK
(cheap key that collides true matches), VERIFY (exact edit distance
inside blocks only), CLUSTER (connected components over the verified
pairs) — and never an all-pairs comparison.

Levenshtein is the one distance both engines implement identically
(the classic DP, integer result), so the verify stage is
oracle-exact; the closure reuses
:func:`~farmrpg_etl_spark.operators.dedup.neardup_clusters`
(min-label propagation with reliable-checkpoint lineage cuts).

Scale shape (billions of records):
* the self-join keys on the block — block sizes are the skew dial;
  a production blocker composes several keys (phonetic, q-gram,
  sorted-neighborhood) exactly like the length×lang band in
  ``ngram_jaccard_pairs``;
* Levenshtein cost is O(len²) per candidate, paid only inside
  blocks; the cap on block size bounds the quadratic term;
* closure rounds are O(cluster diameter) — duplicate clusters are
  shallow (stars around a canonical record).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    records: DataFrame,
    text_col: str,
    id_col: str,
    block_col,
    max_distance: int = 2,
) -> DataFrame:
    """Candidate pairs by block, verified with exact Levenshtein:
    ``(id_a, id_b, dist)`` with ``id_a < id_b`` and ``dist <=
    max_distance``. ``block_col`` is a Column expression over the
    record (e.g. a tail substring, a phonetic key)."""
    blocked = records.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("rec"),
        block_col.alias("blk"),
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein("a.rec", "b.rec").alias("dist"),
        )
        .filter(F.col("dist") <= max_distance)
    )


def resolve_entities(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Transitive closure of the verified pairs → ``(id, cluster_id)``
    with ``cluster_id`` = min member id (the canonical record)."""
    from farmrpg_etl_spark.operators.dedup import neardup_clusters

    return neardup_clusters(pairs.select("id_a", "id_b"), max_iters=max_iters)
