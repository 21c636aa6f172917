"""Record linkage (operators/linkage.py)."""

from farmrpg_etl_spark.operators.linkage import (
    blocked_fuzzy_pairs,
    resolve_entities,
)
from pyspark.sql import functions as F


def test_blocked_pairs_verify_distance_and_blocking(spark):
    recs = spark.createDataFrame(
        [
            (1, "alice smith 9911"),
            (2, "alyce smith 9911"),   # dist 1, same block
            (3, "alice smith 0000"),   # same name, different block -> no pair
            (4, "bob jones 9911"),     # same block, far -> verified out
        ],
        "id long, rec string",
    )
    pairs = {(r.id_a, r.id_b): r.dist for r in blocked_fuzzy_pairs(
        recs, "rec", "id", F.expr("right(rec, 4)"), max_distance=2
    ).collect()}
    assert pairs == {(1, 2): 1}


def test_resolve_entities_transitive_chain(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
    )
    out = {r.id: r.cluster_id for r in resolve_entities(pairs).collect()}
    # 1-2-3 chain collapses to min id 1; 7-9 to 7
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}
