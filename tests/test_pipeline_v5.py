"""training_data_pipeline_v5: robots gate -> holdout -> page gate ->
line dedup -> lang/contamination census. Membership invariants against
the closed-form robots decision, census sanity, and the plan
invariants (pages persist once; no cartesian joins)."""

from __future__ import annotations

import re

from farmrpg_etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

# closed form of the row's robots rules over path '/Docs/<doc_id%50>',
# LONGEST match wins (RFC 9309): '/Docs/12' allow (len 8) beats
# '/Docs/1' deny (len 7); the '/Docs/3' allow+deny tie -> allow; the
# whole-host '/' deny on src*0 hosts (len 1) loses to ANY path rule —
# it only bites when no /Docs rule matches.
_PATH_DENIED = {1, 10, 11, 13, 14, 15, 16, 17, 18, 19}
_PATH_ALLOWED = {3, 12} | set(range(30, 40))


def _robots_allowed(doc_id: int, source: str) -> bool:
    n = doc_id % 50
    if n in _PATH_DENIED:
        return False
    if n in _PATH_ALLOWED:
        return True
    return not re.match(r"^src\d*0$", source)


class TestTrainingDataPipelineV5:
    def test_membership_invariants(self, spark):
        """Every output doc is robots-allowed, outside the %101
        holdout, and carries a sane census."""
        from farmrpg_etl_spark.sources.tables import load_table

        src = {
            r["doc_id"]: r["source"]
            for r in load_table(spark, SF, "documents")
            .select("doc_id", "source")
            .collect()
        }
        rows = QUERIES["training_data_pipeline_v5"](spark, SF).collect()
        assert len(rows) > 0
        for r in rows:
            assert _robots_allowed(r["doc_id"], src[r["doc_id"]]), r["doc_id"]
            assert r["doc_id"] % 101 != 0
            assert r["n_kept"] >= 0
            assert len(r["out_digest"]) == 32
            assert r["n_contaminated"] >= 0
            assert isinstance(r["lang"], str) and len(r["lang"]) in (2, 3)
        # the gates must actually gate: some allowed docs are absent
        eligible = {
            d for d, s in src.items() if _robots_allowed(d, s) and d % 101
        }
        assert 0 < len(rows) < len(eligible)

    def test_plan_pages_materialize_once_no_cartesian(self, spark):
        """The structured-pages relation materializes ONCE (an eager
        localCheckpoint leaf — r14: a persist here had no release
        path and leaked a cache entry per pipeline call) and feeds
        both the gate and dedup branches; rules/eval-gram joins never
        degrade to cartesian products."""
        df = QUERIES["training_data_pipeline_v5"](spark, SF)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert ("LogicalRDD" in opt) or ("ExistingRDD" in opt)
        assert "CartesianProduct" not in opt
        phys = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in phys
