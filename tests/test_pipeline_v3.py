"""training_data_pipeline_v3: line dedup -> quality-logit gate ->
perplexity bucketing composed in one plan — semantics on a crafted
corpus plus the branch-shared-persist plan invariant."""

from __future__ import annotations

import pytest

from farmrpg_etl_spark.queries import QUERIES

_SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8-token line


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("v3corpus")
    rows = [
        # A and B share their first 8-token window -> corpus-frequent
        # line, cut from both; their second windows survive and pass
        # the quality gate (stopwords present, all-distinct tokens).
        (1, _SHARED + " the quick brown fox jumps over a fence"),
        (2, _SHARED + " the small grey cat sleeps under a table"),
        # C: no shared window, both lines survive.
        (3, "the old red barn stands near a river "
            "and the tall green tree grows by its door"),
        # D: internally duplicated window -> BOTH its lines are
        # corpus-frequent (freq 2), document empties, gate drops it.
        (4, ("junk " * 16).strip()),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


class TestTrainingDataPipelineV3:
    def test_semantics(self, spark, corpus_dir):
        out = {r.doc_id: r for r in
               QUERIES["training_data_pipeline_v3"](spark, corpus_dir)
               .collect()}
        assert set(out) == {1, 2, 3}
        assert out[1].n_lines == 2 and out[1].n_kept == 1
        assert out[2].n_kept == 1
        assert out[3].n_lines == 3 and out[3].n_kept == 3
        assert all(r.logit >= 0 for r in out.values())
        assert all(r.bucket in ("head", "middle") for r in out.values())
        assert all(r.n_tok > 0 and r.nll > 0 for r in out.values())

    def test_plan_branches_read_the_cache(self, spark, corpus_dir):
        """`cleaned` and the survivor relation persist once; the
        quality gate, LM-training, scoring, and join-back branches all
        read the caches. The only uncached parquet reads allowed are
        the two scans INSIDE the cached line-dedup subtree (frequency
        + marker branches) — and those live inside the
        InMemoryRelation, not in the outer plan."""
        df = QUERIES["training_data_pipeline_v3"](spark, corpus_dir)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        uncached = [
            line for line in opt.splitlines()
            if "Relation" in line and "parquet" in line
            and "InMemoryRelation" not in line
        ]
        assert uncached == [], uncached
        assert "InMemoryRelation" in opt
