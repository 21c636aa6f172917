"""farmrpg_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the dataflow and query semantics of the reference ETL
service ``coderanger/farmrpg-etl`` (sources → parse → stateful
dedup/CDC → enrich → join → sink) as idiomatic PySpark:

* batch core: every operator is a pure ``DataFrame -> DataFrame``
  function built from Catalyst-optimizable expressions
  (``farmrpg_etl_spark.operators``, ``.functions``),
* streaming shell: the same functions applied to ``readStream``
  inputs plus stateful operators (``.streaming``),
* sinks: idempotent MERGE-shaped ``foreachBatch`` writers (``.sinks``),
* LLM-data-pipeline extensions: dedup (exact/minhash/simhash/
  n-gram-jaccard/embedding-cosine), ANN similarity search, text
  analysis, multimodal binary plumbing (``.operators.dedup``,
  ``.operators.similarity``, ``.functions.text``, ``.multimodal``).

Design stance (SURVEY.md §7): DataFrame-first, explicit schemas,
no driver-side collects in operators, vectorized (Arrow) UDFs only
where built-ins genuinely cannot express the semantics (HTML parse,
stateful CDC).
"""

from farmrpg_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
