"""Structured Streaming layer (SURVEY.md §2 D1/D2 streaming forms).

The batch operators in ``farmrpg_etl_spark.operators`` are pure
DataFrame→DataFrame functions; this package applies the same
semantics to ``readStream`` inputs:

* :func:`ops.stream_events` — file-stream source over the testdata
  parquet (stands in for the reference's poll loops, SURVEY §2.1).
* :func:`ops.streaming_dedup` — D2: watermark-bounded
  ``dropDuplicates`` (the FIFO seen-cache, reference
  scrapers/mailbox.py:101,108-110).
* :func:`ops.streaming_latest_per_key` — A1/D4 base: streaming
  ``max(struct(...))`` aggregation per key.
* :func:`ops.streaming_cdc` — D1 true form: per-key state via
  ``applyInPandasWithState`` emitting only new-or-changed rows
  (reference scrapers/chat.py:158-171).
"""

from farmrpg_etl_spark.streaming import ops

__all__ = ["ops"]
