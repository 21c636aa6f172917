"""Lineage control for iterative operators (connected components,
Lloyd's k-means).

An iterative DataFrame loop doubles its plan tree every round (each
round's join references the whole previous plan), so task binaries and
driver planning time balloon — rounds must be cut off from their
history. ``localCheckpoint`` does that but truncates lineage into
EXECUTOR-LOCAL storage: after an executor loss the blocks are
unrecoverable and the job FAILS (it does not recompute), and the
checkpointed blocks of earlier rounds are only freed when the driver
GC eventually drops their RDD references.

:func:`truncate_lineage` instead uses the RELIABLE ``checkpoint()``
(durable files under the context's checkpoint dir, survivable across
executor loss) with an explicit persist/unpersist bracket so the
round is computed ONCE (the eager-checkpoint count populates the
cache; the checkpoint-write job reads it back instead of recomputing
the plan) and its memory blocks are freed deterministically before
the next round. On a real cluster, point
``sc.setCheckpointDir("hdfs://...")`` at durable storage before
calling the iterative operators; when unset, a local temp dir is used
(correct on local[N], where "executor loss" is process death anyway).
"""

from __future__ import annotations


from farmrpg_etl_spark.scratch import scratch_dir
from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Return ``df`` recomputed-once, lineage-flat, and durable: the
    returned frame scans the reliable checkpoint files, not the plan
    that produced them. Memory cost is transient (persist is released
    before returning); disk cost is one small per-round table."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(scratch_dir("ckpt"))
    cached = df.persist()
    out = cached.checkpoint()  # eager: fills the cache, then writes from it
    cached.unpersist()
    return out
