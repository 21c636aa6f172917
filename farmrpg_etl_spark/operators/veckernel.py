"""Arrow/numpy candidate kernels for embedding math — the vectorized
fast path behind the similarity / k-means operators.

Design: **arrow-prune + Catalyst-rescore.** The r3 plan audit showed
the remaining CPU lever is that ``F.aggregate``/``F.zip_with`` folds
are interpreted (not codegen'd), so every corpus×query / corpus×centroid
dot pays per-element eval. A pure-numpy rewrite would be fast but
numerically *different* (matmul reassociates the sum), which would risk
rounded-value mismatches against the DuckDB oracle.

Instead the kernel splits the work:

1. **Prune (this module):** an Arrow-batched ``mapInPandas`` scores a
   whole batch against the broadcast side with one ``numpy`` matmul and
   keeps only a small candidate set per batch (top ``k + slack`` under
   the final ordering, computed on the numpy scores). Map-side only —
   no shuffle, no JVM↔Python per-row cost, and the candidate set is
   thousands of rows where the full cross product is millions.
2. **Rescore (the calling operator):** the surviving candidates are
   re-scored with the *exact same Catalyst fold expressions* as the
   pure-Catalyst implementation (``functions/vectors.py``), on the
   *same* double inputs (the kernel carries the raw vector through, and
   float→double widening is exact). The final values are therefore
   bit-identical to the Catalyst-only path and hash-match the oracle.

Candidate sufficiency: the per-batch selection orders by
``(round(score, 6) desc, id asc)`` — the same key the final window
uses — so the global top-k is contained in the union of per-batch
top-k except when the numpy and fold sums (which differ by ≲ d·ulp
≈ 1e-14) straddle a 1e-6 rounding boundary; ``slack`` extra candidates
per batch absorb those knife-edge cases. numpy rounds half-even where
Spark rounds half-up, which matters only at *exact* .5e-6 midpoints —
again covered by slack, and it can only affect selection, never the
reported (Catalyst-computed) values.

At 100 TB this is the standard two-phase retrieval shape: a cheap
approximate scorer prunes, an exact scorer ranks. The broadcast side
(queries / centroids) is collected driver-side — same smallness
contract as the ``F.broadcast`` the Catalyst path already applies.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _vec_matrix(col: pd.Series, dim: int) -> np.ndarray:
    """Stack an Arrow list column into a dense float64 matrix."""
    if len(col) == 0:
        return np.empty((0, dim), dtype=np.float64)
    return np.array([np.asarray(v, dtype=np.float64) for v in col])


def topk_candidates(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    query_rows: Sequence[tuple],
    k: int,
    slack: int = 16,
) -> DataFrame:
    """Map-side top-(k+slack) candidate neighbors per query.

    ``query_rows`` is the collected (query_id, vector) list (the
    broadcast side). Returns ``(query_id, neighbor_id, __raw)`` where
    ``__raw`` is the candidate's vector widened to double — exactly
    what the caller's Catalyst rescore needs. Self-matches are masked
    out before selection so they never occupy a candidate slot.
    """
    qids = [r[0] for r in query_rows]
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in query_rows])
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    Qu = Q / qn[:, None]
    dim = Q.shape[1]

    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = (
        f"query_id {id_type}, neighbor_id {id_type}, __raw array<double>"
    )

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids = pdf[id_col].to_numpy()
            C = _vec_matrix(pdf[vec_col], dim)
            cn = np.linalg.norm(C, axis=1)
            cn[cn == 0] = 1.0
            S = (C / cn[:, None]) @ Qu.T  # (n, nq)
            R = np.round(S, 6)
            m = min(k + slack, n)
            sel_q, sel_i = [], []
            for j, qid in enumerate(qids):
                r = R[:, j].copy()
                r[ids == qid] = -np.inf  # exclude self-match
                # final ordering: rounded score desc, id asc
                order = np.lexsort((ids, -r))[:m]
                order = order[np.isfinite(r[order])]
                sel_q.extend([qid] * len(order))
                sel_i.extend(order.tolist())
            if not sel_i:
                # every candidate masked (e.g. the batch holds only the
                # query row itself) — yielding an empty frame would give
                # __raw a numeric dtype Arrow can't cast to list<double>
                continue
            raws = [C[i].tolist() for i in sel_i]
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(sel_q, dtype=pdf[id_col].dtype),
                    "neighbor_id": pd.Series(
                        ids[sel_i], dtype=pdf[id_col].dtype
                    ),
                    "__raw": pd.Series(raws, dtype=object),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(gen, out_schema)


def nearest_candidates(
    vectors: DataFrame,
    vec_col: str,
    id_col: str,
    cent_rows: Sequence[tuple],
    n_cand: int = 3,
) -> DataFrame:
    """Map-side nearest-centroid candidates for the k-means E-step.

    ``cent_rows`` is the collected (cluster, centroid-vector) list.
    Emits ``n_cand`` candidate ``(id, __raw, cluster)`` rows per input
    row — ordered by (approximate d², cluster asc), so exact-duplicate
    centroids keep their deterministic tie-break — and the caller
    rescores the fold d² on just those candidates instead of every
    centroid. Fold evaluations drop from |clusters| to ``n_cand`` per
    row; no shuffle (the E-step stays a map).
    """
    labels = [r[0] for r in cent_rows]
    M = np.array([np.asarray(r[1], dtype=np.float64) for r in cent_rows])
    # lexsort key needs a sortable numeric form of the cluster id for
    # the tie-break; the collected order index is stable and unique
    label_rank = np.argsort(np.argsort(np.array(labels, dtype=object)))
    C2 = (M * M).sum(axis=1)
    dim = M.shape[1]
    nc = min(n_cand, len(labels))

    id_type = vectors.schema[id_col].dataType.simpleString()
    cl_type = "string" if isinstance(labels[0], str) else "bigint"
    out_schema = f"{id_col} {id_type}, __raw array<double>, cluster {cl_type}"

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            V = _vec_matrix(pdf[vec_col], dim)
            # expansion form is approximate (reassociated) — prune only
            D2 = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ M.T) + C2[None, :]
            ids, raws, cls = [], [], []
            for i in range(n):
                order = np.lexsort((label_rank, D2[i]))[:nc]
                v = V[i].tolist()
                for o in order:
                    ids.append(pdf[id_col].iloc[i])
                    raws.append(v)
                    cls.append(labels[o])
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "__raw": pd.Series(raws, dtype=object),
                    "cluster": cls,
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(gen, out_schema)
