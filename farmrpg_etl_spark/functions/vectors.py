"""Vector math over array<float|double> columns — pure Catalyst
expressions (F.zip_with / F.aggregate), no UDFs, so similarity search
stays JVM-side and codegen'd.

Float discipline: inputs are cast to double *before* any arithmetic
and public outputs are rounded, so results are reproducible across
engines (the DuckDB oracle does the same)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def dist2(a: Column, b: Column) -> Column:
    """Squared L2 distance as a left fold over (aᵢ-bᵢ)² — the same
    association order as an explicit SQL term chain, so results are
    bit-identical to the DuckDB oracle."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d == 0, F.lit(0.0)).otherwise(dot(a, b) / d)


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    return F.round(cosine(as_double(a), as_double(b)), digits)
