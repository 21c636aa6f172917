"""Data-quality constraint checking (dbt-test / Deequ-style).

The checks every warehouse runs on every load: referential integrity,
key uniqueness, null rates, accepted ranges. Each check is a pure
aggregation/anti-join returning a violation COUNT (and the checked
population), so a suite of checks over a 100 TB table is a handful of
partial-aggregated scans — never a row-by-row validator.

Scale shape:
* FK checks are left-anti joins child→parent on the key; the parent
  key set is dimension-sized and broadcasts (or the join co-partitions
  on the FK, which big fact tables are usually already bucketed by);
* uniqueness is a groupBy count on the key (partial-agg; a duplicate
  explosion shows up as a hot key, which is exactly the pathology the
  check exists to catch);
* null/range checks are single-scan conditional counts, all fused by
  Catalyst into one pass when run through :func:`dq_summary`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fk_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Child rows whose FK has no parent — the orphan set itself (for
    quarantine), not just a count."""
    return child.join(
        F.broadcast(parent.select(F.col(parent_key).alias(child_key)).distinct()),
        child_key,
        "left_anti",
    )


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key groups violating uniqueness: ``(*keys, n)`` with n > 1."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def check_counts(
    df: DataFrame, checks: dict[str, Column]
) -> DataFrame:
    """One scan, many checks: each entry is a boolean Column marking a
    VIOLATION; output one row per check: ``(check, n_checked,
    n_violations)``. Catalyst fuses the conditional sums into a single
    pass over the table."""
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"__v_{name}")
            for name, cond in checks.items()
        ],
    )
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("check"),
                    F.col("__n").alias("n_checked"),
                    F.col(f"__v_{name}").alias("n_violations"),
                )
                for name in checks
            ]
        )
    )
    return agg.select(pairs.alias("p")).select(
        "p.check", "p.n_checked", "p.n_violations"
    )
