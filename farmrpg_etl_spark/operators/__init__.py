from farmrpg_etl_spark.operators import (
    cdc,
    dedup,
    filters,
    joins,
    latest,
    rollup,
    similarity,
)

__all__ = ["filters", "latest", "cdc", "dedup", "joins", "rollup", "similarity"]
