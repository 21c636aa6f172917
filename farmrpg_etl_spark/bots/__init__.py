"""DM bot surface (SURVEY §2.9): command parse/dispatch + reply sink."""

from farmrpg_etl_spark.bots.commands import (  # noqa: F401
    claims_changes,
    dispatch_commands,
    parse_commands,
    reply_sink,
)
