"""Serving & plan-inspection veneer (SURVEY §7.1 M6)."""

from walden_spark.plans.serving import (  # noqa: F401
    explain_cost,
    start_thrift_in_session,
    system_runtime,
    thrift_server_command,
)
