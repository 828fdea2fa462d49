"""Plan inspection utilities: verify pushdown/broadcast/shuffle shape."""

from log2sql_spark.plans.explain import (  # noqa: F401
    broadcast_join_count,
    explain_str,
    pushed_filters,
    shuffle_count,
    whole_stage_codegen_ids,
)
