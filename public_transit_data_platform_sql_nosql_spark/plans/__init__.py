from .inspect import (  # noqa: F401
    broadcast_join_count,
    executed_plan,
    jobs_run,
    optimized_plan,
    plan_summary,
    pushed_filters,
    scan_read_schemas,
    sort_merge_join_count,
)
