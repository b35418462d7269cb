from devcontainers_etl_node_spark.plans.inspect import (
    assert_no_nested_loop,
    physical_plan,
    plan_profile,
    unpartitioned_windows,
)

__all__ = [
    "physical_plan",
    "plan_profile",
    "assert_no_nested_loop",
    "unpartitioned_windows",
]
