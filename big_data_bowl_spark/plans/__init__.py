from .inspect import (
    assert_broadcast_join,
    assert_pushed_filters,
    count_exchanges,
    executed_plan,
    explain_formatted,
)

__all__ = [
    "assert_broadcast_join", "assert_pushed_filters", "count_exchanges",
    "executed_plan", "explain_formatted",
]
