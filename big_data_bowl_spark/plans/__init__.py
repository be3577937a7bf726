from .inspect import (
    assert_broadcast_join,
    assert_pushed_filters,
    count_exchanges,
    executed_plan,
    explain_formatted,
)
from .lint import assert_clean_plan, lint_plan

__all__ = [
    "assert_broadcast_join", "assert_pushed_filters", "assert_clean_plan",
    "count_exchanges", "executed_plan", "explain_formatted", "lint_plan",
]
