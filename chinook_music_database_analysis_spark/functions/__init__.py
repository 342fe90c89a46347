from .compat import (
    MONEY_DEC,
    money,
    money_sum,
    round2,
    ratio2,
    revenue_expr,
    month_diff,
    day_diff,
    SQL_REVENUE,
    sql_month_diff,
    sql_day_diff,
)

__all__ = [
    "MONEY_DEC",
    "money",
    "money_sum",
    "round2",
    "ratio2",
    "revenue_expr",
    "month_diff",
    "day_diff",
    "SQL_REVENUE",
    "sql_month_diff",
    "sql_day_diff",
]
