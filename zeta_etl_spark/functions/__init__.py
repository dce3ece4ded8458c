from zeta_etl_spark.functions.deterministic import (
    dec_avg,
    dec_sum,
    dec_sum_expr,
    round6,
    safe_div,
)

__all__ = ["dec_sum", "dec_avg", "dec_sum_expr", "round6", "safe_div"]
