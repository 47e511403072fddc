"""Scalar / predicate / aggregate function surface of the reference
(doradb-expr/src/{func.rs,pred.rs,expr.rs}) in Spark form."""

from xngin_spark.functions.scalar import (  # noqa: F401
    int_div,
    extract,
    substring_sql,
    case_when,
    bit_and,
    bit_or,
    bit_xor,
    bit_shl,
    bit_shr,
    bit_inv,
)
from xngin_spark.functions.predicates import (  # noqa: F401
    safe_eq,
    is_true,
    is_not_true,
    is_false,
    is_not_false,
    logical_xor,
)
from xngin_spark.functions.aggregates import (  # noqa: F401
    count_star,
    dsum,
    davg,
    dsum_expr,
    davg_expr,
)
