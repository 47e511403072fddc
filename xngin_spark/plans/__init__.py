"""Logical-operator combinators — the reference's ``OpKind`` algebra
(doradb-plan/src/lgc/op.rs:162-216) as documented DataFrame builders."""

from xngin_spark.plans.builders import (  # noqa: F401
    scan,
    proj,
    filt,
    aggr,
    sort,
    limit,
    setop,
    row,
    attach_scalar,
)
from xngin_spark.plans.joins import (  # noqa: F401
    join,
    cross_join,
    semi_join,
    anti_join,
    mark_join,
    single_join,
    salted_join,
)
