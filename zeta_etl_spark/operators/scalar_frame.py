"""The bounded scalar-frame cross-join, pinned as one audited primitive.

The engine's standard way to attach corpus-level scalars (totals, bounds,
high-water marks, packed codebooks) to every row is
``left.crossJoin(broadcast(tiny_frame))`` — it plans as a
BroadcastNestedLoopJoin, which is only safe because the broadcast side is
BOUNDED (usually exactly one row).  The plan census proves that invariant
globally (0 cartesians, every BNLJ a bounded scalar frame); this helper
pins it LOCALLY at every call site (VERDICT r6 next-7): the bounded side
must either be *provably* bounded from its logical plan — a global
aggregate (exactly 1 row), a LIMIT, or a literal relation — or the caller
must state the data-domain bound explicitly with ``bound=``, which makes
the invariant grep-able and reviewable at the site instead of implicit.

Policy: no raw ``crossJoin(F.broadcast(...))`` outside this module
(enforced by tests/test_scalar_frame.py's repo grep).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# operators that cannot change their child's row count upward and are
# transparent for the boundedness argument
_TRANSPARENT = ("Project", "SubqueryAlias", "Sort", "RepartitionByExpression")


def is_provably_bounded(df: DataFrame, max_limit: int = 4096) -> bool:
    """True iff the ANALYZED logical plan guarantees a bounded row count:

    - a global aggregate (``Aggregate`` with no grouping exprs → exactly
      one row),
    - ``GlobalLimit n`` with n ≤ ``max_limit``,
    - a literal relation (``LocalRelation`` / ``OneRowRelation``).

    Projections/aliases/sorts above those are transparent.  Everything else
    (scans, filters, grouped aggregates/distincts) is NOT provable — their
    row count is data-dependent."""
    plan = df._jdf.queryExecution().analyzed().toString()
    for line in plan.splitlines():
        op = line.lstrip(" :+-")
        if not op:
            continue
        if op.startswith(_TRANSPARENT):
            continue
        if op.startswith("Aggregate ["):
            # global agg renders ONE bracket group (agg exprs only);
            # grouped agg renders "Aggregate [keys], [exprs]"
            return "], [" not in op
        m = re.match(r"GlobalLimit (\d+)", op)
        if m:
            return int(m.group(1)) <= max_limit
        if op.startswith(("LocalRelation", "OneRowRelation")):
            return True
        return False
    return False


def scalar_frame_crossjoin(
    left: DataFrame, scalar_frame: DataFrame, *, bound: int | None = None
) -> DataFrame:
    """Cross-join ``left`` against a BOUNDED broadcast frame.

    ``bound`` is required when the frame is not provably bounded from its
    plan (see :func:`is_provably_bounded`); it documents the data-domain
    row bound the call site is asserting (e.g. ``bound=5`` for a distinct
    over the five event types, ``bound=10`` for the ``vec_id < 10`` query
    set).  Passing ``bound`` for a provable frame is harmless."""
    if bound is None and not is_provably_bounded(scalar_frame):
        raise ValueError(
            "scalar_frame_crossjoin: the broadcast side is not provably "
            "bounded (expected a global aggregate, LIMIT, or literal "
            "frame); pass bound=<n> to assert the data-domain row bound "
            "at the call site.\nPlan:\n"
            + scalar_frame._jdf.queryExecution().analyzed().toString()
        )
    if bound is not None and bound < 1:
        raise ValueError("bound must be >= 1")
    return left.crossJoin(F.broadcast(scalar_frame))


def with_scalar_frame(scalar_frame: DataFrame, *, bound: int | None = None):
    """Curried form of :func:`scalar_frame_crossjoin` for method chains:
    ``df.transform(with_scalar_frame(totals))`` — same contract."""

    def _apply(left: DataFrame) -> DataFrame:
        return scalar_frame_crossjoin(left, scalar_frame, bound=bound)

    return _apply
