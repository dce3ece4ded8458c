"""Physical-plan scale linter — "would this plan survive 100×?" as an API.

The repo's plan census (scripts/plan_census.py) and plan-quality tests pin
these properties for every registry query; this module packages the same
checks for USER plans, so a pipeline author can gate a new query the way
the engine gates its own:

    from zeta_etl_spark.plans.lint import lint_plan, assert_scalable
    findings = lint_plan(df)          # [Finding(severity, code, message)]
    assert_scalable(df)               # raises PlanScaleError on any "error"

Checks (each corresponds to a rule in SCALE.md "four rules"):

- ``cartesian-product`` (error): a CartesianProduct multiplies partitions;
  at 100 TB it never finishes.  The sanctioned bounded-scalar pattern
  plans as BroadcastNestedLoopJoin, not CartesianProduct.
- ``unbounded-nested-loop`` (warn): BroadcastNestedLoopJoin whose build
  side does not look bounded (no global aggregate / literal relation in
  the broadcast subtree).  The engine's own sites go through
  ``operators/scalar_frame.scalar_frame_crossjoin`` which proves
  boundedness from the LOGICAL plan; at the physical level this check is
  heuristic, hence warn not error.
- ``single-partition-over-scan`` (warn): an Exchange SinglePartition whose
  subtree reaches a file scan with no aggregate in between — a global
  sort/window over DATA-SIZED input runs in one task.  Above an aggregate
  it is the (pinned) bounded-grain pattern and is fine.
- ``row-python-udf`` (error): BatchEvalPython = row-at-a-time Python in
  the plan; the engine rule is Arrow seams only (ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas report as info).
- ``unbounded-following-frame`` (warn): a window frame whose UPPER bound
  is unboundedFollowing but whose lower bound is not unboundedPreceding
  (i.e. a shrinking frame).  Spark has no reverse running-aggregate: it
  recomputes the aggregate from scratch per row — O(n^2) per partition
  (this exact shape made skyline_orders 20.8 s at sf0.1 in round 7).
  Rewrite as a DESCENDING-order running frame
  ``rowsBetween(unboundedPreceding, -1)`` (O(n)), pre-aggregating to the
  frame's grain first if the original frame was RANGE-based.
  Whole-partition frames (unboundedPreceding, unboundedFollowing) are
  computed once and are fine.
- ``exchange-count`` (info): non-reused exchange count, the shuffle
  budget a reviewer compares against the query's partitioning story.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    severity: str  # "error" | "warn" | "info"
    code: str
    message: str


class PlanScaleError(AssertionError):
    pass


_OP_START = re.compile(r"[A-Z]")


def _indent_of(line: str) -> int:
    m = _OP_START.search(line)
    return m.start() if m else len(line)


def _subtree(lines: list[str], i: int) -> list[str]:
    """Lines of the plan subtree rooted at ``lines[i]`` (indentation-based;
    Spark's toString renders children strictly deeper)."""
    d = _indent_of(lines[i])
    out = [lines[i]]
    for ln in lines[i + 1 :]:
        if _indent_of(ln) <= d and _OP_START.search(ln):
            break
        out.append(ln)
    return out


# specifiedwindowframe(RangeFrame, 1, unboundedfollowing$()) et al. — a
# frame whose upper bound is unboundedFollowing; group(2) is the lower bound
_SHRINKING_FRAME = re.compile(
    r"specifiedwindowframe\((RangeFrame|RowFrame),\s*([^,]+),\s*"
    r"unboundedfollowing\$\(\)\)"
)

_BOUNDED_BUILD = re.compile(
    r"HashAggregate\(keys=\[\]|SortAggregate\(key=\[\]|LocalTableScan|"
    r"ReusedExchange|Subquery"
)


def lint_plan(df: DataFrame) -> list[Finding]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    findings: list[Finding] = []

    if "CartesianProduct" in plan:
        findings.append(
            Finding(
                "error",
                "cartesian-product",
                "CartesianProduct in the physical plan: partition counts "
                "multiply; use an equi-join key, a broadcast, or the "
                "bounded scalar-frame pattern",
            )
        )

    for i, ln in enumerate(lines):
        if "BroadcastNestedLoopJoin" in ln:
            sub = "\n".join(_subtree(lines, i))
            if not _BOUNDED_BUILD.search(sub):
                findings.append(
                    Finding(
                        "warn",
                        "unbounded-nested-loop",
                        "BroadcastNestedLoopJoin whose build side shows no "
                        "global aggregate/literal — if the broadcast side "
                        "is data-sized this is a hidden cross join; build "
                        "it via scalar_frame_crossjoin to prove the bound",
                    )
                )
                break

    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        sub = _subtree(lines, i)
        has_scan = any(re.search(r"Scan (parquet|json|csv|text)", s) for s in sub)
        has_agg_between = False
        for s in sub[1:]:
            if re.search(r"Scan (parquet|json|csv|text)", s):
                break
            if "HashAggregate" in s or "SortAggregate" in s or (
                "ObjectHashAggregate" in s
            ):
                has_agg_between = True
                break
        if has_scan and not has_agg_between:
            findings.append(
                Finding(
                    "warn",
                    "single-partition-over-scan",
                    "Exchange SinglePartition directly over a file scan: a "
                    "global sort/window will run one task over data-sized "
                    "input; aggregate first, or use "
                    "operators/windows.global_row_number for exact global "
                    "ranks without the single task",
                )
            )
            break

    for m in _SHRINKING_FRAME.finditer(plan):
        lower = m.group(2)
        if "unboundedpreceding" in lower:
            continue  # whole-partition frame: computed once, O(n)
        findings.append(
            Finding(
                "warn",
                "unbounded-following-frame",
                f"window frame ({m.group(1)}, lower={lower.strip()}, upper="
                "unboundedFollowing) is a SHRINKING frame: Spark recomputes "
                "the aggregate from scratch per row — O(n^2) per partition. "
                "Rewrite as a descending-order running frame "
                "rowsBetween(unboundedPreceding, -1) (pre-aggregate to the "
                "frame grain first if this was a RANGE frame)",
            )
        )
        break

    if "BatchEvalPython" in plan:
        findings.append(
            Finding(
                "error",
                "row-python-udf",
                "BatchEvalPython = row-at-a-time Python UDF in the hot "
                "path (~10-100x slower than builtins); use "
                "pyspark.sql.functions, or an Arrow seam "
                "(pandas_udf/mapInPandas) when Python is unavoidable",
            )
        )
    for arrow_op in ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        if arrow_op in plan:
            findings.append(
                Finding(
                    "info",
                    "arrow-python-seam",
                    f"{arrow_op} present — sanctioned Arrow-batched Python "
                    "seam; confirm the surrounding plan keeps the relational "
                    "work JVM-side",
                )
            )
            break

    n_ex = sum(
        1 for ln in lines if "Exchange " in ln and "Reused" not in ln
    )
    findings.append(
        Finding(
            "info",
            "exchange-count",
            f"{n_ex} non-reused exchange(s) — each is a full shuffle of "
            "its input at scale",
        )
    )
    return findings


def assert_scalable(df: DataFrame) -> list[Finding]:
    """Raise :class:`PlanScaleError` if the plan has any error-severity
    finding; return all findings otherwise (warnings included, for
    logging)."""
    findings = lint_plan(df)
    errors = [f for f in findings if f.severity == "error"]
    if errors:
        raise PlanScaleError(
            "plan fails scale lint:\n"
            + "\n".join(f"- [{f.code}] {f.message}" for f in errors)
        )
    return findings
