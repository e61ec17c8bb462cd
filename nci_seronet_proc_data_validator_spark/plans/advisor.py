"""Scale-hazard advisor: rules that flag plans and invocations which pass
correctness at test scale but collapse at 100 TB.

Two kinds of rule live here:

1. **Plan rules** (``advise_plan``) — inspect a DataFrame's optimized
   physical plan for shapes that are quadratic or single-task by
   construction: cartesian products, nested-loop joins, unpartitioned
   ordered windows. These are the hazards a 60k-row test never feels and
   a 1000-executor cluster dies on.
2. **Invocation rules** (``warn_fixed_k``) — parameter combinations whose
   cost model goes superlinear on unbounded input. The motivating case is
   SemDeDup with a pinned cluster count: within-cluster pairing is
   O(N²/k), so a compile-time ``k`` over an input with no declared row
   bound is a quadratic time bomb (measured ×13.4/decade at sf1 vs
   ×3.6/decade for auto-k — BENCH_NOTES r8). The reference has no vector
   surface; the analogous reference behavior is its hard-coded per-sheet
   assumptions that only hold at Lambda-batch granularity
   (nci-seronet-data-validator.py:152-159).

Rules warn (``ScaleHazardWarning``) rather than raise: test fixtures and
oracle-pinned callers legitimately use the hazardous forms at known-small
scale, and they silence the rule by DECLARING the bound (``max_rows=``)
instead of suppressing the warning class.
"""

from __future__ import annotations

import re
import warnings

from pyspark.sql import DataFrame

__all__ = ["ScaleHazardWarning", "advise_plan", "warn_fixed_k",
           "PAIR_BUDGET"]


class ScaleHazardWarning(UserWarning):
    """An invocation or plan shape that is correct at test scale but
    superlinear / single-task at production scale."""


#: Within-cluster candidate-pair budget above which a DECLARED bound still
#: warns: N^2/k pairs at ~100 bytes of shuffled key+vector state each is
#: ~200 GB of pair traffic at 2e9 — roughly where one skewed cluster stops
#: fitting a single executor's scratch space even with AQE skew-split.
PAIR_BUDGET = 2_000_000_000


def warn_fixed_k(op: str, k: int | None, max_rows: int | None,
                 pair_budget: int = PAIR_BUDGET) -> str | None:
    """Invocation rule: pinned cluster count over unbounded input.

    - ``k`` fixed (not None) and no declared row bound → warn: pairing is
      O(N²/k) with a compile-time denominator; the caller should either
      use the auto-k form (``k=None``, k = max(8, isqrt(N)), O(N^1.5)) or
      declare the bound they are relying on via ``max_rows=``.
    - ``k`` fixed with a declared bound → warn only when the implied pair
      count ``max_rows²/k`` exceeds ``pair_budget`` (the bound makes the
      cost computable, so compute it).
    - ``k=None`` (auto-scaled) → no hazard.

    Returns the warning message (also emitted via ``warnings.warn``) or
    None when the invocation is clean — callers and tests can assert on
    the return value without a ``pytest.warns`` block.
    """
    if k is None or k < 1:     # k < 1 is invalid; the operator raises
        return None
    if max_rows is None:
        msg = (f"{op}: fixed k={k} over an input with no declared row "
               f"bound — within-cluster pairing is O(N^2/{k}) and grows "
               f"quadratically with the corpus (measured x13.4/decade vs "
               f"x3.6 for auto-k; BENCH_NOTES r8). Use k=None to scale k "
               f"with the corpus, or declare the bound you rely on with "
               f"max_rows=.")
        warnings.warn(msg, ScaleHazardWarning, stacklevel=3)
        return msg
    pairs = max_rows * max_rows // max(k, 1)
    if pairs > pair_budget:
        msg = (f"{op}: fixed k={k} at declared max_rows={max_rows} "
               f"implies ~{pairs:.2e} candidate pairs "
               f"(budget {pair_budget:.0e}) — raise k, use k=None, or "
               f"pre-partition the corpus.")
        warnings.warn(msg, ScaleHazardWarning, stacklevel=3)
        return msg
    return None


# -- plan rules ------------------------------------------------------------

_WINDOW_RE = re.compile(r"\bWindow\b")


def _bracket_groups(line: str) -> list[str]:
    """Top-level ``[...]`` groups of a plan line (nested brackets folded)."""
    groups, depth, start = [], 0, -1
    for i, ch in enumerate(line):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(line[start + 1:i])
    return groups


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


_SINGLE_ROW_RE = re.compile(
    r"(?:HashAggregate|SortAggregate|ObjectHashAggregate)"
    r"\((?:keys|key)=\[\]"          # global aggregate → exactly one row
    r"|GlobalLimit 1[,\s)]")        # LIMIT 1


def _nested_loop_hazards(df: DataFrame) -> list[str]:
    """Flag ``BroadcastNestedLoopJoin`` nodes UNLESS one side is provably
    single-row (a global aggregate or LIMIT 1 subtree) — the
    scalar-subquery pattern (join a 1-row threshold/total against every
    row) is the one legitimate BNLJ at scale: the "nested loop" is one
    probe per stream row. Everything else is O(|stream| × |broadcast|)
    comparisons and flagged."""
    hazards: list[str] = []
    stack = [df._jdf.queryExecution().executedPlan()]  # noqa: SLF001
    while stack:
        node = stack.pop()
        if "AdaptiveSparkPlan" in node.nodeName():
            # AQE's wrapper is a LEAF node (children() is empty) holding
            # the real tree in a field — without piercing it the whole
            # traversal is vacuous.
            try:
                stack.append(node.executedPlan())
            except Exception:      # pre-execution: fall back
                stack.append(node.initialPlan())
            continue
        ch = node.children()
        kids = [ch.apply(i) for i in range(ch.size())]
        if "BroadcastNestedLoopJoin" in node.nodeName():
            # Judge the BROADCAST side only (the child rooted at a
            # BroadcastExchange): a global aggregate buried in the STREAM
            # side (e.g. an earlier scalar-subquery enrichment) must not
            # whitelist a multi-row broadcast side.
            bcast = [k for k in kids
                     if "BroadcastExchange" in k.nodeName()
                     or "BroadcastQueryStage" in k.nodeName()]
            judged = bcast or kids
            benign = any(_SINGLE_ROW_RE.search(k.toString()) for k in judged)
            if not benign:
                hazards.append(
                    "nested-loop-join: BroadcastNestedLoopJoin with a "
                    "multi-row broadcast side — every stream row scans "
                    "the full broadcast side. Add an equi-key, or band/"
                    "block the condition (operators/interval, "
                    "operators/linkage).")
        stack.extend(kids)
    return hazards


def advise_plan(df: DataFrame, warn: bool = True) -> list[str]:
    """Scan ``df``'s physical plan for scale hazards; return the list of
    hazard messages (empty = clean). With ``warn=True`` each is also
    emitted as a ``ScaleHazardWarning``.

    Rules:

    - **cartesian-product** — ``CartesianProduct`` in the plan: O(|L|·|R|)
      rows materialized; at 100 TB this never finishes. Usually a missing
      join key or a non-equi condition that should be banded/blocked
      (see ``operators/interval``, ``operators/linkage``).
    - **nested-loop-join** — ``BroadcastNestedLoopJoin``: every stream row
      scans the whole broadcast side; tolerable only when the broadcast
      side is O(1) rows.
    - **global-ordered-window** — a ``Window`` with an ORDER BY but no
      PARTITION BY: Spark routes ALL rows through a single task
      (one ``Exchange SinglePartition``). Fine for a final top-k style
      presentation; fatal mid-pipeline. Detection mirrors
      tests/test_plan_shape.py: a partitioned window prints 3 top-level
      bracket groups; a global ordered one prints 2 with ASC/DESC in the
      trailing group.
    """
    if df.isStreaming:
        # no executed plan exists before a sink starts the query; the
        # batch twin of the same transformation is the auditable form
        return []
    plan = _plan_string(df)
    hazards: list[str] = []
    if "CartesianProduct" in plan:
        hazards.append(
            "cartesian-product: CartesianProduct in plan — O(|L|*|R|) "
            "rows; add an equi-key or band/block the condition.")
    hazards.extend(_nested_loop_hazards(df))
    for line in plan.splitlines():
        if not _WINDOW_RE.search(line):
            continue
        groups = _bracket_groups(line)
        if len(groups) == 2 and re.search(r"\b(ASC|DESC)\b", groups[-1]):
            hazards.append(
                "global-ordered-window: Window with ORDER BY and no "
                "PARTITION BY — all rows through one task "
                f"({line.strip()[:100]}). Partition the window or use a "
                "two-level (per-partition then merge) form.")
            break
    if warn:
        for h in hazards:
            warnings.warn(h, ScaleHazardWarning, stacklevel=2)
    return hazards
