"""Automated physical-plan regression gate over ALL queries() entries.

tools/explain_report.py pins ~190 hand-audited plans with per-query
fragment expectations; this sweep is the coarse automated complement
(VERDICT r4 task 5): it builds EVERY ``__spark_entry__.queries()`` plan
(stream_* replays excluded — their builders execute streaming jobs; they
are plan-audited in tests/test_streaming.py instead) and asserts three
scale invariants no query may violate:

1. **No CartesianProduct.**  Every cross join in the engine is a
   broadcast 1-row/constant attachment (BroadcastNestedLoopJoin) or a
   keyed join; a real CartesianProduct means a corpus x corpus blowup.

2. **Single-partition exchanges only over reduced subtrees.**  An
   ``Exchange SinglePartition`` is legitimate only when its subtree has
   already been reduced below corpus scale — an aggregation
   (HashAggregate/ObjectHashAggregate/SortAggregate), a
   limit/TakeOrdered, or a row-generating leaf (scan of a driver-side
   literal table).  A single-partition exchange whose subtree goes
   straight to a fact-table scan is the "whole corpus through one task"
   anti-pattern (the WindowExec hazard the round-5 two-phase cumsum work
   removed).

3. **lang/date predicates reach the parquet scan.**  A Filter node
   sitting DIRECTLY on a fact-table scan with a ``lang =`` / date
   comparison that does not also appear in the scan's PushedFilters
   means pushdown broke (non-deterministic wrappers, UDF in the
   predicate, ...).

Usage:
    python tools/plan_sweep.py [sf_dir] [query ...]

Exit 1 when any query violates an invariant.  The per-round summary is
appended to PLANS.md by hand (see "Automated plan sweep" section there).
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

FACT_TABLES = ("documents", "events", "lineitem", "orders", "embeddings")

#: operators that certify their subtree is already reduced below corpus
#: scale by the time rows reach a single-partition exchange
REDUCERS = (
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
    "LocalTableScan",  # driver-side literal table
    "Scan OneRowRelation",
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class Node:
    __slots__ = ("label", "depth", "children")

    def __init__(self, label: str, depth: int):
        self.label = label
        self.depth = depth
        self.children: list[Node] = []

    def walk(self):
        yield self
        for c in self.children:
            yield from c.walk()


_TREE_RE = re.compile(r"^([ :+\-*]*)(\(?\d*\)?\s*)?([A-Za-z].*)$")


def parse_tree(plan: str) -> list[Node]:
    """Parse the indented operator tree at the top of explain("formatted").

    Returns the roots (the main plan plus any subqueries).  Depth is the
    character offset of the operator name; a node's parent is the
    nearest preceding node with smaller depth."""
    roots: list[Node] = []
    stack: list[Node] = []
    for line in plan.splitlines():
        if not line.strip():
            break  # the tree section ends at the first blank line
        m = _TREE_RE.match(line)
        if not m:
            continue
        prefix = m.group(1) or ""
        label = m.group(3).strip()
        depth = len(prefix)
        node = Node(label, depth)
        while stack and stack[-1].depth >= depth:
            stack.pop()
        if stack:
            stack[-1].children.append(node)
        else:
            roots.append(node)
        stack.append(node)
    return roots


def detail_blocks(plan: str) -> dict[str, str]:
    """Map "(id) OperatorName" detail blocks of the formatted output."""
    out: dict[str, str] = {}
    cur_key, cur_lines = None, []
    for line in plan.splitlines():
        m = re.match(r"^\((\d+)\)\s+(\S.*)$", line)
        if m:
            if cur_key is not None:
                out[cur_key] = "\n".join(cur_lines)
            cur_key, cur_lines = m.group(1), [line]
        elif cur_key is not None:
            cur_lines.append(line)
    if cur_key is not None:
        out[cur_key] = "\n".join(cur_lines)
    return out


def _node_id(node: Node) -> str | None:
    m = re.search(r"\((\d+)\)\s*$", node.label)
    return m.group(1) if m else None


def _is_fact_scan(node: Node, details: dict[str, str]) -> bool:
    if "Scan parquet" not in node.label and "FileScan" not in node.label:
        return False
    nid = _node_id(node)
    blob = node.label + (details.get(nid, "") if nid else "")
    return any(f"{t}.parquet" in blob or f"/{t}" in blob
               for t in FACT_TABLES)


def subtree_is_reduced(node: Node, details: dict[str, str]) -> bool:
    """True iff every leaf-ward path below ``node`` passes a reducer
    before reaching a fact-table file scan."""
    return all(_path_reduced(c, details) for c in node.children)


def _path_reduced(node: Node, details: dict[str, str]) -> bool:
    if any(r in node.label for r in REDUCERS):
        return True
    if "Scan parquet" in node.label or "FileScan" in node.label:
        # an un-reduced path hit a scan; only a hazard for fact tables
        return not _is_fact_scan(node, details)
    if not node.children:
        return True
    return all(_path_reduced(c, details) for c in node.children)


def check_plan(name: str, plan: str) -> list[str]:
    problems: list[str] = []
    if "CartesianProduct" in plan:
        problems.append("CartesianProduct in plan")
    roots = parse_tree(plan)
    details = detail_blocks(plan)
    for root in roots:
        for node in root.walk():
            if "Exchange" not in node.label:
                continue
            nid = _node_id(node)
            ndetail = details.get(nid, "") if nid else ""
            if "SinglePartition" not in node.label + ndetail:
                continue
            if not subtree_is_reduced(node, details):
                problems.append(
                    "Exchange SinglePartition over un-reduced "
                    "fact-table subtree"
                )
    # filter-pushdown check: a Filter above a fact scan whose lang
    # equality is missing from the scan's PushedFilters
    for root in roots:
        for node in root.walk():
            if "Filter" not in node.label:
                continue
            fid = _node_id(node)
            fdetail = details.get(fid, "") if fid else ""
            if not re.search(r"lang#?\d*\s*=", fdetail):
                continue
            # a lang equality INSIDE a CASE WHEN (per-language sampling
            # rates, mixture weights) is a row-local computation, not a
            # pushable selectivity predicate — only flag bare conjuncts
            if "CASE WHEN" in fdetail:
                continue
            for sn in node.walk():
                if not _is_fact_scan(sn, details):
                    continue
                sid = _node_id(sn)
                sdetail = details.get(sid, "") if sid else ""
                if "PushedFilters" in sdetail and (
                    "lang" not in sdetail
                    .split("PushedFilters", 1)[1].split("]", 1)[0]
                ):
                    problems.append(
                        "lang equality filtered above scan but missing "
                        "from PushedFilters"
                    )
    return sorted(set(problems))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from sparkmedkg import streaming
    from sparkmedkg.session import get_spark

    spark = get_spark(
        "plan_sweep", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    flagged: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    n_checked = n_skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in streaming.REPLAY_RESULT_SCHEMAS:
            n_skipped += 1
            continue  # builder executes a streaming job; audited in tests
        try:
            plan = plan_of(fn(spark, sf_dir))
        except Exception as e:
            errs[name] = repr(e)[:200]
            continue
        n_checked += 1
        problems = check_plan(name, plan)
        if problems:
            flagged[name] = problems
            print(f"FLAG  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}")
    print()
    print(
        f"checked {n_checked} plans, skipped {n_skipped} stream replays,"
        f" {len(errs)} build errors, {len(flagged)} flagged"
    )
    if errs:
        print(f"ERRORS: {errs}")
    if flagged:
        print(f"FLAGGED: {sorted(flagged)}")
    return 1 if (flagged or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
