"""Runtime-honest physical-plan statistics.

``executedPlan().toString()`` inlines every ``InMemoryRelation``'s build
subtree into EVERY reference, so naive operator counts over the plan
string overstate what actually runs: at runtime the CacheManager builds
each distinct cached relation ONCE and every other reference reads its
blocks through ``InMemoryTableScan``. The r5 plan audit documented this
as a caveat (static 60 exchanges for ``dedup_verified_pairs`` vs ~10
executed); this module computes the honest number instead (VERDICT r5
#6): exchanges OUTSIDE any cached subtree, plus each DISTINCT cached
build subtree counted once.

Cached-relation identity: two references to the same cache print the
same subtree modulo expression ids (``#123``), which Spark re-aliases
per reference — so subtrees are compared with exprIds stripped.
"""

from __future__ import annotations

import re

_EXCHANGE_RE = re.compile(r"Exchange (?:hash|range|Single)")
_NODE_START_RE = re.compile(r"[*\w]")


def _depth(line: str) -> int:
    """Column where the node text starts (tree-drawing prefix length)."""
    m = _NODE_START_RE.search(line)
    return m.start() if m else len(line)


def _normalize(text: str) -> str:
    """Reference-invariant form of a cached subtree: drop the per-line
    tree-drawing prefix (references sit at different depths, keeping only
    RELATIVE depth), expression ids (re-aliased per reference), codegen
    region ids, and AQE plan ids."""
    lines = text.splitlines()
    depths = [_depth(ln) for ln in lines if ln.strip()]
    base = min(depths) if depths else 0
    out = []
    for ln in lines:
        if not ln.strip():
            continue
        d = _depth(ln)
        body = ln[d:]
        body = re.sub(r"#\d+", "#", body)
        body = re.sub(r"\*\(\d+\)", "*(n)", body)
        body = re.sub(r"plan_id=\d+", "plan_id=n", body)
        out.append(f"{d - base}|{body}")
    return "\n".join(out)


def runtime_plan_stats(plan: str) -> dict:
    """Parse an ``executedPlan().toString()`` tree and return

    - ``cached_refs``: InMemoryRelation reference count (inlined copies)
    - ``cached_distinct``: distinct cached relations (what actually builds)
    - ``runtime_exchanges``: shuffles outside cached subtrees + shuffles
      of each distinct cached build subtree counted ONCE
    - ``static_exchanges``: the naive whole-string count, for comparison
    """
    refs = {"n": 0}
    # normalized body -> raw body; global across nesting levels so a
    # relation referenced both top-level and inside another cached
    # subtree still builds (and counts) once
    distinct: dict[str, str] = {}

    def scan(lines: list[str]) -> int:
        """Exchanges outside cached subtrees; registers subtrees found."""
        outside = 0
        i = 0
        while i < len(lines):
            line = lines[i]
            d = _depth(line)
            if "InMemoryRelation" in line[d:]:
                refs["n"] += 1
                j = i + 1
                while j < len(lines) and _depth(lines[j]) > d:
                    j += 1
                body = "\n".join(lines[i + 1 : j])
                distinct.setdefault(_normalize(body), body)
                i = j
                continue
            outside += len(_EXCHANGE_RE.findall(line))
            i += 1
        return outside

    runtime = scan(plan.splitlines())
    # each distinct cached relation builds once; its subtree may itself
    # reference other cached relations (recurse — the dict grows until
    # every transitively-referenced relation is registered once)
    done: set[str] = set()
    while True:
        todo = [k for k in distinct if k not in done]
        if not todo:
            break
        for k in todo:
            done.add(k)
            runtime += scan(distinct[k].splitlines())
    return {
        "cached_refs": refs["n"],
        "cached_distinct": len(distinct),
        "runtime_exchanges": runtime,
        "static_exchanges": len(_EXCHANGE_RE.findall(plan)),
    }
