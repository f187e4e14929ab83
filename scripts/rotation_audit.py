#!/usr/bin/env python
"""Rotation-debt audit (VERDICT r9 #8): which catalog queries' latest
green driver CORRECTNESS row is stale?

Each round the correctness driver records the FIRST ~50 keys of
``queries()`` — so evidence ages: a query validated in round 5 and never
re-rotated carries 4-round-old evidence by round 9 even if its code is
byte-identical. Until now the "which cohort is oldest" analysis was done
by the judge each round; this script automates it from the in-repo
``CORRECTNESS_r*.json`` archives so the builder can pack
``_DRIVER_PRIORITY`` without being told.

Usage::

    python scripts/rotation_audit.py [--stale-after N] [--current-round R]

Prints one line per registered catalog query that has EITHER no green
row at all (never validated — highest priority) or whose latest green is
>= N rounds older than the current round (default N=4; current round
defaults to 1 + the highest archived round, i.e. "the round being
built"). Green = err is null AND rows_match AND schema_match AND
(hash_match OR the round recorded a rows-only check, hash_match null).
A non-green row never counts as evidence. Exit code 0 always — this is
an advisory report, not a gate (the ordering-contract test in
tests/test_catalog_oracle.py is the gate for rewritten/new queries).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _row_green(row: dict) -> bool:
    if row.get("err") is not None:
        return False
    if not (row.get("rows_match") and row.get("schema_match")):
        return False
    hm = row.get("hash_match")
    return hm is None or bool(hm)


def latest_green_rounds(
    repo: str = REPO, max_round: int | None = None
) -> dict[str, int]:
    """Map query name -> highest round number with a green driver row.
    ``max_round`` (inclusive) freezes the view as of that round:
    archives from later rounds are ignored. The archive set GROWS every
    round (the driver drops ``CORRECTNESS_r{N}.json`` into the tree
    after the builder's last commit), so any caller pinning facts about
    a specific round's state must pass the cutoff — an uncut read is
    only valid for "current state" questions (VERDICT r10 #1)."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if isinstance(row, dict) and _row_green(row):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def stale_cohort(
    stale_after: int = 4,
    current_round: int | None = None,
    max_round: int | None = None,
) -> tuple[int, list[tuple[str, int | None]]]:
    """Return (current_round, [(name, latest_green_round_or_None), ...])
    sorted oldest-first then by name; None (never validated) sorts
    first. When ``current_round`` is given and ``max_round`` is not,
    archives from ``current_round`` onward are excluded automatically —
    "what was stale entering round N" must not be answered with round
    N's own rows (the driver may already have landed them)."""
    sys.path.insert(0, REPO)
    from bag_parser_spark.plans.catalog import queries

    if max_round is None and current_round is not None:
        max_round = current_round - 1
    latest = latest_green_rounds(max_round=max_round)
    if current_round is None:
        current_round = (max(latest.values()) if latest else 0) + 1
    rows: list[tuple[str, int | None]] = []
    for name in queries():
        got = latest.get(name)
        if got is None or current_round - got >= stale_after:
            rows.append((name, got))
    rows.sort(key=lambda t: (t[1] is not None, t[1] or 0, t[0]))
    return current_round, rows


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--stale-after", type=int, default=4)
    ap.add_argument("--current-round", type=int, default=None)
    args = ap.parse_args()
    current, rows = stale_cohort(args.stale_after, args.current_round)
    print(
        f"# round {current}: {len(rows)} queries never-validated or with "
        f"latest green >= {args.stale_after} rounds old"
    )
    for name, rnd in rows:
        tag = "NEVER" if rnd is None else f"r{rnd} ({current - rnd} old)"
        print(f"{name}\t{tag}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
