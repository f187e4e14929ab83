#!/usr/bin/env python
"""Per-stage profile of one catalog query: run it via the noop sink with
the Spark UI enabled, then dump every stage's wall time, task time, and
shuffle read/write bytes from the UI REST API — the measure-first step
of the optimization guide (§1/§7.1) in script form, since the sandbox
has no browser.

Usage: python scripts/profile_query.py <query> [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request


def _api(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from bag_parser_spark.plans.catalog import registry
    from bag_parser_spark.session import get_spark, release_cached_blocks

    spark = get_spark(
        app_name="profile-query",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4048"},
    )
    reg = registry()
    app_id = spark.sparkContext.applicationId
    for name in args.names:
        for rep in range(args.reps):
            release_cached_blocks(spark)
            jobs_before = {
                j["jobId"] for j in _api(4048, f"applications/{app_id}/jobs")
            }
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            reg[name].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            jobs = [
                j
                for j in _api(4048, f"applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before
            ]
            stage_ids = sorted(
                {s for j in jobs for s in j["stageIds"]}
            )
            stages = _api(4048, f"applications/{app_id}/stages")
            by_id = {s["stageId"]: s for s in stages}
            print(f"\n=== {name} rep{rep}: wall {wall:.3f}s, "
                  f"{len(jobs)} jobs, {len(stage_ids)} stages")
            rows = []
            for sid in stage_ids:
                s = by_id.get(sid)
                if not s or s.get("status") == "SKIPPED":
                    continue
                sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
                comp = s.get("completionTime")
                dur = "?"
                if sub and comp:
                    fmt = "%Y-%m-%dT%H:%M:%S.%f"
                    dur = round(
                        (time.mktime(time.strptime(comp[:-3], fmt))
                         + float(comp[-7:-3])
                         - time.mktime(time.strptime(sub[:-3], fmt))
                         - float(sub[-7:-3])),
                        3,
                    )
                rows.append(
                    (
                        dur if isinstance(dur, float) else 0.0,
                        f"  stage {sid}: {dur}s wall, "
                        f"{s['numCompleteTasks']} tasks, "
                        f"exec {s['executorRunTime'] / 1e3:.2f}s, "
                        f"cpu {s.get('executorCpuTime', 0) / 1e9:.2f}s, "
                        f"shRead {s.get('shuffleReadBytes', 0) >> 10}KB, "
                        f"shWrite {s.get('shuffleWriteBytes', 0) >> 10}KB | "
                        f"{s['name'].splitlines()[0][:80]}",
                    )
                )
            for _, line in sorted(rows, reverse=True):
                print(line)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
