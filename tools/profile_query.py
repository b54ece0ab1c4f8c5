"""Per-query time breakdown: DataFrame construction (pure driver),
Catalyst analysis+optimization+physical planning (driver), and execution
(noop sink), plus job/stage counts from the status tracker.

Usage: python tools/profile_query.py [--sf-dir DIR] [--runs N] name [name ...]
       python tools/profile_query.py --all --runs 1   # whole registry

The split tells you which lever matters for a query at bench scale:
a query spending 0.4 of its 0.6 s in planning needs a smaller plan
(guide §3.3: materialise intermediates / fewer CTE re-expansions), not a
better shuffle; one spending it in execution with 40 tiny stages needs
fewer jobs (guide §2.4).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_financial_report_spark import registry  # noqa: E402
from etl_financial_report_spark.session import get_spark  # noqa: E402


def profile_one(spark, name: str, fn, sf_dir: str) -> dict:
    # setJobGroup (not just setJobDescription) so the job count is the
    # delta of THIS group, not of all ungrouped jobs (ADVICE r14). Jobs
    # fired during DataFrame construction (eager localCheckpoints) are
    # deliberately inside the group: they belong to the query's cost.
    tracker = spark.sparkContext.statusTracker()
    group = f"profile:{name}:{time.monotonic_ns()}"
    spark.sparkContext.setJobGroup(group, f"profile {name}")
    try:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        jobs_construct = len(tracker.getJobIdsForGroup(group) or [])
        # Force full Catalyst pipeline (analysis -> optimization -> physical
        # planning) without executing: executedPlan is computed lazily.
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        jobs_total = len(tracker.getJobIdsForGroup(group) or [])
    finally:
        spark.sparkContext.setJobGroup(None, None)
    return {
        "construct_s": round(t1 - t0, 3),
        "plan_s": round(t2 - t1, 3),
        "exec_s": round(t3 - t2, 3),
        "total_s": round(t3 - t0, 3),
        "n_jobs": jobs_total,
        "n_jobs_construct": jobs_construct,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="*")
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--all", action="store_true")
    args = p.parse_args()

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    all_q = registry.all_queries()
    names = sorted(all_q) if args.all else args.names
    out: dict[str, list[dict]] = {}
    for name in names:
        if name not in all_q:
            print(f"unknown query {name!r}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        runs = []
        for _ in range(args.runs):
            runs.append(profile_one(spark, name, all_q[name].fn, args.sf_dir))
        out[name] = runs
        print(name, json.dumps(runs), flush=True)
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
