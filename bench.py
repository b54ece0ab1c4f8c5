"""Benchmark harness (driver contract): run every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <scale factor>}

Each query is fully materialized through the noop sink (count() would
let column pruning skip the expensive expressions). Timings are
per-query wall clock after a shared session warm-up.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_financial_report_spark import registry  # noqa: E402
from etl_financial_report_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: touch every table once so first-query timing excludes
    # file-listing/footer-read noise that a long-lived cluster never sees
    from etl_financial_report_spark.io import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, q in sorted(registry.all_queries().items()):
        t0 = time.perf_counter()
        try:
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # one bad query must not zero out the artifact
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            continue
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "full_query_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        result["errors"] = errors
    # Full per-query record -> disk (BENCH.json). The driver captures only
    # the LAST ~2000 chars of stdout, so the full 147-query JSON line got
    # truncated mid-line in round 1 ("parsed": null). stdout now carries a
    # single compact line guaranteed to fit in the captured tail: the same
    # contract shape, with the per-query dict trimmed to the slowest
    # queries (the full dict is in BENCH.json alongside this script).
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH.json"), "w") as f:
        json.dump(result, f, indent=1)
    keep = sorted(timings.items(), key=lambda kv: -kv[1])
    n_slowest = 25
    while n_slowest > 0:
        compact = dict(result)
        compact.pop("errors", None)
        compact["queries"] = dict(sorted(keep[:n_slowest]))
        compact["n_queries"] = len(timings)
        compact["n_errors"] = len(errors)
        compact["queries_full"] = "BENCH.json"
        line = json.dumps(compact)
        if len(line) <= 1800:
            break
        n_slowest -= 5
    sys.stdout.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
