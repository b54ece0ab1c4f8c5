"""Dump per-query formatted plans for a round's before/after evidence.

Usage: python tools/dump_round_plans.py OUTDIR SUFFIX name [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt with `.explain("formatted")` output.
Unlike tools/dump_plans.py (which disables the memo layer to audit the
raw build plans), this dumps the EXECUTED shape — memoized/persisted
artifacts appear as their checkpoint/store scans, exactly what the bench
session runs — because optimization evidence is about the executed plan.
A header records the memo mode so a reader can't confuse the two.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_financial_report_spark import registry  # noqa: E402
from etl_financial_report_spark.plans import formatted_plan  # noqa: E402
from etl_financial_report_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-round-plans")
    spark.sparkContext.setLogLevel("ERROR")
    all_q = registry.all_queries()
    for name in names:
        df = all_q[name].fn(spark, sf_dir)
        plan = formatted_plan(df)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} — {suffix} (executed shape: memo/store layer ON;"
                " checkpointed/persisted artifacts appear as RDD/parquet scans)\n"
            )
            f.write(plan)
        print(path, flush=True)


if __name__ == "__main__":
    main()
