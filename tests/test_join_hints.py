"""Join-strategy hints: the same logical join compiles to the hinted
physical operator — broadcast, sort-merge, or shuffled hash. At 100 TB
these hints are the manual override when statistics mislead AQE (a
"small" side that decompresses 50x, a key you know is skew-free), so a
regression that silently ignores them matters."""

import pytest

from etl_financial_report_spark.io import load_table
from etl_financial_report_spark.plans import formatted_plan

SF = "/root/testdata/sf0.001"


def _joined(spark, hint):
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    return li.join(orders.hint(hint), li.l_orderkey == orders.o_orderkey)


@pytest.mark.parametrize(
    "hint,operator",
    [
        ("broadcast", "BroadcastHashJoin"),
        ("merge", "SortMergeJoin"),
        ("shuffle_hash", "ShuffledHashJoin"),
    ],
)
def test_hint_selects_physical_join(spark, hint, operator):
    plan = formatted_plan(_joined(spark, hint))
    assert operator in plan, f"{hint} did not produce {operator}"


def test_hinted_strategies_agree_on_results(spark):
    counts = {
        hint: _joined(spark, hint).count()
        for hint in ("broadcast", "merge", "shuffle_hash")
    }
    assert len(set(counts.values())) == 1, counts
