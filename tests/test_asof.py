"""Property test for the as-of join (operators/asof.py): the union +
keyed-window carry-forward implementation must agree with a naive
per-row scan on arbitrary (key, ts) inputs, including ties and keys with
no right-side rows at all."""

import pytest
import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_financial_report_spark.operators.asof import asof_join

BASE = dt.datetime(2024, 1, 1)

# small key/time domains force collisions: same-ts ties, shared keys
_row = st.tuples(st.integers(0, 3), st.integers(0, 20))  # (key, minute offset)


def _naive_asof(left_rows, right_rows):
    out = {}
    for i, (lk, lt) in enumerate(left_rows):
        best = None
        for rk, rt in right_rows:
            if rk == lk and rt <= lt and (best is None or rt > best):
                best = rt
        out[i] = best
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(_row, min_size=1, max_size=12),
    right=st.lists(_row, min_size=0, max_size=12),
)
@pytest.mark.slow  # opt-in (driver test budget, optimization r15)
def test_asof_join_matches_naive(spark, left, right):
    to_ts = lambda m: BASE + dt.timedelta(minutes=m)
    left_df = spark.createDataFrame(
        [(i, k, to_ts(m)) for i, (k, m) in enumerate(left)], "row_id long, user_id long, ts timestamp"
    )
    # right side unique per (key, ts) — the operator's documented contract
    right_uniq = {(k, m) for k, m in right}
    right_df = spark.createDataFrame(
        [(k, to_ts(m), k * 1000 + m) for k, m in sorted(right_uniq)],
        "user_id long, ts timestamp, click_id long",
    )
    got = {
        r.row_id: r.asof_ts
        for r in asof_join(left_df, right_df, on="user_id", right_cols=("click_id",)).collect()
    }
    want = {i: (to_ts(m) if m is not None else None) for i, m in _naive_asof(left, [(k, m) for k, m in right_uniq]).items()}
    assert got == want
