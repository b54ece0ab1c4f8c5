"""The entire cosine family's oracle parity rests on one numeric claim:
for quantized components |q| <= QUANT_SCALE * 3 (~2^15), every product and
every 64-dim dot product is below 2^53, so a float64 BLAS matmul computes
the EXACT integer dot product (cosine_pairs' docstring argument). This
pins the claim with adversarial integer vectors — including the extreme
corners — against arbitrary-precision Python ints. No Spark needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_financial_report_spark.functions.vectors import QUANT_SCALE

DIM = 64
#: quantized components for unit-ish embeddings stay within a few scales
BOUND = 3 * QUANT_SCALE

_vec = st.lists(st.integers(min_value=-BOUND, max_value=BOUND), min_size=DIM, max_size=DIM)


@settings(max_examples=200, deadline=None)
@given(_vec, _vec)
def test_float64_dot_equals_exact_integer_dot(a, b):
    exact = sum(x * y for x, y in zip(a, b))  # arbitrary-precision
    fa = np.asarray(a, dtype=np.float64)
    fb = np.asarray(b, dtype=np.float64)
    assert float(fa @ fb) == float(exact)
    assert abs(exact) < 2**53  # the headroom argument itself


def test_extreme_corner_is_still_exact():
    a = np.full(DIM, BOUND, dtype=np.float64)
    exact = DIM * BOUND * BOUND
    assert float(a @ a) == float(exact)
    assert exact < 2**53


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=-BOUND, max_value=BOUND),
    st.integers(min_value=-BOUND, max_value=BOUND),
    st.integers(min_value=-BOUND, max_value=BOUND),
)
def test_sq8_double_floor_division_is_exact_integer_floor(v, lo, hi):
    """The SQ8 encoder (operators/similarity.py _sq8_scored) computes
    code = floor(double((v - mn) * 255) / rng). Both engines do the same
    IEEE steps, so PARITY is trivially safe; this pins the stronger claim
    that the double path equals true integer floor division at these
    magnitudes (numerator <= ~1.5e7 is double-exact, and a quotient can
    only round across an integer if the remainder were < rng * 5.7e-14 < 1,
    i.e. exactly zero) — so code is the mathematically-defined SQ8 code,
    and the reconstruction bound below is the textbook one."""
    mn, mx = min(lo, hi), max(lo, hi)
    v = mn + (v - mn) % (mx - mn + 1) if mx > mn else mn  # clamp v into [mn, mx]
    rng = max(mx - mn, 1)
    num = (v - mn) * 255
    code = int(np.floor(np.float64(num) / np.float64(rng)))
    assert code == num // rng  # double path == exact integer floor
    assert 0 <= code <= 255
    r = mn * 255 + code * rng
    # reconstruction bracket: R <= 255*v < R + rng  (error < one code step)
    assert r <= 255 * v < r + rng
