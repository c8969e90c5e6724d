"""Hypothesis differentials for the PQ float contract (adversarial inputs).

Split out of test_pq.py so an environment without the optional hypothesis
dependency skips ONLY these differentials instead of failing the whole PQ
module at collection (round-6 advisor finding).
"""

import numpy as np
import pytest

from docling_ocr_qwen3vl_spark.operators.similarity import PQ_CENTROIDS, PQ_M

# --- hypothesis differentials: the float contract on ADVERSARIAL inputs ---
# The fixed-corpus parity tests above pin expr==fast on real data; these
# drive the SHIPPED numpy kernels against an independent pure-Python
# left-to-right fold on randomized vectors (boundary values, tiny/huge
# magnitudes, near-ties), so a pairwise-summation or argmin-tie-break
# regression fails on the adversarial case the corpus may not contain.

pytest.importorskip(
    "hypothesis",
    reason="optional dependency: these differentials live in their own "
    "module so the fixed-corpus PQ tests in test_pq.py still run "
    "where hypothesis is not installed",
)
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _py_pq_reference(v, m, nc, sub, C):
    """Independent scalar reference: ascending-k fold, first-match argmin."""
    codes, err = [], 0.0
    for s in range(m):
        dists = []
        for j in range(nc):
            d = 0.0
            for k in range(sub):
                t = v[s * sub + k] - C[s][j][k]
                d += t * t
            dists.append(d)
        best = min(range(nc), key=lambda j: (dists[j], j))
        codes.append(best)
        err += dists[best]
    return codes, err


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e3, max_value=1e3, allow_nan=False, width=64
        ),
        min_size=64,
        max_size=64,
    )
)
def test_numpy_pq_kernel_matches_scalar_fold(v):
    from docling_ocr_qwen3vl_spark.operators.similarity import (
        _pq_codebook_np,
        _pq_encode_np,
    )

    m, nc, sub = PQ_M, PQ_CENTROIDS, 8
    C = _pq_codebook_np(m, nc, sub)
    codes, err = _pq_encode_np(np.array([v], dtype=np.float64), m, nc, sub, C)
    ref_codes, ref_err = _py_pq_reference(v, m, nc, sub, C)
    assert list(codes[0]) == ref_codes
    # identical fold order -> bit-identical accumulation
    assert err[0] == ref_err


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=64),
        min_size=64,
        max_size=64,
    ),
    st.integers(min_value=0, max_value=15),
)
def test_numpy_adc_gather_matches_scalar_sum(v, code_seed):
    """The cogroup ADC table build + gather (same sequential-k loop as
    _pq_encode_np) must equal the scalar per-subspace table sum for an
    arbitrary code word."""
    from docling_ocr_qwen3vl_spark.operators.similarity import (
        _pq_adc_tables,
        _pq_codebook_np,
    )

    m, nc, sub = PQ_M, PQ_CENTROIDS, 8
    C = _pq_codebook_np(m, nc, sub)
    T = _pq_adc_tables(np.array([v], dtype=np.float64), m, nc, sub, C)
    codes = [(code_seed + s) % nc for s in range(m)]
    gathered = sum(T[0, s, codes[s]] for s in range(m))
    ref = 0.0
    for s in range(m):
        d = 0.0
        for k in range(sub):
            t = v[s * sub + k] - C[s][codes[s]][k]
            d += t * t
        ref += d
    assert gathered == ref
