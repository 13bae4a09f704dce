"""Native C++ pivoted-QR kernel vs scipy reference."""

import numpy as np
import pytest
from scipy.linalg import qr as scipy_qr

from conicip_tpu import native


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_pivoted_qr_matches_scipy(rng):
    for (m, n) in [(5, 8), (8, 5), (10, 10), (1, 7), (30, 12)]:
        A = rng.standard_normal((m, n))
        rdiag, piv = native.pivoted_qr_rank(A)
        _, Rm, piv_s = scipy_qr(A, mode="economic", pivoting=True)
        ref = np.abs(np.diag(Rm)[: min(m, n)])
        np.testing.assert_allclose(rdiag, ref, rtol=1e-10, atol=1e-12)
        # permutations may differ on ties; rank-revealing diag must agree


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_pivoted_qr_rank_deficient(rng):
    A = rng.standard_normal((4, 10))
    A2 = np.vstack([A, A[0] + A[1], 2 * A[2]])  # rank 4, 6 rows
    rdiag, piv = native.pivoted_qr_rank(A2.T)
    assert np.sum(rdiag > 1e-10) == 4


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_pivoted_qr_zero_matrix():
    rdiag, piv = native.pivoted_qr_rank(np.zeros((3, 5)))
    assert np.all(rdiag == 0)
    assert sorted(piv.tolist()) == list(range(5))


def test_imcols_uses_native_or_fallback(rng):
    # imcols must work whether or not the native lib is present
    from conicip_tpu.preprocess import imcols

    A = rng.standard_normal((5, 10))
    R, ok = imcols(A, rng.standard_normal(5))
    assert ok and len(R) == 5
