"""Miles's counterexamples — real-world regression data from the reference
(test/runtests.jl:592-651, data test/testdata.jl:109-151 extracted to
tests/data/*.npz by tools/extract_miles_data.py)."""

import numpy as np
import pytest

from conicip_tpu.kkt import kktsolver_lu, kktsolver_qr, kktsolver_schur
from conicip_tpu.preprocess import preprocess_conic_ip

from miles import load_miles, mpb_to_conicip

SOLVERS = {
    "schur": kktsolver_schur,
    "qr": kktsolver_qr,
    "lu": kktsolver_lu,
}


@pytest.mark.parametrize("solver", SOLVERS)
def test_miles_1_optimal(solver):
    c, A, b, con, var = load_miles(1)
    args = mpb_to_conicip(c, A, b, con, var)
    sol = preprocess_conic_ip(*args, kktsolver=SOLVERS[solver])
    assert sol.status == "Optimal"


@pytest.mark.parametrize("solver", SOLVERS)
def test_miles_2_infeasible(solver):
    c, A, b, con, var = load_miles(2)
    args = mpb_to_conicip(c, A, b, con, var)
    sol = preprocess_conic_ip(*args, kktsolver=SOLVERS[solver])
    assert sol.status == "Infeasible"


@pytest.mark.parametrize(
    "kappa", [1e-8, 1e-6, 1e-4, 1.0, 1e4, 1e6, 1e8]
)
def test_miles_3_full_scaling(kappa):
    # scale c, A, b together — solution set invariant (runtests.jl:621-628)
    c, A, b, con, var = load_miles(3)
    args = mpb_to_conicip(kappa * c, kappa * A, kappa * b, con, var)
    sol = preprocess_conic_ip(*args)
    assert sol.status == "Optimal", f"kappa={kappa}: {sol.status}"


@pytest.mark.parametrize("kappa", [1e-4, 1.0, 1e4, 1e6])
def test_miles_3_constraint_scaling(kappa):
    # scale A, b only (runtests.jl:630-637)
    c, A, b, con, var = load_miles(3)
    args = mpb_to_conicip(c, kappa * A, kappa * b, con, var)
    sol = preprocess_conic_ip(*args)
    assert sol.status == "Optimal", f"kappa={kappa}: {sol.status}"
