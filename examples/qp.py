"""Quadratic programs: box-constrained projection + warm starts.

Projection of a point c onto the unit box under the metric H:

    minimize   ½yᵀHy − (Hc)ᵀy      (≡ ½‖y − c‖²_H up to a constant)
    subject to  −1 ≤ yᵢ ≤ 1

expressed conically as A y ≥ b with A = [I; −I], b = −1 (reference
tutorial analogue: /root/reference/docs/src/tutorials/qp.jl).

Also demonstrates ``warm_start`` — a conicip_tpu extension the reference
does not have: re-solves of a drifting problem seed from the previous
solution and typically converge in 2-4× fewer iterations (the production
pattern for rolling re-optimization).

Run: python examples/qp.py
"""

import numpy as np

import conicip_tpu as ct

n = 200
rng = np.random.default_rng(0)
H = np.diag(1.0 + rng.random(n))
c = 2.0 * rng.standard_normal(n)  # many coordinates project onto the bounds
# keep the example well-posed: a coefficient sitting exactly ON a bound
# makes that coordinate of the projection degenerate (only √tolerance-
# determined — true for any IPM, including the reference)
c = np.where(np.abs(np.abs(c) - 1.0) < 0.05, 1.2 * c, c)

A = np.vstack([np.eye(n), -np.eye(n)])
b = -np.ones(2 * n)

sol = ct.conic_ip(H, H @ c, A, b, [("R", 2 * n)])
print("status:", sol.status, " iterations:", sol.Iter)

# With a diagonal metric the projection is the coordinate-wise clip.
expected = np.clip(c, -1.0, 1.0)
assert sol.status == "Optimal"
# coordinates near (but off) a bound converge at ~tolerance/distance —
# 1e-3 here reflects the 1e-6 solver tolerance, not a solver limitation
assert np.max(np.abs(sol.y - expected)) < 2e-3

# ── Warm start: perturb the point, re-solve from the previous solution.
c2 = c + 0.01 * rng.standard_normal(n)
cold = ct.conic_ip(H, H @ c2, A, b, [("R", 2 * n)])
warm = ct.conic_ip(H, H @ c2, A, b, [("R", 2 * n)], warm_start=sol)
print(f"re-solve: cold {cold.Iter} iters vs warm {warm.Iter} iters")
assert warm.status == "Optimal"
assert warm.Iter <= cold.Iter
assert np.max(np.abs(warm.y - np.clip(c2, -1, 1))) < 2e-3
print("ok")
