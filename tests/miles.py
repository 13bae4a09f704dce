"""MathProgBase-conic → internal-form converter + Miles dataset loader.

Python re-implementation of the conversion semantics documented in the
reference's ``mpb_to_conicip`` (test/testdata.jl:5-104):

    MPB:      min cᵀx  s.t.  b − Ax ∈ K_con,  x ∈ K_var
    internal: min ½yᵀQy − cᵀy  s.t.  Ay ≥_K b,  Gy = d

with Q = 0, c_int = −c_mpb (the solver's minus-sign convention), Zero
constraint cones becoming equalities, NonPos rows passing through, and
NonNeg/SOC/SDP rows negating both A and b. Variable cones become selection
rows scaled by ‖A‖_F for conditioning.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

DATA_DIR = Path(__file__).parent / "data"


def load_miles(i: int):
    z = np.load(DATA_DIR / f"miles{i}.npz")
    m, n = len(z["b"]), len(z["c"])
    A = np.zeros((m, n))
    # Julia sparse triplets sum duplicates and are 1-based
    np.add.at(A, (z["I"] - 1, z["J"] - 1), z["V"])
    con_cones = json.loads(str(z["con_cones"]))
    var_cones = json.loads(str(z["var_cones"]))
    return z["c"], A, z["b"], con_cones, var_cones


def mpb_to_conicip(c_mpb, A_mpb, b_mpb, con_cones, var_cones):
    c_mpb = np.asarray(c_mpb, dtype=float)
    A_mpb = np.asarray(A_mpb, dtype=float)
    b_mpb = np.asarray(b_mpb, dtype=float)
    n = len(c_mpb)
    nA = np.linalg.norm(A_mpb)

    eq_rows = []
    A_rows, b_vals, cone_dims = [], [], []

    for ctype, indices in con_cones:
        idx = np.asarray(indices, dtype=int) - 1  # 1-based → 0-based
        if ctype == "Zero":
            eq_rows.extend(idx.tolist())
        elif ctype == "NonPos":
            # b − Ax ≤ 0 → Ax ≥ b
            A_rows.append(A_mpb[idx, :])
            b_vals.append(b_mpb[idx])
            cone_dims.append(("R", len(idx)))
        elif ctype == "NonNeg":
            A_rows.append(-A_mpb[idx, :])
            b_vals.append(-b_mpb[idx])
            cone_dims.append(("R", len(idx)))
        elif ctype == "SOC":
            A_rows.append(-A_mpb[idx, :])
            b_vals.append(-b_mpb[idx])
            cone_dims.append(("Q", len(idx)))
        elif ctype == "SDP":
            A_rows.append(-A_mpb[idx, :])
            b_vals.append(-b_mpb[idx])
            cone_dims.append(("S", len(idx)))
        else:
            raise ValueError(f"unknown constraint cone {ctype}")

    if eq_rows:
        G = A_mpb[eq_rows, :]
        d = b_mpb[eq_rows]
    else:
        G = np.zeros((0, n))
        d = np.zeros(0)

    for vtype, indices in var_cones:
        idx = np.asarray(indices, dtype=int) - 1
        if vtype == "Free":
            continue
        sign = -nA if vtype == "NonPos" else nA
        ctype = {"NonNeg": "R", "NonPos": "R", "SOC": "Q", "SDP": "S"}[vtype]
        sel = np.zeros((len(idx), n))
        sel[np.arange(len(idx)), idx] = sign
        A_rows.append(sel)
        b_vals.append(np.zeros(len(idx)))
        cone_dims.append((ctype, len(idx)))

    A_int = np.vstack(A_rows) if A_rows else np.zeros((0, n))
    b_int = np.concatenate(b_vals) if b_vals else np.zeros(0)
    Q = np.zeros((n, n))
    c_int = -c_mpb  # solver minimizes −cᵀy

    return Q, c_int, A_int, b_int, cone_dims, G, d
