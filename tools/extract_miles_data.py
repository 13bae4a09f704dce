#!/usr/bin/env python
"""One-time extraction of Miles's counterexample *data* from the reference's
test suite (/root/reference/test/testdata.jl:109-151) into .npz files.

These are numeric regression datasets (originally from Miles Lubin), not
code: vectors c, b, sparse triplets (I, J, V) and cone index lists. The
conversion logic itself is re-implemented in tests/miles.py.

Usage: python tools/extract_miles_data.py [reference_testdata_jl] [outdir]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

import numpy as np


def parse_float_list(s: str) -> np.ndarray:
    return np.asarray([float(x) for x in s.split(",") if x.strip()], dtype=np.float64)


def parse_int_list(s: str) -> np.ndarray:
    return np.asarray([int(x) for x in s.split(",") if x.strip()], dtype=np.int64)


def parse_cones(s: str):
    """Parse Julia `[(:Zero,[1,2,...]), (:SOC,[...]), ...]` into
    [["Zero", [...]], ...] (1-based indices preserved; converted on load)."""
    out = []
    for m in re.finditer(r"\(:(\w+),\[([\d,\s]*)\]\)", s):
        out.append([m.group(1), parse_int_list(m.group(2)).tolist()])
    return out


def extract(source: str, fn_name: str) -> dict:
    m = re.search(
        rf"function {fn_name}\(\)(.*?)\nend", source, flags=re.DOTALL
    )
    if not m:
        raise RuntimeError(f"{fn_name} not found")
    body = m.group(1)

    def grab(name: str) -> str:
        mm = re.search(rf"^\s*{name} = \[(.*?)\]\s*$", body, flags=re.MULTILINE | re.DOTALL)
        if not mm:
            raise RuntimeError(f"{name} not found in {fn_name}")
        return mm.group(1)

    c = parse_float_list(grab("c"))
    b = parse_float_list(grab("b"))
    I = parse_int_list(grab("I"))
    J = parse_int_list(grab("J"))
    V = parse_float_list(grab("V"))
    con_cones = parse_cones(grab("con_cones"))
    var_cones = parse_cones(grab("var_cones"))
    return dict(c=c, b=b, I=I, J=J, V=V, con_cones=con_cones, var_cones=var_cones)


def main():
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference/test/testdata.jl")
    outdir = Path(sys.argv[2] if len(sys.argv) > 2 else "tests/data")
    outdir.mkdir(parents=True, exist_ok=True)
    text = src.read_text()
    for i in (1, 2, 3):
        data = extract(text, f"miles_problem_{i}")
        np.savez_compressed(
            outdir / f"miles{i}.npz",
            c=data["c"],
            b=data["b"],
            I=data["I"],
            J=data["J"],
            V=data["V"],
            con_cones=json.dumps(data["con_cones"]),
            var_cones=json.dumps(data["var_cones"]),
        )
        m, n = len(data["b"]), len(data["c"])
        print(f"miles{i}: A {m}x{n}, nnz={len(data['V'])}, "
              f"{len(data['con_cones'])} con cones, {len(data['var_cones'])} var cones")


if __name__ == "__main__":
    main()
