"""Solver state pytrees and the user-facing Solution type."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Vec4", "Status", "SolState", "Solution", "STATUS_NAMES",
           "to_host"]


def to_host(x) -> np.ndarray:
    """Device → host, multi-process safe.

    Under ``jax.distributed`` a jit output committed to the global mesh
    spans non-addressable devices and plain ``np.asarray`` raises; gather
    it through the coordination service first. Single-process arrays take
    the plain path untouched.
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Vec4:
    """4-block iterate (primal y, equality dual w, cone dual v, slack s) —
    the reference's ``v4x1`` (ConicIP.jl:57-66)."""

    y: jnp.ndarray
    w: jnp.ndarray
    v: jnp.ndarray
    s: jnp.ndarray

    def __add__(self, o: "Vec4") -> "Vec4":
        return Vec4(self.y + o.y, self.w + o.w, self.v + o.v, self.s + o.s)

    def __sub__(self, o: "Vec4") -> "Vec4":
        return Vec4(self.y - o.y, self.w - o.w, self.v - o.v, self.s - o.s)

    def scale(self, a) -> "Vec4":
        return Vec4(a * self.y, a * self.w, a * self.v, a * self.s)

    def norm(self) -> jnp.ndarray:
        # sum of block norms, empty blocks contributing 0 (reference
        # ``norm(v4x1)`` with normsafe, ConicIP.jl:51,61)
        out = jnp.linalg.norm(self.y)
        for blk in (self.w, self.v, self.s):
            if blk.shape[0]:
                out = out + jnp.linalg.norm(blk)
        return out


class Status:
    """Integer status codes used inside jit; mapped to symbols outside."""

    RUNNING = 0
    OPTIMAL = 1
    INFEASIBLE = 2
    UNBOUNDED = 3
    ABANDONED = 4
    ERROR = 5


STATUS_NAMES = {
    Status.RUNNING: "Running",
    Status.OPTIMAL: "Optimal",
    Status.INFEASIBLE: "Infeasible",
    Status.UNBOUNDED: "Unbounded",
    Status.ABANDONED: "Abandoned",
    Status.ERROR: "Error",
}


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SolState:
    """Array-land solution record (the best-iterate tracker plus final
    diagnostics — mirrors the reference ``Solution``, ConicIP.jl:384-398)."""

    y: jnp.ndarray
    w: jnp.ndarray
    v: jnp.ndarray
    status: jnp.ndarray  # int32 Status code
    Iter: jnp.ndarray  # int32
    Mu: jnp.ndarray
    prFeas: jnp.ndarray
    duFeas: jnp.ndarray
    muFeas: jnp.ndarray
    pobj: jnp.ndarray
    dobj: jnp.ndarray


@dataclass
class Solution:
    """User-facing solution, field-compatible with the reference's
    ``Solution`` struct (ConicIP.jl:384-398); ``status`` is one of
    "Optimal", "Infeasible", "Unbounded", "Abandoned", "Error"."""

    y: np.ndarray
    w: np.ndarray
    v: np.ndarray
    status: str
    Iter: int
    Mu: float
    prFeas: float
    duFeas: float
    muFeas: float
    pobj: float
    dobj: float

    @classmethod
    def from_state(cls, st: SolState) -> "Solution":
        return cls(
            y=to_host(st.y),
            w=to_host(st.w),
            v=to_host(st.v),
            status=STATUS_NAMES[int(to_host(st.status))],
            Iter=int(to_host(st.Iter)),
            Mu=float(to_host(st.Mu)),
            prFeas=float(to_host(st.prFeas)),
            duFeas=float(to_host(st.duFeas)),
            muFeas=float(to_host(st.muFeas)),
            pobj=float(to_host(st.pobj)),
            dobj=float(to_host(st.dobj)),
        )
