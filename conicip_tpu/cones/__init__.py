from .spec import ConeSpec, SocGroup, SdpGroup, tri_dim, tri_order
from .symm import mat, vecm
from .algebra import cone_prod, cone_div, maxstep, maxstep_to_cone, lyap_solve
from . import scaling
from .scaling import (
    NTScaling,
    nt_scaling,
    nt_identity,
    nt_inv_adjoint,
)

__all__ = [
    "ConeSpec",
    "SocGroup",
    "SdpGroup",
    "tri_dim",
    "tri_order",
    "mat",
    "vecm",
    "cone_prod",
    "cone_div",
    "maxstep",
    "maxstep_to_cone",
    "lyap_solve",
    "scaling",
    "NTScaling",
    "nt_scaling",
    "nt_identity",
    "nt_inv_adjoint",
]
