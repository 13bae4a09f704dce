from .generators import (
    ALL_GENERATORS,
    Problem,
    batched_box_qp,
    box_qp_dense,
    box_qp_sparse,
    larger_sdp,
    many_small_socs,
    mixed_rq_eq,
    mixed_rqs,
    single_soc,
    small_sdp,
)

__all__ = [
    "ALL_GENERATORS",
    "Problem",
    "batched_box_qp",
    "box_qp_dense",
    "box_qp_sparse",
    "larger_sdp",
    "many_small_socs",
    "mixed_rq_eq",
    "mixed_rqs",
    "single_soc",
    "small_sdp",
]
