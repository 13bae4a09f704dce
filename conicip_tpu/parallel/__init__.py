from .batch import BatchSolution, make_batched_solver, solve_batch
from .distributed import distributed_normal_matrix, kktsolver_schur_tp
from .mesh import make_mesh

__all__ = [
    "solve_batch",
    "BatchSolution",
    "make_batched_solver",
    "kktsolver_schur_tp",
    "distributed_normal_matrix",
    "make_mesh",
]
