from .cholesky import cholesky, cho_solve, CholFactor

__all__ = ["cholesky", "cho_solve", "CholFactor"]
