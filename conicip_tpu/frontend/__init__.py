from .model import Optimizer, TerminationStatus
from .sets import (
    EqualTo,
    GreaterThan,
    LessThan,
    Nonnegatives,
    Nonpositives,
    PSDTriangle,
    SecondOrderCone,
    Zeros,
)

__all__ = [
    "Optimizer",
    "TerminationStatus",
    "Zeros",
    "Nonnegatives",
    "Nonpositives",
    "SecondOrderCone",
    "PSDTriangle",
    "EqualTo",
    "GreaterThan",
    "LessThan",
]
