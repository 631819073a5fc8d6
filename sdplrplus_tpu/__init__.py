"""SDPLRPlus-TPU: a TPU-native low-rank SDP solver framework.

Brand-new JAX/XLA/Pallas re-design with the capabilities of the reference
SDPLRPlus.jl (Burer-Monteiro factorization + augmented Lagrangian +
L-BFGS + exact quartic line search + Lanczos suboptimality bound +
dynamic rank doubling). See SURVEY.md for the component map.
"""

from .config import SolverConfig
from .problem import SDPProblem, SparseSym, SymLowRank, make_problem, sparse_coo
from .compile import compile_problem
from .solver.outer import sdplr, solve
from .solver.rank import barvinok_pataki

__all__ = [
    "SolverConfig",
    "SDPProblem",
    "SparseSym",
    "SymLowRank",
    "make_problem",
    "sparse_coo",
    "compile_problem",
    "sdplr",
    "solve",
    "barvinok_pataki",
]
