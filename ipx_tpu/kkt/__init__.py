"""KKT solver layer: conjugate residuals on the normal equations with
diagonal (phase 1) or basis (phase 2) preconditioning."""
from .base import KKTSolver
from .cr import ConjugateResiduals
from .diag import KKTSolverDiag

__all__ = ["KKTSolver", "ConjugateResiduals", "KKTSolverDiag"]
