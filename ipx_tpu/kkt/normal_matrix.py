"""Normal-matrix operator C = AI * diag(W) * AI'.

Counterpart of the reference normal matrix operator (reference:
src/normal_matrix.{h,cc}). With the slack identity implicit, the apply is

    C v = A (W_struct ⊙ (A' v)) + W_slack ⊙ v,

two CSR/CSC SpMVs plus elementwise work on host (scipy native code), or one
fused device kernel (ipx_tpu.ops). The curvature dot product rhs·lhs is fused
with the matvec as in the reference (src/normal_matrix.cc:123-124).
"""
from __future__ import annotations

from time import perf_counter
from typing import Optional

import numpy as np

from ..model import Model
from .cr import LinearOperator


class NormalMatrix(LinearOperator):
    def __init__(self, model: Model):
        self.model = model
        self.W: Optional[np.ndarray] = None
        self.time = 0.0

    def prepare(self, W: Optional[np.ndarray]) -> None:
        self.W = W

    def reset_time(self) -> None:
        self.time = 0.0

    def _apply(self, rhs: np.ndarray, want_dot: bool):
        t0 = perf_counter()
        md = self.model
        n = md.num_cols
        if self.W is not None:
            u = (rhs @ md.A_csr) * self.W[:n]      # W_struct ⊙ (A' v)
            lhs = md.A @ u
            lhs += self.W[n:] * rhs                # slack block
        else:
            u = rhs @ md.A_csr
            lhs = md.A @ u                         # A A' v (zero slack weight)
        dot = float(rhs @ lhs) if want_dot else None
        self.time += perf_counter() - t0
        return lhs, dot
