"""Scenario-batched KKT solves with a SHARED basis preconditioner.

The missing piece between the batched phase-1 solver (diagonal
preconditioning, parallel/batch.py) and per-scenario host finishes: solve

    (AI W_k AI') y_k = rhs_k        for scenarios k = 1..B

by conjugate residuals preconditioned with ONE basis matrix B shared across
the batch,

    M_k^{-1} v = B'^{-T} ( D^{-2} ⊙ (B^{-1} v) ),    B~ = B diag(D),

so the B / B' solves run as blocked multi-RHS native solves (the factor
traversal is amortized over the batch; LuUpdate.solve_dense_block) and the
AI W AI' products as batched sparse-times-dense scipy products. With the
per-scenario weights W_k close to the scaling the basis was refined for
(e.g. scenario perturbations of one LP), this converges in the few
iterations characteristic of basis preconditioning rather than the hundreds
of diagonal-preconditioned CR.

Per-scenario convergence freeze, scaled infinity-norm termination — the
same contract as the phase-2 KKT solver. No reference counterpart (the
reference is single-LP; SURVEY §2.3 names batched scenarios as the
data-parallel analog for this framework).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp


class SharedBasisBatchedCR:
    """CR on the normal equations for a batch of weight vectors, with a
    shared basis preconditioner applied through blocked native solves."""

    def __init__(self, basis, W: np.ndarray, resscale: np.ndarray):
        """basis: a factorized ipx_tpu Basis; W (n+m, B) per-scenario
        weights; resscale (m, B) residual scaling for termination."""
        self.basis = basis
        md = basis.model
        self.md = md
        m, n = md.num_rows, md.num_cols
        self.m, self.n = m, n
        self.W = np.asarray(W, dtype=np.float64)
        self.B = self.W.shape[1]
        self.resscale = np.asarray(resscale, dtype=np.float64)
        # per-scenario squared scaling of the basic variables, by slot;
        # guard zero/inf weights (free/fixed slots act as unit)
        D2 = self.W[basis.basis, :].copy()
        bad = ~np.isfinite(D2) | (D2 <= 0.0)
        D2[bad] = 1.0
        self._D2 = D2
        self.iters = 0

    # -- batched operators ------------------------------------------------
    def _normal_apply(self, V: np.ndarray) -> np.ndarray:
        """(AI W_k AI') v_k for all scenarios: V (m, B) -> (m, B)."""
        md = self.md
        n = self.n
        U = md.A.T @ V                                   # A' V  (n, B)
        U *= self.W[:n, :]
        out = md.A @ U
        out += self.W[n:, :] * V
        return out

    def _precond_apply(self, V: np.ndarray) -> np.ndarray:
        """M^{-1} V = B'^{-T}(D^{-2} (B^{-1} V)) via blocked solves."""
        Z = self.basis.lu.solve_dense_block(V, False)    # B Z = V  (slots)
        Z /= self._D2
        return self.basis.lu.solve_dense_block(Z, True)  # B' out = Z (rows)

    # -- preconditioned CR with per-scenario freeze -----------------------
    def solve(self, RHS: np.ndarray, tol: float, maxiter: int = -1
              ) -> Tuple[np.ndarray, np.ndarray, int]:
        """Returns (Y (m,B), converged mask (B,), iters)."""
        m, B = self.m, self.B
        if maxiter < 0:
            maxiter = m + 100
        RHS = np.asarray(RHS, dtype=np.float64)
        Y = np.zeros((m, B))
        R = RHS.copy()
        S = self._precond_apply(R)
        CS = self._normal_apply(S)
        D = S.copy()
        CD = CS.copy()
        cdot = np.einsum("ij,ij->j", S, CS)
        done = np.zeros(B, dtype=bool)
        it = 0
        while True:
            resnorm = np.max(np.abs(self.resscale * R), axis=0)
            done |= resnorm <= tol
            # scenarios with breakdowns freeze as not-converged
            done |= ~np.isfinite(cdot)
            done |= cdot <= 0.0
            if np.all(done) or it >= maxiter:
                break
            PCD = self._precond_apply(CD)
            pdot = np.einsum("ij,ij->j", CD, PCD)
            with np.errstate(divide="ignore", invalid="ignore"):
                alpha = np.where(done | (pdot <= 0.0), 0.0, cdot / pdot)
            Y += alpha[None, :] * D
            R -= alpha[None, :] * CD
            S -= alpha[None, :] * PCD
            CS = self._normal_apply(S)
            cdot_new = np.einsum("ij,ij->j", S, CS)
            with np.errstate(divide="ignore", invalid="ignore"):
                beta = np.where(done | (cdot == 0.0), 0.0, cdot_new / cdot)
            D = np.where(done[None, :], D, S + beta[None, :] * D)
            CD = np.where(done[None, :], CD, CS + beta[None, :] * CD)
            cdot = np.where(done, cdot, cdot_new)
            it += 1
        self.iters = it
        resnorm = np.max(np.abs(self.resscale * R), axis=0)
        return Y, resnorm <= tol, it
