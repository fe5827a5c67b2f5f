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
        # clamp the dynamic range so the scaled solves cannot overflow
        # (weights reach ~1e+/-300 late in a polish; the preconditioner only
        # needs their relative size, and 1e+/-30 keeps every quotient of
        # two clamped values finite without runtime warnings)
        np.clip(D2, 1e-30, 1e30, out=D2)
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


class SharedBasisBatchedPolish:
    """Batched phase-2 'polish': continue a batch of scenario IPMs with
    basis-preconditioned KKT solves sharing ONE basis.

    Reuses the batched predictor-corrector step of BatchedPhase1Solver
    (state machine, Newton reduction, step sizes are all batched masked
    operations) but swaps the KKT solve for SharedBasisBatchedCR and the
    products for host scipy — the step runs eagerly on host, where the
    blocked native B/B' solves live. Intended use: batched diag phase 1 to
    a loose tolerance, one mean-scenario basis, then this polish drives all
    scenarios to tight tolerances at basis-preconditioning iteration counts
    (the batched analog of the solver's phase switch; no reference
    counterpart).
    """

    def __init__(self, blp, basis, feasibility_tol=1e-6,
                 optimality_tol=1e-8, kkt_tol=0.3, cr_maxiter=500,
                 maxiter=60):
        from .batch import BatchedPhase1Solver
        self._ph1 = BatchedPhase1Solver(
            blp, feasibility_tol=feasibility_tol,
            optimality_tol=optimality_tol, kkt_tol=kkt_tol,
            cr_maxiter=cr_maxiter, maxiter=maxiter)
        self.basis = basis
        self.maxiter = maxiter
        m, n = blp.A.shape
        self.m, self.n = m, n
        self.A = blp.A
        self.cr_maxiter = cr_maxiter
        self.total_cr_iters = 0
        # host linear algebra replaces the device SpMV formulation
        ph = self._ph1
        ph._AI_mul = self._AI_mul
        ph._AIt_mul = self._AIt_mul
        ph._cr_solve = self._cr_solve
        A2 = blp.A.copy()
        A2.data = A2.data ** 2
        self._A2 = A2.tocsr()
        ph._diag_w = self._diag_w

        class _HostStruct:
            def __init__(self, A):
                self.A = A

            def apply_batched_struct(self, X):
                return self.A @ np.asarray(X)

        ph.nmd = _HostStruct(blp.A)

    # -- host products -----------------------------------------------------
    def _AI_mul(self, X):
        X = np.asarray(X)
        n = self.n
        return self.A @ X[:n] + X[n:]

    def _AIt_mul(self, Y):
        Y = np.asarray(Y)
        return np.concatenate([self.A.T @ Y, Y], axis=0)

    def _diag_w(self, W):
        W = np.asarray(W)
        return self._A2 @ W[:self.n] + W[self.n:]

    def _cr_solve(self, W, diag, resscale, RHS, tol):
        cr = SharedBasisBatchedCR(self.basis, np.asarray(W),
                                  np.asarray(resscale))
        tol_arr = np.asarray(tol)
        Y, ok, iters = cr.solve(np.asarray(RHS), float(np.min(tol_arr)),
                                self.cr_maxiter)
        self.total_cr_iters += iters
        return Y, iters

    # -----------------------------------------------------------------------
    def run(self, state):
        """Polishes a batched IPM state dict (X, XL, XU, Y, ZL, ZU, done,
        iters — numpy or jax arrays) to the tolerances; returns numpy."""
        S = {k: np.asarray(v) for k, v in state.items()}
        # the incoming state's done flags reflect the phase-1 tolerances;
        # re-judge every scenario against THIS polish's tolerances
        S["done"] = np.zeros_like(np.asarray(S["done"]))
        ph = self._ph1
        # masked arithmetic over inf bounds (the batched step was written
        # for jit where numpy's invalid-op warnings do not exist)
        with np.errstate(invalid="ignore", divide="ignore"):
            best_mu = np.asarray(ph._mu_of(S)).copy()
            since_improve = 0
            for _ in range(self.maxiter):
                S = {k: np.asarray(v) for k, v in ph._ipm_step(S).items()}
                if bool(np.all(S["done"])):
                    break
                # Stagnation exit: the shared basis preconditions well only
                # while the scenario iterates stay near the scaling it was
                # refined for. IPM progress under a fixed preconditioner is
                # noisy/non-monotone, so judge against the best
                # complementarity seen per scenario over a window: stop when
                # no unconverged scenario has improved its best mu by >=10%
                # within the last 15 steps — the caller hands those scenarios
                # to per-scenario finishes (the done mask says which).
                mu = np.asarray(ph._mu_of(S))
                active = ~np.asarray(S["done"])
                improved = mu < 0.9 * best_mu
                best_mu = np.minimum(best_mu, mu)
                if active.any() and not bool(np.any(improved[active])):
                    since_improve += 1
                    if since_improve >= 15:
                        break
                else:
                    since_improve = 0
            S["pobj"] = np.sum(np.asarray(ph.cT) * S["X"], axis=0)
            S["mu"] = np.asarray(ph._mu_of(S))
        return S
