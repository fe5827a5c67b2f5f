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


class SharedBasisLowRank:
    """Per-scenario rank-r Woodbury correction of the shared-basis
    preconditioner (the VERDICT-r4 'batched-finish stagnation' fix).

    The shared preconditioner M0_k = B diag(D_k^2) B' ignores the nonbasic
    part N W_N N' of the true normal matrix. For the mean scenario that is
    fine (maxvolume drove every nonbasic column's weighted leverage below
    volume_tol), but an off-mean scenario k can have nonbasic columns j
    whose weight w_jk has grown large — each contributes an outlier
    eigenvalue ~ 1 + w_jk * ||D_k^{-1} B^{-1} a_j||^2 to M0_k^{-1} S_k,
    and the batched polish stagnates once CR has to grind through those
    outliers every solve. This is the 'soft' version of what maxvolume
    would do per scenario (swap those columns into the basis,
    reference: src/maxvolume.cc:96-186) without B refactorizations:

        M_k = B D_k^2 B' + U_k S_k U_k',   U_k = AI[:, J_k]

    applied by Sherman-Morrison-Woodbury with one blocked B solve for the
    candidate pool (scenario-independent) and one blocked B' solve for
    the per-scenario P_k U_k.

    Selection: candidate pool = union of per-scenario top-c nonbasic
    weights; exact leverages from the pooled solve Z = B^{-1} AI_pool;
    per-scenario top-r columns by score w_jk * sum_i Z_ij^2 / D2_ik with
    scores below tau dropped (their slots are made inert).
    """

    def __init__(self, basis, W: np.ndarray, D2: np.ndarray, r: int = 8,
                 pool_cap: int = 256, tau: float = 0.25):
        import scipy.sparse as sp
        md = basis.model
        m, n = md.num_rows, md.num_cols
        self.m, self.n = m, n
        W = np.asarray(W)
        B = W.shape[1]
        self.B = B
        r = min(r, m)

        nb_mask = np.ones(n + m, dtype=bool)
        nb_mask[np.asarray(basis.basis, dtype=np.int64)] = False
        Wn = np.where(nb_mask[:, None], W, 0.0)
        Wn[~np.isfinite(Wn)] = 0.0

        # pool: union of per-scenario top-c nonbasic weights
        c = min(r, n + m - 1)
        idx = np.argpartition(-Wn, c, axis=0)[:c]
        pool = np.unique(idx.ravel())
        pool = pool[nb_mask[pool] & (np.max(Wn[pool], axis=1) > 0.0)]
        if len(pool) > pool_cap:
            order = np.argsort(-np.max(Wn[pool], axis=1))
            pool = np.sort(pool[order[:pool_cap]])
        self.active = len(pool) > 0
        if not self.active:
            return
        p = len(pool)

        # AI[:, pool] as a sparse matrix (structural + slack columns)
        cols = []
        A = md.A.tocsc()
        eye = sp.eye(m, format="csc")
        struct = pool[pool < n]
        slack = pool[pool >= n] - n
        Apool = sp.hstack(
            [A[:, struct], eye[:, slack]], format="csc") \
            if len(slack) else A[:, struct].tocsc()
        # keep pool order consistent with the hstack order
        pool = np.concatenate([pool[pool < n], pool[pool >= n]])
        self.pool = pool

        Z = basis.lu.solve_dense_block(
            np.asarray(Apool.todense(), dtype=np.float64, order="C"),
            False)                                   # B Z = AI_pool (m, p)
        invD2 = 1.0 / np.clip(D2, 1e-300, None)
        lev = (Z * Z).T @ invD2                      # (p, B)
        score = W[pool, :] * lev
        score[~np.isfinite(score)] = 0.0

        r = min(r, p)
        sel = np.argpartition(-score, r - 1, axis=0)[:r]     # (r, B)
        ssel = np.take_along_axis(score, sel, axis=0)
        keep = ssel > tau                                     # (r, B)
        if not keep.any():
            self.active = False
            return
        wsel = np.take_along_axis(W[pool, :], sel, axis=0)
        wsel = np.where(keep, wsel, 0.0)

        # per-scenario P_k U_k via one blocked B' solve: column (j, k) is
        # B'^{-T}( D2_k^{-1} Z[:, sel_jk] ); dropped slots zeroed
        ZS = Z[:, sel]                               # (m, r, B)
        T = ZS * invD2[:, None, :]
        T = np.where(keep[None, :, :], T, 0.0)
        PU = basis.lu.solve_dense_block(
            np.ascontiguousarray(T.reshape(m, r * B)), True)
        self.PU = PU.reshape(m, r, B)

        # G_k = diag(1/w_sel) + U'PU (dropped slots -> identity rows)
        APU = (Apool.T @ PU.reshape(m, r * B)).reshape(p, r, B)
        G = np.empty((B, r, r))
        for k in range(B):
            G[k] = APU[sel[:, k], :, k]
        G = 0.5 * (G + np.transpose(G, (0, 2, 1)))
        with np.errstate(divide="ignore"):
            dinv = np.where(keep, 1.0 / np.maximum(wsel, 1e-300), 0.0)
        kz = ~keep.T                                  # (B, r)
        G[~np.isfinite(G)] = 0.0
        G = np.where(kz[:, :, None] | kz[:, None, :], 0.0, G)
        ii = np.arange(r)
        G[:, ii, ii] += np.where(kz, 1.0, dinv.T)
        # tiny ridge keeps borderline selections factorizable
        G[:, ii, ii] += 1e-12 * np.abs(G[:, ii, ii])
        try:
            self._L = np.linalg.cholesky(G)
        except np.linalg.LinAlgError:
            self.active = False
            return
        self.sel = sel
        self.ApoolT = Apool.T.tocsr()

    def apply(self, PV: np.ndarray) -> np.ndarray:
        """Given PV = M0^{-1} V (m, B), returns the SMW-corrected
        M^{-1} V."""
        if not self.active:
            return PV
        T = self.ApoolT @ PV                         # (p, B)
        t = np.take_along_axis(T, self.sel, axis=0)  # (r, B)
        # batched G_k coef_k = t_k via the stored Cholesky factors
        tb = t.T[:, :, None]                         # (B, r, 1)
        z = np.linalg.solve(self._L, tb)
        coef = np.linalg.solve(np.transpose(self._L, (0, 2, 1)),
                               z)[:, :, 0].T         # (r, B)
        return PV - np.einsum("mrk,rk->mk", self.PU, coef)


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
        self.correction = None      # optional SharedBasisLowRank

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
        """M^{-1} V = B'^{-T}(D^{-2} (B^{-1} V)) via blocked solves, with
        the optional per-scenario low-rank SMW correction on top."""
        Z = self.basis.lu.solve_dense_block(V, False)    # B Z = V  (slots)
        Z /= self._D2
        out = self.basis.lu.solve_dense_block(Z, True)   # B' out = Z (rows)
        if self.correction is not None:
            out = self.correction.apply(out)
        return out

    # -- preconditioned CR with per-scenario freeze -----------------------
    def solve(self, RHS: np.ndarray, tol, maxiter: int = -1
              ) -> Tuple[np.ndarray, np.ndarray, int]:
        """Returns (Y (m,B), converged mask (B,), iters). tol may be a
        scalar or a per-scenario (B,) vector (per-lane termination — a
        single min-tol would force every lane to the tightest lane's
        target)."""
        tol = np.asarray(tol)
        m, B = self.m, self.B
        if maxiter < 0:
            maxiter = m + 100
        RHS = np.asarray(RHS, dtype=np.float64)
        # a lane can overflow on the very iteration its recurrence breaks
        # down; the nonfinite-cdot guard freezes it on the next test, so
        # the transient overflow is by-design and must not warn
        with np.errstate(over="ignore", invalid="ignore",
                         divide="ignore"):
            return self._solve_loop(RHS, tol, maxiter)

    def _solve_loop(self, RHS, tol, maxiter):
        m, B = self.m, self.B
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
        self._use_correction = False
        # basis refresh machinery: the shared basis must FOLLOW the batch's
        # weight trajectory (the single-LP phase 2 re-runs maxvolume every
        # IPM iteration, reference: src/kkt_solver_basis.cc:44-57); a basis
        # refined for the mean scenario's final weights is a poor
        # preconditioner at the polish's starting mu and CR maxes out
        from ..control import Control
        self._ctrl = Control()
        self._ctrl.parameters.display = 0
        self.basis_updates = 0
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
        if self._use_correction:
            try:
                cr.correction = SharedBasisLowRank(
                    self.basis, np.asarray(W), cr._D2)
            except Exception:
                cr.correction = None
        Y, ok, iters = cr.solve(np.asarray(RHS), np.asarray(tol),
                                self.cr_maxiter)
        self.total_cr_iters += iters
        return Y, iters

    def _weights_of(self, S):
        """Per-scenario KKT weights from a batched state (same formula as
        BatchedPhase1Solver._ipm_step)."""
        ph = self._ph1
        st = ph.static
        finl = np.asarray(st["finl"])[:, None]
        finu = np.asarray(st["finu"])[:, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            G = np.where(finl, S["ZL"] / S["XL"], 0.0) \
                + np.where(finu, S["ZU"] / S["XU"], 0.0)
            mu = np.asarray(ph._mu_of(S))
            pos = np.where(G > 0, G, np.inf)
            regval = np.minimum(mu, pos.min(axis=0))
            W = np.where(G > 0, 1.0 / G, 1.0 / regval)
        return W

    def _refresh_basis(self, S) -> None:
        """Maxvolume refresh of the shared basis against the batch's
        central scaling (geometric mean of per-scenario factors over
        unconverged lanes), then refactorize when the update machinery
        asks for it. Failures leave the previous basis in place."""
        from ..basis.maxvolume import Maxvolume
        try:
            W = self._weights_of(S)
            active = ~np.asarray(S["done"])
            if not active.any():
                return
            Wa = np.clip(W[:, active], 1e-150, 1e150)
            colscale = np.sqrt(np.exp(np.mean(np.log(Wa), axis=1)))
            mv = Maxvolume(self._ctrl)
            err = mv.run_heuristic(colscale, self.basis)
            if err:
                return
            self.basis_updates += mv.updates
            if (not self.basis.factorization_is_fresh
                    and self.basis.lu.need_fresh_factorization()):
                self.basis.factorize()
        except Exception:
            pass

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
            B = best_mu.shape[0]
            since_improve = np.zeros(B, dtype=np.int64)   # per-lane stall
            for _ in range(self.maxiter):
                self._refresh_basis(S)
                S = {k: np.asarray(v) for k, v in ph._ipm_step(S).items()}
                if bool(np.all(S["done"])):
                    break
                # Per-lane stagnation tracking: the shared basis
                # preconditions well only while a scenario's iterate stays
                # near the scaling it was refined for, and lanes stall
                # INDIVIDUALLY (an off-mean lane can plateau for the whole
                # run while the rest still improve). Judge each lane
                # against its own best complementarity over a window.
                mu = np.asarray(ph._mu_of(S))
                active = ~np.asarray(S["done"])
                improved = mu < 0.9 * best_mu
                best_mu = np.minimum(best_mu, mu)
                since_improve = np.where(improved, 0, since_improve + 1)
                stalled = active & (since_improve >= 3)
                # first response to a stalling lane: switch on the
                # per-scenario low-rank preconditioner correction
                # (off-mean lanes stall because the shared basis misses
                # their grown nonbasic weights) and give the stalled lanes
                # a fresh window before giving up
                if stalled.any() and not self._use_correction:
                    self._use_correction = True
                    since_improve[stalled] = 0
                # exit once every active lane has been flat for 15 steps
                # (the caller hands those lanes to per-scenario finishes)
                if active.any() and bool(
                        np.all(since_improve[active] >= 15)):
                    break
            S["pobj"] = np.sum(np.asarray(ph.cT) * S["X"], axis=0)
            S["mu"] = np.asarray(ph._mu_of(S))
        return S
