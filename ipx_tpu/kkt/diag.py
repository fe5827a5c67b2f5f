"""Phase-1 KKT solver: normal equations + CR with diagonal preconditioner.

Counterpart of the reference diag KKT solver (reference:
src/kkt_solver_diag.{h,cc}). The KKT system

    [ W^{-1}  AI' ] (x) = (a)
    [ AI       0  ] (y)   (b)

is reduced to normal equations (AI W AI') y = AI W a - b, solved by CR, and
x is recovered so the residual sits only in rows of the slack basis; the
residual-scaling vector 1/sqrt(W_slack) makes the CR termination test match
the KKT-solver contract (reference: src/kkt_solver_diag.cc:67-81).

For free variables W[j] = 1/regval with regval = min(mu, smallest nonzero g)
(reference: src/kkt_solver_diag.cc:24-49).

The CR loop runs either on host (numpy) or fully on device as a jitted
lax.while_loop (see ipx_tpu.ops.device_cr), selected by Parameters.device.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..control import Control
from ..info import Info
from ..model import Model
from .base import KKTSolver
from .cr import ConjugateResiduals
from .diagonal_precond import DiagonalPrecond
from .normal_matrix import NormalMatrix


class KKTSolverDiag(KKTSolver):
    def __init__(self, control: Control, model: Model):
        self.control = control
        self.model = model
        self.normal_matrix = NormalMatrix(model)
        self.precond = DiagonalPrecond(model)
        nm = model.num_var_all
        self.W = np.ones(nm)
        self.resscale = np.ones(model.num_rows)
        self.maxiter = -1
        self._iters = 0
        self.factorized = False
        self._device_cr = None

    def _factorize(self, iterate, info: Info) -> None:
        md = self.model
        m, n = md.num_rows, md.num_cols
        self._iters = 0
        self.factorized = False

        if iterate is not None:
            with np.errstate(divide="ignore"):
                g = np.where(iterate.barrier_lb_mask,
                             iterate.zl / iterate.xl, 0.0) \
                    + np.where(iterate.barrier_ub_mask,
                               iterate.zu / iterate.xu, 0.0)
            # regularization for free variables: min(mu, min nonzero g)
            nz = g[g != 0.0]
            regval = min(iterate.mu(), float(nz.min()) if nz.size
                         else iterate.mu())
            with np.errstate(divide="ignore"):
                W = 1.0 / g
            W[~np.isfinite(W)] = 1.0 / regval
            self.W = W
        else:
            self.W = np.ones(n + m)

        self.resscale = 1.0 / np.sqrt(self.W[n:])
        self.normal_matrix.prepare(self.W)
        self.precond.factorize(self.W,
                               bool(self.control.parameters.precond_dense_cols),
                               info)
        if info.errflag:
            return
        self._prepare_device()
        self.factorized = True

    def _prepare_device(self) -> None:
        """Set up the on-device CR solver when enabled."""
        self._device_cr = None
        params = self.control.parameters
        if params.device == "cpu":
            return
        try:
            from ..ops.device_cr import DeviceNormalCR
        except Exception:
            return
        if params.device == "auto" and not DeviceNormalCR.worthwhile(
                self.model):
            return
        if self.precond.Adense is not None:
            return      # dense-column SMW precond runs on host for now
        try:
            self._device_cr = DeviceNormalCR(self.model, self.W,
                                             self.precond.diagonal,
                                             self.resscale)
        except Exception:
            self._device_cr = None

    def _solve(self, a: np.ndarray, b: np.ndarray, tol: float, info: Info):
        md = self.model
        m, n = md.num_rows, md.num_cols
        assert self.factorized

        # rhs = AI*W*a - b
        wa = self.W * a
        rhs = md.AI_mul(wa) - b

        y = np.zeros(m)
        self.normal_matrix.reset_time()
        self.precond.reset_time()

        if self._device_cr is not None:
            y, iters, errflag, cr_time, mv_time = self._device_cr.solve(
                rhs, tol, self.maxiter)
            info.errflag = errflag
            info.kktiter1 += iters
            info.time_cr1 += cr_time
            info.time_cr1_AAt += mv_time
            self._iters += iters
        else:
            cr = ConjugateResiduals(self.control)
            cr.solve(self.normal_matrix, rhs, tol, self.resscale,
                     self.maxiter, y, P=self.precond)
            info.errflag = cr.errflag
            info.kktiter1 += cr.iter
            info.time_cr1 += cr.time
            info.time_cr1_AAt += self.normal_matrix.time
            info.time_cr1_pre += self.precond.time
            self._iters += cr.iter

        # Recover solution to the KKT system: x = W*(a - AI'y) for structural
        # part; x_slack = b - A*x_struct keeps residual in the slack rows.
        aty = md.AIt_mul(y)
        x = np.empty(n + m)
        x[:n] = self.W[:n] * (a[:n] - aty[:n])
        x[n:] = b - md.A @ x[:n]
        return x, y

    def _iter(self) -> int:
        return self._iters
