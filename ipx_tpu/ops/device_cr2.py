"""Phase-2 (basis-preconditioned) CR on device.

The splitted-normal operator C = I + inv(B~) N~ N~' inv(B~') (reference:
src/splitted_normal_matrix.cc:90-117) is hybrid-mapped to the accelerator:

  * the N~ N~' product and every CR recurrence/reduction run inside ONE
    jitted lax.while_loop (scatter-free SpMV formulation, ops/spmv.py);
  * the B / B' triangular solves — inherently sequential, data-dependent
    sparsity — call back into the native LU kernel via jax.pure_callback.

Shapes are padded to fixed capacities (nnz(N) <= nnz(A) + m, ncols <= n+m)
so ONE compiled program serves every per-IPM-iteration factorize; weights,
scaling and the free-position mask are runtime operands. The callbacks close
over a mutable holder that prepare() repoints at the current basis, keeping
the compiled program valid across factorizes and solves.
"""
from __future__ import annotations

from time import perf_counter
from typing import Optional

import numpy as np

from .spmv import LANES, _pad_to


def _get_jax():
    from .device_cr import _get_jax as g
    return g()


class _CapOperand:
    """SpmvOperand with fixed capacities so recompiles never trigger:
    segment boundary arrays padded with empty segments, value/index arrays
    padded with zeros (index 0 gathers a real element; its value weight is
    0 so it contributes nothing)."""

    def __init__(self, cap_nnz: int, cap_seg: int):
        self.cap_nnz = -(-cap_nnz // LANES) * LANES
        self.cap_seg = cap_seg
        self.R = self.cap_nnz // LANES

    def pack(self, indptr, indices, data):
        """Returns (gather_idx (cap,1), vals (cap,), starts, ends) numpy."""
        nnz = len(data)
        idx = np.zeros(self.cap_nnz, dtype=np.int64)
        idx[:nnz] = indices
        vals = np.zeros(self.cap_nnz, dtype=np.float64)
        vals[:nnz] = data
        nseg = len(indptr) - 1
        starts = np.full(self.cap_seg, nnz, dtype=np.int64)
        ends = np.full(self.cap_seg, nnz, dtype=np.int64)
        starts[:nseg] = indptr[:-1]
        ends[:nseg] = indptr[1:]
        return idx.reshape(-1, 1), vals, starts.reshape(-1, 1), \
            ends.reshape(-1, 1)


def _apply_cap(gather_idx, vals, starts, ends, R, u):
    import jax.numpy as jnp
    from .spmv import flat_cumsum
    g = jnp.take_along_axis(u.reshape(-1, 1), gather_idx, axis=0)[:, 0]
    c = flat_cumsum(vals * g, R)
    cext = jnp.concatenate([jnp.zeros(1, dtype=c.dtype), c])
    hi = jnp.take_along_axis(cext.reshape(-1, 1), ends, axis=0)[:, 0]
    lo = jnp.take_along_axis(cext.reshape(-1, 1), starts, axis=0)[:, 0]
    return hi - lo


class DeviceSplittedCR:
    """Jitted phase-2 CR with host-callback triangular solves.

    One instance per KKT solver; prepare() is called per factorize with the
    current SplittedNormalMatrix (its N, uscale, free positions). solve()
    runs the whole CR loop as one device program.
    """

    def __init__(self, model):
        jax = _get_jax()
        self.jax = jax
        md = model
        self.m = md.num_rows
        self.n = md.num_cols
        m, n = self.m, self.n
        cap_nnz = int(md.A.nnz) + m
        self._opN = _CapOperand(cap_nnz, m)        # N u   (segments = rows)
        self._opNt = _CapOperand(cap_nnz, n + m)   # N' w  (segments = cols)
        self._basis = None                         # repointed by prepare()
        self._fn = None
        self.time_B = 0.0
        self.time_Bt = 0.0

    # -- host callbacks (close over self; identity stable across solves) --
    def _btran_cb(self, v):
        t0 = perf_counter()
        out = self._basis.solve_dense(np.asarray(v, dtype=np.float64), "T")
        self.time_Bt += perf_counter() - t0
        return out

    def _ftran_cb(self, v):
        t0 = perf_counter()
        out = self._basis.solve_dense(np.asarray(v, dtype=np.float64), "N")
        self.time_B += perf_counter() - t0
        return out

    def prepare(self, splitted) -> None:
        """Refreshes the device operands from a prepared
        SplittedNormalMatrix (same math as its host _apply)."""
        N = splitted.N.tocsc()
        N_csr = N.tocsr()
        self._basis = splitted._basis
        jnp = self.jax.numpy
        # N' w: segments = columns (CSC arrays); N u: segments = rows (CSR)
        gi, va, st, en = self._opNt.pack(N.indptr, N.indices, N.data)
        self._nt_args = tuple(map(jnp.asarray, (gi, va, st, en)))
        gi, va, st, en = self._opN.pack(N_csr.indptr, N_csr.indices,
                                        N_csr.data)
        self._n_args = tuple(map(jnp.asarray, (gi, va, st, en)))
        self._uscale = jnp.asarray(splitted.uscale)
        freemask = np.zeros(self.m, dtype=bool)
        freemask[splitted.free_positions] = True
        self._freemask = jnp.asarray(freemask)

    def _build(self):
        jax = self.jax
        jnp = jax.numpy
        m = self.m
        sds = jax.ShapeDtypeStruct((m,), jnp.float64)
        opN, opNt = self._opN, self._opNt

        def apply_C(nt_args, n_args, uscale, freemask, v):
            w = jax.pure_callback(self._btran_cb, sds, v / uscale)
            u = _apply_cap(*nt_args, opNt.R, w)        # N' w  (n+m capacity)
            z = _apply_cap(*n_args, opN.R, u)          # N u   (m,)
            y = jax.pure_callback(self._ftran_cb, sds, z)
            out = y / uscale + v
            out = jnp.where(freemask, 0.0, out)
            return out, jnp.dot(v, out)

        def cr(nt_args, n_args, uscale, freemask, rhs, tol, maxiter):
            def C(v):
                return apply_C(nt_args, n_args, uscale, freemask, v)

            lhs0 = jnp.zeros_like(rhs)
            r0 = rhs
            Cr0, cdot0 = C(r0)
            # state: lhs, r, step, Cstep, cdot, it, err
            state0 = (lhs0, r0, r0, Cr0, cdot0, jnp.int64(0), jnp.int64(0))

            def cond(s):
                lhs, r, d, cd, cdot, it, err = s
                resnorm = jnp.max(jnp.abs(r))
                return (resnorm > tol) & (it < maxiter) & (err == 0)

            def body(s):
                lhs, r, d, cd, cdot, it, err = s
                denom = jnp.dot(cd, cd)
                bad = (cdot <= 0.0) | (denom <= 0.0)
                alpha = jnp.where(bad, 0.0, cdot / denom)
                err = jnp.where(bad, jnp.int64(202), err)
                err = jnp.where(jnp.isfinite(alpha), err, jnp.int64(205))
                lhs = lhs + alpha * d
                r = r - alpha * cd
                Cr, cdot_new = C(r)
                beta = jnp.where(bad, 0.0, cdot_new / cdot)
                d = r + beta * d
                cd = Cr + beta * cd
                return (lhs, r, d, cd, cdot_new, it + 1, err)

            out = jax.lax.while_loop(cond, body, state0)
            lhs, r, *_, it, err = out
            resnorm = jnp.max(jnp.abs(r))
            err = jnp.where((err == 0) & (resnorm > tol), jnp.int64(201),
                            err)
            return lhs, it, err

        self._fn = jax.jit(cr)

    def solve(self, rhs: np.ndarray, tol: float, maxiter: int):
        """Returns (lhs, iters, errflag); contract of the native cr_basis
        (inf-norm termination, 201 iter limit, 202 not posdef, 205 nan)."""
        jax = self.jax
        jnp = jax.numpy
        if self._fn is None:
            self._build()
        if maxiter < 0:
            maxiter = self.m + 100
        self.time_B = self.time_Bt = 0.0
        lhs, it, err = self._fn(self._nt_args, self._n_args, self._uscale,
                                self._freemask,
                                jnp.asarray(rhs, dtype=jnp.float64),
                                jnp.float64(tol), jnp.int64(maxiter))
        jax.block_until_ready(lhs)
        return np.asarray(lhs), int(it), int(err)
