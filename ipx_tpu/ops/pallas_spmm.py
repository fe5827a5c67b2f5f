"""Pallas TPU kernel: batched sparse matrix product A @ U (SpMM).

The TPU-native formulation of the solver's hot product for scenario batches,
designed around what the Mosaic/TPU pipeline actually supports (no scatter;
gather only with table shape == output shape):

 - nonzeros are packed on host into row-blocks: for each block of RB output
   rows, its nnz (padded to a uniform K) as (vals, cols, local_rows);
 - the dense operand U (ncols, B) is swept in K-row PANELS; each panel is
   gathered per-lane with jnp.take_along_axis(panel (K,B), idx (K,B), axis=0)
   — the one gather form Mosaic lowers — masked to the nonzeros whose column
   lies in the panel, and accumulated into a (K,B) contribution scratch;
 - the segment reduction onto the RB block rows is ONE one-hot matmul
   (RB x K) @ (K x B) on the MXU (scatter-free, measured >100 TFLOP/s-class
   on v5e).

float32. Grid is (num_blocks, num_panels) with the output block revisited
across the panel dimension.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

RB = 256          # output rows per block
LANES = 128       # batch lanes


def _round_up(x, mult):
    return -(-x // mult) * mult


class PallasSpmmOperand:
    """Host-side packing of a CSR matrix for the pallas SpMM kernel."""

    interpret = False      # class-wide: run kernels in interpreter mode

    def __init__(self, A_csr: sp.csr_matrix, batch: int = LANES,
                 k_block: Optional[int] = None):
        import jax.numpy as jnp
        A_csr = A_csr.tocsr()
        A_csr.sort_indices()
        m, n = A_csr.shape
        self.m, self.n = m, n
        self.batch = batch

        G = max(1, -(-m // RB))
        indptr = A_csr.indptr
        block_nnz = [int(indptr[min((g + 1) * RB, m)] - indptr[g * RB])
                     for g in range(G)]
        K = k_block or max(128, _round_up(max(block_nnz + [1]), 128))
        self.G, self.K = G, K
        self.n_pad = _round_up(max(n, K), K)
        self.P = self.n_pad // K
        self.m_pad = G * RB

        vals = np.zeros((G, K), dtype=np.float32)
        cols = np.zeros((G, K), dtype=np.int32)
        lrow = np.zeros((G, K), dtype=np.int32)
        for g in range(G):
            lo = indptr[g * RB]
            hi = indptr[min((g + 1) * RB, m)]
            nz = hi - lo
            if nz > K:
                raise ValueError("k_block too small for block nnz")
            vals[g, :nz] = A_csr.data[lo:hi]
            cols[g, :nz] = A_csr.indices[lo:hi]
            rows = np.repeat(
                np.arange(g * RB, min((g + 1) * RB, m)),
                np.diff(indptr[g * RB:min((g + 1) * RB, m) + 1]))
            lrow[g, :nz] = (rows - g * RB).astype(np.int32)
        # flattened 1D so the pallas blocks are (K,) with K % 128 == 0
        self.vals = jnp.asarray(vals.reshape(-1))
        self.cols = jnp.asarray(cols.reshape(-1))
        self.lrow = jnp.asarray(lrow.reshape(-1))
        self._fn = None

    # ------------------------------------------------------------------
    def _build(self):
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        G, K, P, B = self.G, self.K, self.P, self.batch

        def kernel(vals_ref, cols_ref, lrow_ref, u_ref, o_ref, acc_ref):
            p = pl.program_id(1)

            @pl.when(p == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            base = p * K
            cols = cols_ref[:]                      # (K,)
            idxl = cols - base
            mask = (idxl >= 0) & (idxl < K)
            idxc = jnp.where(mask, idxl, 0).astype(jnp.int32)
            idx2 = jnp.broadcast_to(idxc[:, None], (K, B))
            gathered = jnp.take_along_axis(u_ref[:], idx2, axis=0)
            contrib = jnp.where(mask[:, None],
                                vals_ref[:][:, None] * gathered, 0.0)
            acc_ref[:] = acc_ref[:] + contrib

            @pl.when(p == P - 1)
            def _():
                # one-hot segment reduction on the MXU
                lr = lrow_ref[:]                     # (K,)
                onehot = (jax.lax.broadcasted_iota(jnp.int32, (RB, K), 0)
                          == lr[None, :]).astype(jnp.float32)
                o_ref[:] = jnp.dot(onehot, acc_ref[:],
                                   preferred_element_type=jnp.float32)

        grid = (G, P)
        fn = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((K,), lambda g, p: (g,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K,), lambda g, p: (g,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K,), lambda g, p: (g,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, self.batch), lambda g, p: (p, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RB, self.batch), lambda g, p: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((self.m_pad, self.batch),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((K, self.batch), jnp.float32)],
            interpret=self.interpret,
        )
        return fn

    def apply(self, U):
        """A @ U for U (n, B) float32 (jax array); returns (m, B)."""
        import jax.numpy as jnp
        if self._fn is None:
            self._fn = self._build()
        if U.shape[0] != self.n_pad:
            U = jnp.concatenate(
                [U, jnp.zeros((self.n_pad - U.shape[0], U.shape[1]),
                              dtype=U.dtype)], axis=0)
        out = self._fn(self.vals, self.cols, self.lrow, U.astype(jnp.float32))
        return out[:self.m]


class PallasNormalMatrix:
    """Batched AI W AI' apply in f32 via two pallas SpMMs."""

    def __init__(self, A_csc: sp.csc_matrix, batch: int = LANES):
        A_csr = A_csc.tocsr()
        self.m, self.n = A_csc.shape
        self.op_A = PallasSpmmOperand(A_csr, batch)          # A u
        self.op_At = PallasSpmmOperand(A_csc.T.tocsr(), batch)   # A' v

    def apply_batched(self, W, V):
        """C V = A (W_struct * (A' V)) + W_slack * V; W (n+m, B) f32."""
        U = self.op_At.apply(V)
        U = U * W[:self.n]
        out = self.op_A.apply(U)
        return out + W[self.n:] * V
