"""Pallas SpMM kernel: correctness in interpreter mode (the target backend's
remote Mosaic compiler cannot lower cross-sublane gathers at scale; see
docs/PERFORMANCE.md)."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ipx_tpu.ops.pallas_spmm import PallasNormalMatrix, PallasSpmmOperand


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = PallasSpmmOperand.interpret
    PallasSpmmOperand.interpret = True
    yield
    PallasSpmmOperand.interpret = old


@pytest.mark.parametrize("m,n,density,seed", [(300, 500, 0.02, 0),
                                              (700, 900, 0.01, 1),
                                              (100, 2000, 0.05, 2)])
def test_spmm_matches_scipy(m, n, density, seed):
    rng = np.random.default_rng(seed)
    A = sp.random(m, n, density=density,
                  random_state=np.random.RandomState(seed), format="csr")
    op = PallasSpmmOperand(A, 128)
    U = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
    out = np.asarray(op.apply(U))
    ref = A @ np.asarray(U)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(out - ref).max() / scale < 1e-5


def test_normal_apply_matches():
    rng = np.random.default_rng(3)
    m, n, B = 400, 600, 128
    A = sp.random(m, n, density=0.02,
                  random_state=np.random.RandomState(3), format="csc")
    nm = PallasNormalMatrix(A, B)
    W = jnp.asarray(rng.uniform(0.5, 2.0, (n + m, B)).astype(np.float32))
    V = jnp.asarray(rng.standard_normal((m, B)).astype(np.float32))
    out = np.asarray(nm.apply_batched(W, V))
    Wn = np.asarray(W, dtype=np.float64)
    Vn = np.asarray(V, dtype=np.float64)
    ref = A @ ((A.T @ Vn) * Wn[:n]) + Wn[n:] * Vn
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5
