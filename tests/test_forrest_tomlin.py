"""Forrest-Tomlin update kernel (lu_kernel=1).

Kernel-level differential against the dense oracle plus full-solve parity
with the PFI kernel (reference: src/forrest_tomlin.cc semantics — FT update
over the factorization, dense solves, no hypersparsity)."""
import numpy as np
import pytest
import scipy.sparse as sp

from ipx_tpu.basis.indexed_vector import IndexedVector
from ipx_tpu.basis.lu import NativeLu


def _random_basis(m, seed):
    B = sp.random(m, m, density=0.15,
                  random_state=np.random.RandomState(seed)).tolil()
    B.setdiag(B.diagonal() + 3.0)
    return B.tocsc()


def test_ft_solves_match_dense_through_exchanges():
    rng = np.random.default_rng(42)
    m = 50
    B = _random_basis(m, 3)
    lu = NativeLu(m, update_mode=1)
    st = lu.factorize(B.indptr[:-1], B.indptr[1:],
                      B.indices.astype(np.int64), B.data, 0)
    assert st == 0
    Bcur = B.toarray()
    for it in range(25):
        b = rng.standard_normal(m)
        x = lu.solve_dense(b, False)
        assert np.allclose(x, np.linalg.solve(Bcur, b), atol=1e-8)
        y = lu.solve_dense(b, True)
        assert np.allclose(y, np.linalg.solve(Bcur.T, b), atol=1e-8)
        a = sp.random(m, 1, density=0.2,
                      random_state=np.random.RandomState(100 + it)) \
            .toarray().ravel()
        a[rng.integers(m)] += 2.0
        bi = np.nonzero(a)[0].astype(np.int64)
        lu.ftran_for_update(bi, a[bi], IndexedVector(m))
        w = np.linalg.solve(Bcur, a)
        p = int(np.argmax(np.abs(w)))
        lu.btran_for_update(p)
        assert lu.update(w[p]) in (0, 1)
        Bcur[:, p] = a
    assert lu.updates == 25


def test_ft_update_detects_wrong_pivot():
    """The new-diagonal stability check flags a pivot that disagrees with
    the determinant-ratio prediction (contract: update() returns > 0 when
    unstable, reference kFtDiagErrorTol = 1e-8)."""
    m = 30
    B = _random_basis(m, 5)
    lu = NativeLu(m, update_mode=1)
    assert lu.factorize(B.indptr[:-1], B.indptr[1:],
                        B.indices.astype(np.int64), B.data, 0) == 0
    a = np.zeros(m)
    a[7] = 4.0
    a[11] = 1.0
    bi = np.nonzero(a)[0].astype(np.int64)
    lu.ftran_for_update(bi, a[bi], IndexedVector(m))
    w = np.linalg.solve(B.toarray(), a)
    p = int(np.argmax(np.abs(w)))
    lu.btran_for_update(p)
    assert lu.update(w[p] * (1 + 1e-4)) == 1      # inconsistent pivot


@pytest.mark.parametrize("family", ["transport", "grid"])
def test_full_solve_parity_lu_kernel_1(family):
    from ipx_tpu import LpSolver, Parameters
    import ipx_tpu.testgen as tg
    data = (tg.transportation(300, 450, 0.02, 1) if family == "transport"
            else tg.grid_flow(30, 30, seed=1))
    objs = {}
    for lk in (0, 1):
        p = Parameters()
        p.display = 0
        p.device = "cpu"
        p.lu_kernel = lk
        s = LpSolver(p)
        tg.load_into_solver(data, s)
        assert s.solve() == 1000
        objs[lk] = s.get_info().pobjval
    assert objs[1] == pytest.approx(objs[0], rel=1e-7)
