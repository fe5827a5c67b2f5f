"""Differential tests of the native LU kernel against direct solves."""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from ipx_tpu.basis.indexed_vector import IndexedVector
from ipx_tpu.basis.lu import NativeLu


def random_basis(m, density=0.05, seed=0):
    rng = np.random.default_rng(seed)
    B = sp.random(m, m, density=density, random_state=np.random.RandomState(
        seed), format="csc")
    # make it comfortably nonsingular
    B = B + sp.diags(rng.uniform(1.0, 2.0, size=m))
    B = B.tocsc()
    B.sort_indices()
    return B


def csc_arrays(B):
    return (B.indptr[:-1].astype(np.int64), B.indptr[1:].astype(np.int64),
            B.indices.astype(np.int64), B.data.astype(np.float64))


@pytest.mark.parametrize("m,density,seed", [(10, 0.3, 0), (50, 0.1, 1),
                                            (200, 0.02, 2), (500, 0.01, 3)])
def test_factorize_and_solve(m, density, seed):
    B = random_basis(m, density, seed)
    lu = NativeLu(m)
    status = lu.factorize(*csc_arrays(B), strict_abs_pivottol=False)
    assert status == 0, f"unexpected status {status}"

    rng = np.random.default_rng(seed + 100)
    b = rng.standard_normal(m)
    x = lu.solve_dense(b, trans=False)
    assert np.allclose(B @ x, b, atol=1e-8 * max(1, np.abs(b).max()))
    y = lu.solve_dense(b, trans=True)
    assert np.allclose(B.T @ y, b, atol=1e-8 * max(1, np.abs(b).max()))


def test_get_factors_identity():
    m = 80
    B = random_basis(m, 0.08, 7)
    lu = NativeLu(m)
    assert lu.factorize(*csc_arrays(B), False) == 0
    L, U, rowperm, colperm, dep = lu.get_factors()
    assert dep.size == 0
    PBQ = B[rowperm][:, colperm].toarray()
    rec = (L.toarray() + np.eye(m)) @ U.toarray()
    assert np.allclose(PBQ, rec, atol=1e-10 * np.abs(B.data).max())


def test_sparse_ftran_btran():
    m = 300
    B = random_basis(m, 0.01, 5)
    lu = NativeLu(m)
    assert lu.factorize(*csc_arrays(B), False) == 0
    # sparse rhs
    bi = np.array([3, 77, 150], dtype=np.int64)
    bx = np.array([1.0, -2.0, 0.5])
    out = IndexedVector(m)
    lu.ftran_for_update(bi, bx, out)
    b = np.zeros(m)
    b[bi] = bx
    assert np.allclose(B @ out.values, b, atol=1e-8)
    # btran of unit vector at basis position p: B' y = e_p
    out2 = IndexedVector(m)
    lu.btran_for_update(42, out2)
    e = np.zeros(m)
    e[42] = 1.0
    assert np.allclose(B.T @ out2.values, e, atol=1e-8)


def test_updates():
    m = 60
    rng = np.random.default_rng(11)
    B = random_basis(m, 0.1, 9).tolil()
    lu = NativeLu(m)
    Bc = B.tocsc()
    assert lu.factorize(*csc_arrays(Bc), False) == 0

    for it in range(15):
        # replace a random column with a random sparse vector
        p = int(rng.integers(m))
        nz = rng.choice(m, size=5, replace=False)
        vals = rng.standard_normal(5)
        vals[0] += 3.0   # keep well conditioned-ish
        a = np.zeros(m)
        a[nz] = vals

        sol = IndexedVector(m)
        lu.ftran_for_update(nz.astype(np.int64), vals, sol)
        piv = sol.values[p]
        if abs(piv) < 1e-8:
            continue
        lu.btran_for_update(p)
        status = lu.update(piv)
        assert status >= 0
        B[:, p] = a.reshape(-1, 1)
        Bc = B.tocsc()

        b = rng.standard_normal(m)
        x = lu.solve_dense(b, trans=False)
        assert np.allclose(Bc @ x, b, atol=1e-6), f"ftran broken at {it}"
        y = lu.solve_dense(b, trans=True)
        assert np.allclose(Bc.T @ y, b, atol=1e-6), f"btran broken at {it}"


def test_singular_patching():
    # B with a dependent column: col 3 = col 1
    m = 6
    rng = np.random.default_rng(2)
    B = rng.standard_normal((m, m))
    B[:, 3] = B[:, 1]
    Bc = sp.csc_matrix(B)
    lu = NativeLu(m)
    status = lu.factorize(*csc_arrays(Bc), False)
    assert status & 2
    L, U, rowperm, colperm, dep = lu.get_factors()
    assert dep.size >= 1
    # patched B (dependent cols replaced by unit cols) = (L+I)U
    PBQ = Bc[rowperm][:, colperm].toarray()
    for k in dep:
        PBQ[:, k] = 0.0
        PBQ[k, k] = 1.0
    rec = (L.toarray() + np.eye(m)) @ U.toarray()
    # only the unit patch column should differ from original in pattern;
    # compare patched vs reconstruction
    assert np.allclose(PBQ, rec, atol=1e-8), \
        f"max diff {np.abs(PBQ-rec).max()}"


def test_slack_identity_basis():
    # all-slack basis (identity) is the simplest basis in the solver
    m = 40
    I = sp.identity(m, format="csc")
    lu = NativeLu(m)
    assert lu.factorize(*csc_arrays(I), False) == 0
    b = np.arange(1.0, m + 1)
    assert np.allclose(lu.solve_dense(b, False), b)
    assert np.allclose(lu.solve_dense(b, True), b)


def test_generic_lu_kernel_full_solve():
    """lu_kernel=1 selects the generic (dense) kernel; the full pipeline —
    including the phase-2 splitted-normal triangular solves and crossover —
    must produce the same solution as the native kernel (reference seam:
    src/basis.cc:24-29 lu_kernel dispatch)."""
    from ipx_tpu import LpSolver, Parameters
    from lp_fixtures import afiro, AFIRO_OBJECTIVE

    objs = []
    for kernel in (0, 1):
        p = Parameters()
        p.display = 0
        p.device = "cpu"
        p.lu_kernel = kernel
        s = LpSolver(p)
        assert afiro().load_into(s) == 0
        assert s.solve() == 1000
        objs.append(s.get_info().objval)
    assert objs[0] == pytest.approx(AFIRO_OBJECTIVE, rel=1e-7)
    assert objs[1] == pytest.approx(objs[0], rel=1e-7)


def test_blocked_ftran_matches_single():
    """ftran_block_build/ftran_from_block (the multi-RHS candidate solver
    used by maxvolume / drop-dual / crossover pushes) must reproduce
    ftran_for_update exactly, including the eta chain correction."""
    import ctypes as ct
    import scipy.sparse as sp
    from ipx_tpu.basis.basis import Basis
    from ipx_tpu.basis.indexed_vector import IndexedVector
    from ipx_tpu.control import Control
    from ipx_tpu.model import Model
    from ipx_tpu.presolve import Presolver
    from ipx_tpu.user_model import UserModel
    from lp_fixtures import random_lp

    a = random_lp(80, 160, density=0.3, seed=13)
    um = UserModel()
    assert um.load(a["num_constr"], a["num_var"], a["Ap"], a["Ai"], a["Ax"],
                   a["rhs"], a["constr_type"], a["obj"], a["lb"],
                   a["ub"]) == 0
    md = Model()
    ctrl = Control()
    ctrl.parameters.display = 0
    Presolver(um, md).presolve_model(ctrl)
    m, n = md.num_rows, md.num_cols

    basis = Basis(ctrl, md)
    basis.set_to_slack_basis()
    basis.factorize()
    # pivot some structural columns in to give the basis fill and create a
    # PFI eta chain
    lhs = IndexedVector(m)
    rng = np.random.default_rng(0)
    for j in rng.permutation(n)[:30]:
        basis.solve_for_update(int(j), lhs)
        nz = lhs.nonzero_indices()
        vals = np.abs(lhs.values[nz])
        k = int(np.argmax(vals))
        if vals[k] < 1e-3:
            continue
        p = int(nz[k])
        jb = int(basis.basis[p])
        err, exchanged = basis.exchange_if_stable(jb, int(j),
                                                  lhs.values[p], -1)
        assert err == 0
    lu = basis.lu
    if not hasattr(lu, "lib"):
        pytest.skip("native kernel unavailable")
    # bind model arrays (the xover ctx does this binding)
    from ipx_tpu.basis.crossover import _xover_native_ctx
    ctx = _xover_native_ctx(basis)
    assert ctx is not None
    lib, handle = ctx
    if not hasattr(lib, "_blockdbg_ready"):
        I = ct.c_int64
        IA = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        DA = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.ipxlu_ftran_block_debug.restype = I
        lib.ipxlu_ftran_block_debug.argtypes = [ct.c_void_p, IA, I, DA]
        lib._blockdbg_ready = True

    cols = np.ascontiguousarray(
        rng.permutation(n + m)[:8], dtype=np.int64)
    out = np.zeros(8 * m)
    assert lib.ipxlu_ftran_block_debug(handle, cols, 8, out) == 0

    for t, j in enumerate(cols):
        ref = IndexedVector(m)
        lu.ftran_for_update(*md.AI_col(int(j)), lhs=ref)
        got = out[t * m:(t + 1) * m]
        scale = max(1.0, np.abs(ref.values).max())
        assert np.abs(got - ref.values).max() / scale < 1e-12


def test_solve_dense_block_matches_single():
    """Blocked multi-RHS B/B' solves match per-column solve_dense, with a
    PFI eta chain in place."""
    from ipx_tpu.basis.basis import Basis
    from ipx_tpu.basis.indexed_vector import IndexedVector
    from ipx_tpu.control import Control
    from ipx_tpu.model import Model
    from ipx_tpu.presolve import Presolver
    from ipx_tpu.user_model import UserModel
    from lp_fixtures import random_lp

    a = random_lp(70, 120, density=0.25, seed=4)
    um = UserModel()
    assert um.load(a["num_constr"], a["num_var"], a["Ap"], a["Ai"], a["Ax"],
                   a["rhs"], a["constr_type"], a["obj"], a["lb"],
                   a["ub"]) == 0
    md = Model()
    ctrl = Control()
    ctrl.parameters.display = 0
    Presolver(um, md).presolve_model(ctrl)
    m, n = md.num_rows, md.num_cols

    basis = Basis(ctrl, md)
    basis.set_to_slack_basis()
    basis.factorize()
    lhs = IndexedVector(m)
    rng = np.random.default_rng(1)
    for j in rng.permutation(n)[:25]:     # create fill + an eta chain
        basis.solve_for_update(int(j), lhs)
        nz = lhs.nonzero_indices()
        vals = np.abs(lhs.values[nz])
        k = int(np.argmax(vals))
        if vals[k] < 1e-3:
            continue
        p = int(nz[k])
        err, _ = basis.exchange_if_stable(int(basis.basis[p]), int(j),
                                          lhs.values[p], -1)
        assert err == 0
    lu = basis.lu
    if not hasattr(lu, "solve_dense_block"):
        pytest.skip("native kernel unavailable")

    W = 7
    RHS = rng.standard_normal((m, W))
    for trans in (False, True):
        X = lu.solve_dense_block(RHS, trans)
        for t in range(W):
            ref = lu.solve_dense(RHS[:, t], trans)
            scale = max(1.0, np.abs(ref).max())
            assert np.abs(X[:, t] - ref).max() / scale < 1e-12, (trans, t)


def test_interleaved_staged_ftrans_no_stale_entries():
    """Pattern-based FTRAN staging (round 4) clears exactly the previous
    call's nonzeros: consecutive stagings with different sparse patterns
    must each match the dense solve, including after updates (a stale
    entry from staging k-1 leaking into staging k would corrupt the
    PFI eta built from the staged spike)."""
    m = 400
    rng = np.random.default_rng(17)
    B = random_basis(m, 0.008, 23).tocsc()
    lu = NativeLu(m)
    assert lu.factorize(*csc_arrays(B), False) == 0
    Bd = B.toarray()
    cols = np.eye(m)
    for it in range(30):
        k = int(rng.integers(1, 6))
        nz = np.sort(rng.choice(m, size=k, replace=False)).astype(np.int64)
        vals = rng.standard_normal(k)
        out = IndexedVector(m)
        lu.ftran_for_update(nz, vals, out)
        b = np.zeros(m)
        b[nz] = vals
        ref = np.linalg.solve(Bd, b)
        assert np.allclose(out.values, ref, atol=1e-7), it
        # occasionally exchange a column so eta chains + refreshes engage
        if it % 4 == 3:
            p = int(np.argmax(np.abs(out.values)))
            if abs(out.values[p]) > 1e-6:
                lu.btran_for_update(p)
                if lu.update(out.values[p]) == 0:
                    Bd[:, p] = b
