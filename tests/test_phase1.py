"""Phase-1 (diagonal-preconditioned) IPM end-to-end tests: solve small LPs
to optimality with the basis phase disabled (stop_at_switch=-1, the debug
path of the reference, reference: src/lp_solver.cc:423-426)."""
import numpy as np
import pytest

from ipx_tpu import LpSolver, Parameters
from ipx_tpu.status import SolveStatus, Status

from lp_fixtures import LPBuilder, afiro, AFIRO_OBJECTIVE


def phase1_params(**kw):
    p = Parameters()
    p.display = 0
    p.crossover = 0
    p.stop_at_switch = -1    # stop at phase switch: phase-1 only
    p.switchiter = 10000     # never switch on KKT-iteration heuristic
    p.device = "cpu"
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def test_afiro_phase1():
    s = LpSolver(phase1_params())
    assert afiro().load_into(s) == 0
    s.solve()
    info = s.get_info()
    # IPM must have converged to tolerance before the (disabled) switch
    assert info.status_ipm == int(SolveStatus.DEBUG)
    assert info.iter > 0
    # postsolved interior solution must be near-optimal
    assert info.pobjval == pytest.approx(AFIRO_OBJECTIVE, abs=1e-3)
    assert info.rel_presidual < 1e-6
    assert info.rel_dresidual < 1e-6
    assert abs(info.rel_objgap) < 1e-7


def test_afiro_phase1_dualized():
    s = LpSolver(phase1_params(dualize=1))
    assert afiro().load_into(s) == 0
    s.solve()
    info = s.get_info()
    assert info.dualized == 1
    assert info.pobjval == pytest.approx(AFIRO_OBJECTIVE, abs=1e-3)
    assert info.rel_presidual < 1e-6
    assert info.rel_dresidual < 1e-6


def test_afiro_phase1_unscaled():
    s = LpSolver(phase1_params(scale=0))
    assert afiro().load_into(s) == 0
    s.solve()
    info = s.get_info()
    assert info.pobjval == pytest.approx(AFIRO_OBJECTIVE, abs=1e-3)


def test_tiny_box_lp():
    # min -x1 - 2 x2  st x1 + x2 <= 3, 0<=x1<=2, 0<=x2<=2 -> obj -5 at (1,2)
    lp = LPBuilder(rhs=[3.0], constr_type="<")
    lp.add_column(-1.0, [0], [1.0], 0.0, 2.0)
    lp.add_column(-2.0, [0], [1.0], 0.0, 2.0)
    s = LpSolver(phase1_params())
    assert lp.load_into(s) == 0
    s.solve()
    info = s.get_info()
    assert info.pobjval == pytest.approx(-5.0, abs=1e-5)
    sol = s.get_interior_solution()
    assert sol.x[0] == pytest.approx(1.0, abs=1e-4)
    assert sol.x[1] == pytest.approx(2.0, abs=1e-4)


def test_free_variable_lp():
    # min x st x >= -7 with x free otherwise: equality via constraint
    # min y st y = x - 5, x in [0,10], y free -> use: min x, x+s=..., keep
    # simple: min c'x with free var pinned by equality constraint
    lp = LPBuilder(rhs=[5.0], constr_type="=")
    lp.add_column(1.0, [0], [1.0], -np.inf, np.inf)   # free var = 5
    s = LpSolver(phase1_params())
    assert lp.load_into(s) == 0
    s.solve()
    info = s.get_info()
    assert info.pobjval == pytest.approx(5.0, abs=1e-5)


def test_interior_solution_sign_conditions():
    s = LpSolver(phase1_params())
    assert afiro().load_into(s) == 0
    s.solve()
    sol = s.get_interior_solution()
    um = s.user_model
    # invariant checks in the style of reference: check/solver.cc:19-58
    assert np.all(np.isfinite(sol.x))
    assert np.all(sol.xl >= 0)
    assert np.all(sol.xu >= 0)
    assert np.all(sol.zl >= 0)
    assert np.all(sol.zu >= 0)
    finl = np.isfinite(um.lb)
    finu = np.isfinite(um.ub)
    assert np.all(np.isinf(sol.xl[~finl]))
    assert np.all(np.isinf(sol.xu[~finu]))
    assert np.all(sol.zl[~finl] == 0)
    assert np.all(sol.zu[~finu] == 0)
    ct = um.constr_type
    assert np.all(sol.slack[ct == "="] == 0)
    assert np.all(sol.slack[ct == "<"] >= 0)
    assert np.all(sol.slack[ct == ">"] <= 0)
    assert np.all(sol.y[ct == "<"] <= 0)
    assert np.all(sol.y[ct == ">"] >= 0)


def test_explicit_normal_matrix_matches_one_pass():
    """The explicit-S CR path (built when fill(S) is small) must produce
    the same values as the one-pass normal-matrix product it replaces."""
    import ctypes as ct
    import scipy.sparse as sp
    from ipx_tpu.native import build

    lib = ct.CDLL(build.build())
    I = ct.c_int64
    D = ct.c_double
    IA = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    IA32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    DA = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.ipxlu_nrm_new.restype = ct.c_void_p
    lib.ipxlu_nrm_new.argtypes = [I, I, IA, IA32, DA, I]
    lib.ipxlu_nrm_nnz.restype = I
    lib.ipxlu_nrm_nnz.argtypes = [ct.c_void_p]
    lib.ipxlu_nrm_values.restype = None
    lib.ipxlu_nrm_values.argtypes = [ct.c_void_p, DA]
    lib.ipxlu_nrm_free.restype = None
    lib.ipxlu_nrm_free.argtypes = [ct.c_void_p]
    lib.ipxlu_cr_diag_explicit.restype = I
    lib.ipxlu_cr_diag_explicit.argtypes = [ct.c_void_p, DA, DA, DA, D, I,
                                           D, DA, ct.POINTER(I)]

    rng = np.random.default_rng(3)
    m, n = 80, 200
    A = sp.random(m, n, density=0.05, random_state=11, format="csc")
    A.data = rng.standard_normal(A.nnz) + 2.0
    Ap = np.ascontiguousarray(A.indptr, np.int64)
    Ai = np.ascontiguousarray(A.indices, np.int32)
    Ax = np.ascontiguousarray(A.data, np.float64)
    W = np.ascontiguousarray(rng.uniform(0.5, 3.0, n + m))

    h = lib.ipxlu_nrm_new(m, n, Ap, Ai, Ax, 10**9)
    assert h
    lib.ipxlu_nrm_values(h, W)
    S = (A @ sp.diags(W[:n]) @ A.T).toarray() + np.diag(W[n:])
    rhs = np.ascontiguousarray(rng.standard_normal(m))
    diag = np.ascontiguousarray(np.diag(S).copy())
    ones = np.ascontiguousarray(np.ones(m))
    y = np.zeros(m)
    it = ct.c_int64(0)
    err = lib.ipxlu_cr_diag_explicit(h, diag, ones, rhs, 1e-10, -1, 0.0,
                                     y, ct.byref(it))
    assert err == 0
    assert np.abs(y - np.linalg.solve(S, rhs)).max() < 1e-7
    lib.ipxlu_nrm_free(h)
    # over-tight fill cap -> symbolic build declines, caller must fall back
    assert not lib.ipxlu_nrm_new(m, n, Ap, Ai, Ax, 10)


def test_explicit_normal_matrix_solve_parity():
    """Full phase-1 solve agrees whether or not the explicit-S path is
    engaged (it is keyed off the fill cap; force-disable via monkeypatch)."""
    from ipx_tpu.kkt.diag import KKTSolverDiag

    def run(disable):
        orig = KKTSolverDiag._prepare_explicit_normal
        if disable:
            KKTSolverDiag._prepare_explicit_normal = \
                lambda self, *a, **k: None
        try:
            s = LpSolver(phase1_params())
            assert afiro().load_into(s) == 0
            s.solve()
            return s.get_info().pobjval
        finally:
            KKTSolverDiag._prepare_explicit_normal = orig

    obj_on, obj_off = run(False), run(True)
    assert obj_on == pytest.approx(AFIRO_OBJECTIVE, rel=1e-6)
    assert obj_off == pytest.approx(AFIRO_OBJECTIVE, rel=1e-6)
