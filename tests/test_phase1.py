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
