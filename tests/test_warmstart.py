"""IPM warm start: user-supplied interior point skips the initial phase
(reference: src/lp_solver.cc:337-347, src/ipm.cc:261-316)."""
import numpy as np
import pytest

from ipx_tpu import LpSolver, Parameters
from ipx_tpu.status import Errflag, SolveStatus, Status

from lp_fixtures import afiro, AFIRO_OBJECTIVE


def params(**kw):
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def test_warm_start_from_previous_solve():
    # first solve cold to obtain an interior point
    s1 = LpSolver(params(dualize=0))
    assert afiro().load_into(s1) == 0
    s1.solve()
    sol = s1.get_interior_solution()
    assert sol is not None

    # second solve warm started from it
    s2 = LpSolver(params(dualize=0))
    assert afiro().load_into(s2) == 0
    rc = s2.load_ipm_starting_point(sol.x, sol.xl, sol.xu, sol.slack,
                                    sol.y, sol.zl, sol.zu)
    assert rc == 0
    s2.solve()
    info = s2.get_info()
    assert info.status == int(Status.SOLVED)
    assert info.objval == pytest.approx(AFIRO_OBJECTIVE, abs=1e-6)
    # warm start skips the initial iterations: strictly fewer IPM iters
    assert info.iter <= s1.get_info().iter


def test_warm_start_rejected_when_dualized():
    s1 = LpSolver(params(dualize=0))
    assert afiro().load_into(s1) == 0
    s1.solve()
    sol = s1.get_interior_solution()

    s2 = LpSolver(params(dualize=1))
    assert afiro().load_into(s2) == 0
    assert s2.load_ipm_starting_point(sol.x, sol.xl, sol.xu, sol.slack,
                                      sol.y, sol.zl, sol.zu) == 0
    # solver logs that the point is ignored but still solves
    s2.solve()
    assert s2.get_info().status == int(Status.SOLVED)


def test_invalid_starting_point_rejected():
    s = LpSolver(params())
    assert afiro().load_into(s) == 0
    nv, nc = s.user_model.num_var, s.user_model.num_constr
    x = np.zeros(nv)
    xl = np.full(nv, -1.0)          # invalid: xl must be >= 0
    xu = np.full(nv, np.inf)
    rc = s.load_ipm_starting_point(x, xl, xu, np.zeros(nc), np.zeros(nc),
                                   np.zeros(nv), np.zeros(nv))
    assert rc == int(Errflag.INVALID_VECTOR)
