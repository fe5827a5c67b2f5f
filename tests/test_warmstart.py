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


def test_load_starting_basis_public_api():
    """LpSolver.load_starting_basis installs a caller-supplied basis at the
    phase switch: same objective, and the preset actually engages (no
    crash construction => updates_start from the preset fixups only)."""
    import numpy as np
    from ipx_tpu import LpSolver, Parameters
    import ipx_tpu.testgen as tg

    data = tg.transportation(300, 450, 0.02, seed=5)
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    p.dualize = 0
    p.crossover = 0
    s0 = LpSolver(p)
    tg.load_into_solver(data, s0)
    assert s0.solve() == 1000
    ref_obj = s0.get_info().pobjval
    mean_basis = np.asarray(s0.basis.basis).copy()

    p2 = Parameters()
    p2.display = 0
    p2.device = "cpu"
    p2.dualize = 0
    s2 = LpSolver(p2)
    tg.load_into_solver(data, s2)
    s2.load_starting_basis(mean_basis)
    assert s2.solve() == 1000
    assert abs(s2.get_info().pobjval - ref_obj) <= 1e-7 * max(1, abs(ref_obj))

    # a garbage basis falls back to normal construction, still solves
    p3 = Parameters()
    p3.display = 0
    p3.device = "cpu"
    p3.dualize = 0
    s3 = LpSolver(p3)
    tg.load_into_solver(data, s3)
    s3.load_starting_basis(np.zeros(data["num_constr"], dtype=np.int64))
    assert s3.solve() == 1000
    assert abs(s3.get_info().pobjval - ref_obj) <= 1e-7 * max(1, abs(ref_obj))
