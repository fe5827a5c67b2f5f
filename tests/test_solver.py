"""End-to-end solver tests mirroring the reference integration suite
(reference: check/solver.cc): each scenario solved with dualize=0 and
dualize=1, checking statuses and running invariant checkers on the interior
and basic solutions rather than comparing objective values."""
import numpy as np
import pytest

from ipx_tpu import LpSolver, Parameters
from ipx_tpu.status import SolveStatus, Status
from ipx_tpu.status import (IPX_BASIC, IPX_NONBASIC_LB, IPX_NONBASIC_UB,
                            IPX_SUPERBASIC)

from lp_fixtures import LPBuilder, afiro, AFIRO_OBJECTIVE, random_lp

INF = np.inf


def params(**kw):
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def check_interior_solution(s: LpSolver):
    """Sign/finiteness invariants (reference: check/solver.cc:19-58)."""
    sol = s.get_interior_solution()
    um = s.user_model
    assert np.all(np.isfinite(sol.x))
    assert np.all(np.isfinite(sol.y))
    finl = np.isfinite(um.lb)
    finu = np.isfinite(um.ub)
    assert np.all(sol.xl[finl] >= 0)
    assert np.all(np.isinf(sol.xl[~finl]))
    assert np.all(sol.xu[finu] >= 0)
    assert np.all(np.isinf(sol.xu[~finu]))
    assert np.all(sol.zl[finl] >= 0)
    assert np.all(sol.zl[~finl] == 0)
    assert np.all(sol.zu[finu] >= 0)
    assert np.all(sol.zu[~finu] == 0)
    ct = um.constr_type
    assert np.all(sol.slack[ct == "="] == 0)
    assert np.all(sol.slack[ct == "<"] >= 0)
    assert np.all(sol.slack[ct == ">"] <= 0)
    assert np.all(sol.y[ct == "<"] <= 0)
    assert np.all(sol.y[ct == ">"] >= 0)


def check_basic_solution(s: LpSolver):
    """Basis/solution consistency (reference: check/solver.cc:60-98)."""
    sol = s.get_basic_solution()
    um = s.user_model
    n, m = um.num_var, um.num_constr
    vb, cb = sol.vbasis, sol.cbasis
    assert np.all(np.isin(vb, [IPX_BASIC, IPX_NONBASIC_LB, IPX_NONBASIC_UB,
                               IPX_SUPERBASIC]))
    assert np.all(np.isin(cb, [IPX_BASIC, IPX_NONBASIC_LB]))
    num_basic = np.count_nonzero(vb == IPX_BASIC) + \
        np.count_nonzero(cb == IPX_BASIC)
    assert num_basic == m
    at_lb = vb == IPX_NONBASIC_LB
    at_ub = vb == IPX_NONBASIC_UB
    assert np.all(sol.x[at_lb] == um.lb[at_lb])
    assert np.all(sol.x[at_ub] == um.ub[at_ub])
    assert np.all(sol.z[vb == IPX_BASIC] == 0.0)
    # superbasic only for free variables
    sb = vb == IPX_SUPERBASIC
    assert np.all(np.isinf(um.lb[sb]) & np.isinf(um.ub[sb]))
    assert np.all(sol.slack[cb != IPX_BASIC] == 0.0)
    assert np.all(sol.y[cb == IPX_BASIC] == 0.0)


def solve_and_check(lp, expect_ipm=None, expect_crossover=None, **kw):
    """Solves with dualize in {0,1}; returns the dualize=0 solver."""
    out = None
    for dualize in (0, 1):
        s = LpSolver(params(dualize=dualize, **kw))
        assert lp.load_into(s) == 0
        s.solve()
        info = s.get_info()
        if expect_ipm is not None:
            assert info.status_ipm == int(expect_ipm), \
                f"dualize={dualize}: status_ipm={info.status_ipm}"
        if expect_crossover is not None:
            assert info.status_crossover == int(expect_crossover), \
                f"dualize={dualize}: status_crossover={info.status_crossover}"
        if info.status_ipm in (int(SolveStatus.OPTIMAL),
                               int(SolveStatus.IMPRECISE)):
            check_interior_solution(s)
        if info.status_crossover in (int(SolveStatus.OPTIMAL),
                                     int(SolveStatus.IMPRECISE)):
            check_basic_solution(s)
        if dualize == 0:
            out = s
    return out


# ----------------------------------------------------------------------
# scenario: no constraints, every bound pattern
# (reference: check/solver.cc:153-185)
# ----------------------------------------------------------------------
def test_no_constraints():
    lp = LPBuilder(rhs=[], constr_type="")
    lp.add_column(1.0, [], [], 0.0, 1.0)       # at lb
    lp.add_column(-1.0, [], [], 0.0, 1.0)      # at ub
    lp.add_column(1.0, [], [], 0.0, INF)       # at lb
    lp.add_column(-1.0, [], [], -INF, 1.5)     # at ub
    lp.add_column(0.0, [], [], 0.0, 0.0)       # fixed
    s = solve_and_check(lp, SolveStatus.OPTIMAL, SolveStatus.OPTIMAL)
    sol = s.get_basic_solution()
    assert sol.x[0] == 0.0
    assert sol.x[1] == 1.0
    assert sol.x[2] == 0.0
    assert sol.x[3] == 1.5


# ----------------------------------------------------------------------
# scenario: single constraint of each type with all 5 variable classes
# (reference: check/solver.cc:187-205)
# ----------------------------------------------------------------------
@pytest.mark.parametrize("ctype", ["=", "<", ">"])
def test_single_constraint(ctype):
    # data mirrors reference: check/solver.cc:190-200
    lp = LPBuilder(rhs=[0.5], constr_type=ctype)
    lp.add_column(1.0, [0], [1.0], 0.0, 1.0)      # boxed
    lp.add_column(1.0, [0], [2.0], 1.0, INF)      # lower bounded
    lp.add_column(-1.0, [0], [3.0], -INF, -1.0)   # upper bounded
    lp.add_column(0.0, [0], [4.0], -INF, INF)     # free
    lp.add_column(-1.0, [0], [5.0], 1.0, 1.0)     # fixed
    solve_and_check(lp, SolveStatus.OPTIMAL, SolveStatus.OPTIMAL)


# ----------------------------------------------------------------------
# scenario: dependent equality constraints, consistent and inconsistent rhs
# (reference: check/solver.cc:207-228)
# ----------------------------------------------------------------------
def test_dependent_rows_consistent():
    lp = LPBuilder(rhs=[1.0, 1.0], constr_type="==")
    lp.add_column(1.0, [0, 1], [1.0, 1.0], 0.0, INF)
    lp.add_column(1.0, [0, 1], [2.0, 2.0], 0.0, INF)
    s = solve_and_check(lp, SolveStatus.OPTIMAL, SolveStatus.OPTIMAL,
                        switchiter=0)
    assert s.get_info().dependent_rows >= 1


def test_dependent_rows_inconsistent():
    lp = LPBuilder(rhs=[1.0, 2.0], constr_type="==")
    lp.add_column(1.0, [0, 1], [1.0, 1.0], 0.0, INF)
    lp.add_column(1.0, [0, 1], [2.0, 2.0], 0.0, INF)
    for dualize in (0, 1):
        s = LpSolver(params(dualize=dualize, switchiter=0))
        assert lp.load_into(s) == 0
        s.solve()
        info = s.get_info()
        assert info.status == int(Status.SOLVED)
        assert info.status_ipm == int(SolveStatus.PRIMAL_INFEAS), \
            f"dualize={dualize}: {info.status_ipm}"


# ----------------------------------------------------------------------
# scenario: dependent free variables -> dual infeasible if costs inconsistent
# (reference: check/solver.cc:230-251)
# ----------------------------------------------------------------------
def test_dependent_free_vars_consistent():
    lp = LPBuilder(rhs=[1.0], constr_type="=")
    lp.add_column(1.0, [0], [1.0], -INF, INF)
    lp.add_column(2.0, [0], [2.0], -INF, INF)
    s = solve_and_check(lp, SolveStatus.OPTIMAL, SolveStatus.OPTIMAL,
                        switchiter=0)
    assert s.get_info().dependent_cols >= 1


def test_dependent_free_vars_inconsistent():
    lp = LPBuilder(rhs=[1.0], constr_type="=")
    lp.add_column(1.0, [0], [1.0], -INF, INF)
    lp.add_column(3.0, [0], [2.0], -INF, INF)   # 3 != 2*1: dual infeasible
    for dualize in (0, 1):
        s = LpSolver(params(dualize=dualize, switchiter=0))
        assert lp.load_into(s) == 0
        s.solve()
        info = s.get_info()
        assert info.status == int(Status.SOLVED)
        assert info.status_ipm == int(SolveStatus.DUAL_INFEAS), \
            f"dualize={dualize}: {info.status_ipm}"


# ----------------------------------------------------------------------
# afiro with crossover, both dualize settings
# ----------------------------------------------------------------------
def test_afiro_full():
    s = solve_and_check(afiro(), SolveStatus.OPTIMAL, SolveStatus.OPTIMAL)
    info = s.get_info()
    assert info.status == int(Status.SOLVED)
    assert info.objval == pytest.approx(AFIRO_OBJECTIVE, abs=1e-6)
    assert info.primal_infeas <= 1e-7
    assert info.dual_infeas <= 1e-7


def test_afiro_unscaled():
    s = solve_and_check(afiro(), SolveStatus.OPTIMAL, SolveStatus.OPTIMAL,
                        scale=0)
    assert s.get_info().objval == pytest.approx(AFIRO_OBJECTIVE, abs=1e-6)


def test_afiro_no_crash_basis():
    s = solve_and_check(afiro(), SolveStatus.OPTIMAL, SolveStatus.OPTIMAL,
                        crash_basis=0)
    assert s.get_info().objval == pytest.approx(AFIRO_OBJECTIVE, abs=1e-6)


def test_afiro_sequential_maxvolume():
    s = solve_and_check(afiro(), SolveStatus.OPTIMAL, SolveStatus.OPTIMAL,
                        update_heuristic=0)
    assert s.get_info().objval == pytest.approx(AFIRO_OBJECTIVE, abs=1e-6)


# ----------------------------------------------------------------------
# random LPs: solve and verify optimality conditions hold at tolerances
# ----------------------------------------------------------------------
@pytest.mark.parametrize("m,n,seed", [(40, 60, 0), (80, 50, 1), (60, 60, 2)])
def test_random_lp(m, n, seed):
    a = random_lp(m, n, density=0.2, seed=seed)
    for dualize in (0, 1):
        s = LpSolver(params(dualize=dualize))
        assert s.load_model(a["num_var"], a["obj"], a["lb"], a["ub"],
                            a["num_constr"], a["Ap"], a["Ai"], a["Ax"],
                            a["rhs"], a["constr_type"]) == 0
        s.solve()
        info = s.get_info()
        assert info.status == int(Status.SOLVED), \
            f"dualize={dualize}: status={info.status} ipm={info.status_ipm}" \
            f" xover={info.status_crossover}"
        assert info.status_crossover in (int(SolveStatus.OPTIMAL),
                                         int(SolveStatus.IMPRECISE))
        check_basic_solution(s)
        if dualize == 0:
            obj0 = info.objval
    # both paths reach the same objective
    assert info.objval == pytest.approx(obj0, rel=1e-6)
