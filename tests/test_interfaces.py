"""C-API layer, parameter files, and MPS reader tests."""
import os
import tempfile

import numpy as np
import pytest

from ipx_tpu import Parameters, capi
from ipx_tpu.mps import read_mps
from ipx_tpu.status import Status

from lp_fixtures import afiro, AFIRO_OBJECTIVE


def test_capi_roundtrip():
    h = capi.ipx_new()
    try:
        p = capi.ipx_get_parameters(h)
        p.display = 0
        p.device = "cpu"
        capi.ipx_set_parameters(h, p)
        a = afiro().arrays()
        rc = capi.ipx_load_model(h, a["num_var"], a["obj"], a["lb"],
                                 a["ub"], a["num_constr"], a["Ap"],
                                 a["Ai"], a["Ax"], a["rhs"],
                                 a["constr_type"])
        assert rc == 0
        status = capi.ipx_solve(h)
        assert status == int(Status.SOLVED)
        info = capi.ipx_get_info(h)
        assert info.objval == pytest.approx(AFIRO_OBJECTIVE, abs=1e-6)
        assert capi.ipx_get_interior_solution(h) is not None
        assert capi.ipx_get_basic_solution(h) is not None
        cb, vb = capi.ipx_get_basis(h)
        assert len(vb) == a["num_var"]
        assert capi.ipx_get_iterate(h) is not None
        AI, g = capi.ipx_get_kktmatrix(h)
        assert AI.shape == (9, 21)
        capi.ipx_clear_model(h)
        assert capi.ipx_solve(h) == int(Status.NO_MODEL)
    finally:
        capi.ipx_free(h)


def test_version():
    assert capi.ipx_version_major() >= 0
    assert isinstance(capi.ipx_version_minor(), int)


def test_parameter_file_roundtrip(tmp_path):
    p = Parameters()
    p.ipm_maxiter = 123
    p.kkt_tol = 0.125
    p.crossover = 0
    path = str(tmp_path / "params.txt")
    p.write(path)
    q = Parameters.read(path)
    assert q.ipm_maxiter == 123
    assert q.kkt_tol == 0.125
    assert q.crossover == 0
    assert q.ipm_feasibility_tol == p.ipm_feasibility_tol


def test_capi_parameter_file(tmp_path):
    h = capi.ipx_new()
    try:
        path = str(tmp_path / "p.txt")
        p = capi.ipx_get_parameters(h)
        p.ipm_maxiter = 55
        capi.ipx_set_parameters(h, p)
        assert capi.ipx_write_parameters(h, path) == 0
        h2 = capi.ipx_new()
        try:
            assert capi.ipx_read_parameters(h2, path) == 0
            assert capi.ipx_get_parameters(h2).ipm_maxiter == 55
        finally:
            capi.ipx_free(h2)
    finally:
        capi.ipx_free(h)


AFIRO_MPS = """\
NAME          TESTLP
ROWS
 N  COST
 L  LIM1
 G  LIM2
 E  MYEQN
COLUMNS
    X1        COST         1.0   LIM1         1.0
    X1        LIM2         1.0
    X2        COST         2.0   LIM1         1.0
    X2        MYEQN       -1.0
    X3        COST        -1.0   LIM2         1.0
    X3        MYEQN        1.0
RHS
    RHS       LIM1         4.0   LIM2         1.0
    RHS       MYEQN        7.0
BOUNDS
 UP BND       X1           4.0
 LO BND       X2          -1.0
ENDATA
"""


def test_mps_reader(tmp_path):
    path = str(tmp_path / "test.mps")
    with open(path, "w") as f:
        f.write(AFIRO_MPS)
    data = read_mps(path)
    assert data.num_var == 3
    assert data.num_constr == 3
    assert data.constr_type == "<>="
    assert np.allclose(data.obj, [1.0, 2.0, -1.0])
    assert np.allclose(data.rhs, [4.0, 1.0, 7.0])
    assert data.lb[0] == 0.0 and data.ub[0] == 4.0
    assert data.lb[1] == -1.0
    assert np.isinf(data.ub[2])

    # solve it: min x1+2x2-x3 st x1+x2<=4, x1+x3>=1, -x2+x3=7
    from ipx_tpu import LpSolver
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    s = LpSolver(p)
    assert data.load_into(s) == 0
    assert s.solve() == int(Status.SOLVED)
    info = s.get_info()
    # optimum: x3 = 7+x2; obj = x1 + 2x2 - 7 - x2 = x1 + x2 - 7;
    # x1>=0, x2>=-1 with x1+x3>=1 auto-satisfied -> x1=0, x2=-1: obj=-8,
    # check x3=6 >= ... x1+x3 = 6 >= 1 ok, x1+x2 = -1 <= 4 ok
    assert info.objval == pytest.approx(-8.0, abs=1e-6)


RANGES_MPS = """NAME RANGETEST
ROWS
 N obj
 L r1
 G r2
 E r3
COLUMNS
    x  obj  1.0  r1  1.0
    x  r2   1.0  r3  1.0
    y  obj  -1.0  r1  2.0
    y  r2   1.0
RHS
    R  r1  10.0  r2  2.0
    R  r3  4.0
RANGES
    RNG r1  4.0   r2  3.0
    RNG r3  2.0
BOUNDS
 MI B y
ENDATA
"""


def test_mps_ranges(tmp_path):
    """RANGES rows become two-sided constraints: L row [rhs-|r|, rhs],
    G row [rhs, rhs+|r|], E row with r>=0 [rhs, rhs+r]. Optimum checked
    against scipy HiGHS on the equivalent two-sided formulation."""
    path = str(tmp_path / "ranges.mps")
    with open(path, "w") as f:
        f.write(RANGES_MPS)
    data = read_mps(path)
    assert data.num_constr == 6         # 3 base + 3 range rows
    from ipx_tpu import LpSolver
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    s = LpSolver(p)
    assert data.load_into(s) == 0
    assert s.solve() == int(Status.SOLVED)
    assert s.get_info().objval == pytest.approx(3.0, abs=1e-7)


def test_logparse_roundtrip(tmp_path):
    """tools/logparse.py reconstructs Info fields and the per-iteration
    history from a logfile (reference: Julia/ipx.jl:187-205 +
    benchmark/scripts/logparser.jl)."""
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..",
                                      "tools"))
    import logparse

    from ipx_tpu import LpSolver, Parameters
    from lp_fixtures import afiro
    log = str(tmp_path / "solve.log")
    p = Parameters()
    p.display = 0
    p.logfile = log
    p.debug = 2
    s = LpSolver(p)
    assert afiro().load_into(s) == 0
    s.solve()
    text = open(log).read()

    info = logparse.parse_info(text)
    real = s.get_info()
    assert info["status"] == real.status
    assert info["iter"] == real.iter
    assert abs(info["objval"] - real.objval) < 1e-9
    assert info["kktiter1"] == real.kktiter1

    iters = logparse.parse_iterations(text)
    # one progress line per completed iteration (the last line may or may
    # not be printed depending on where termination was detected)
    assert len(iters) in (real.iter, real.iter + 1)
    assert iters[0]["iter"] == 0
    assert "kktiter" in iters[0]

    table = logparse.summary_table([info], ["afiro"])
    assert "afiro" in table and "objval" in table
