"""Dense-column handling: classification + SMW preconditioner path
(reference: src/model.cc:34-56, src/diagonal_precond.cc:48-111)."""
import numpy as np
import pytest

from ipx_tpu import LpSolver, Parameters
from ipx_tpu.status import SolveStatus, Status

from lp_fixtures import LPBuilder

INF = np.inf


def build_dense_col_lp(m=200, n_sparse=60, n_dense=3, seed=0):
    """LP whose last columns touch (nearly) every row."""
    rng = np.random.default_rng(seed)
    lp = LPBuilder(rhs=rng.uniform(5.0, 10.0, size=m), constr_type="<" * m)
    for j in range(n_sparse):
        k = rng.integers(1, 4)
        idx = np.sort(rng.choice(m, size=k, replace=False))
        lp.add_column(float(rng.standard_normal()), idx.tolist(),
                      rng.uniform(0.5, 2.0, size=k).tolist(), 0.0, 5.0)
    for j in range(n_dense):
        idx = np.arange(m)
        lp.add_column(-1.0, idx.tolist(),
                      rng.uniform(0.1, 1.0, size=m).tolist(), 0.0, 2.0)
    return lp


def test_dense_columns_classified_and_solved():
    lp = build_dense_col_lp()
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    p.dualize = 0       # keep columns as columns (would auto-dualize)
    s = LpSolver(p)
    assert lp.load_into(s) == 0
    s.solve()
    info = s.get_info()
    assert info.dense_cols >= 3          # the dense columns were detected
    assert info.status == int(Status.SOLVED)
    assert info.status_crossover in (int(SolveStatus.OPTIMAL),
                                     int(SolveStatus.IMPRECISE))


def test_dense_columns_precond_off_matches():
    lp = build_dense_col_lp(seed=3)
    objs = []
    for pdc in (0, 1):
        p = Parameters()
        p.display = 0
        p.device = "cpu"
        p.dualize = 0
        p.precond_dense_cols = pdc
        s = LpSolver(p)
        assert lp.load_into(s) == 0
        s.solve()
        info = s.get_info()
        assert info.status == int(Status.SOLVED), f"pdc={pdc}"
        objs.append(info.objval)
    assert objs[0] == pytest.approx(objs[1], rel=1e-7)
