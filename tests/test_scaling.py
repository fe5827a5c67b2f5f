"""Equilibration scaling: badly scaled LPs (12 orders of magnitude) solve
with scale=1 (default); without scaling the phase-1 CR hits its iteration
limit on the ~1e24-condition normal matrix and the solver degrades cleanly
(same behavior as the reference, which also defaults scaling on)."""
import numpy as np
import pytest

from ipx_tpu import LpSolver, Parameters
from ipx_tpu.status import SolveStatus, Status

from lp_fixtures import LPBuilder


def badly_scaled_lp(seed=0, m=60, n=90):
    rng = np.random.default_rng(seed)
    lp = LPBuilder(rhs=rng.uniform(1, 5, m) * 1e3, constr_type="<" * m)
    for j in range(n):
        k = int(rng.integers(2, 5))
        idx = np.sort(rng.choice(m, size=k, replace=False))
        scale = 10.0 ** rng.uniform(-6, 6)
        lp.add_column(float(rng.standard_normal()), idx.tolist(),
                      (rng.uniform(0.5, 2, k) * scale).tolist(), 0.0, 1e4)
    return lp


def test_scaled_solves():
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    s = LpSolver(p)
    assert badly_scaled_lp().load_into(s) == 0
    assert s.solve() == int(Status.SOLVED)
    info = s.get_info()
    assert info.status_crossover in (int(SolveStatus.OPTIMAL),
                                     int(SolveStatus.IMPRECISE))


def test_unscaled_degrades_cleanly():
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    p.scale = 0
    s = LpSolver(p)
    assert badly_scaled_lp().load_into(s) == 0
    status = s.solve()
    # no crash; a stopped/failed status with a valid Info is acceptable
    assert status in (int(Status.SOLVED), int(Status.STOPPED))
    info = s.get_info()
    assert info.status_ipm in (int(SolveStatus.OPTIMAL),
                               int(SolveStatus.IMPRECISE),
                               int(SolveStatus.FAILED),
                               int(SolveStatus.NO_PROGRESS))
