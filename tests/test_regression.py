"""Golden-value regression: fixed structured instances must reach the same
vertex objective across code changes (values recorded from a verified
solve; the basic solution of a non-degenerate LP is unique, so these are
exact up to crossover tolerances)."""
import numpy as np
import pytest

from ipx_tpu import LpSolver, Parameters
from ipx_tpu.status import Status, SolveStatus
from ipx_tpu.testgen import grid_flow, production, transportation, \
    load_into_solver

GOLDEN = [
    ("transport", lambda: transportation(100, 150, 0.1, 11),
     3322.1356062140217),
    ("grid", lambda: grid_flow(12, 14, 11), 160.0308673828518),
    ("production", lambda: production(200, 150, 5, 11),
     -1994.8200651084312),
]


@pytest.mark.parametrize("name,gen,objval", GOLDEN,
                         ids=[g[0] for g in GOLDEN])
def test_golden_objective(name, gen, objval):
    data = gen()
    for dualize in (0, 1):
        p = Parameters()
        p.display = 0
        p.device = "cpu"
        p.dualize = dualize
        s = LpSolver(p)
        assert load_into_solver(data, s) == 0
        assert s.solve() == int(Status.SOLVED)
        info = s.get_info()
        assert info.status_crossover in (int(SolveStatus.OPTIMAL),
                                         int(SolveStatus.IMPRECISE))
        assert info.objval == pytest.approx(objval, rel=1e-8), \
            f"{name} dualize={dualize}"
