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


def test_staircase_family_solves_to_highs_objective():
    """srd-like multi-period staircase LPs (the reference benchmark family
    where basis preconditioning shines, BASELINE.md) solve to the HiGHS
    objective with both preprocessing variants."""
    import numpy as np
    import scipy.sparse as sp
    from scipy.optimize import linprog
    from ipx_tpu import LpSolver, Parameters
    from ipx_tpu.testgen import staircase, load_into_solver

    d = staircase(12, 40, links_per_period=4, seed=3)
    A = sp.csc_matrix((d["Ax"], d["Ai"], d["Ap"]),
                      shape=(d["num_constr"], d["num_var"]))
    ref = linprog(d["obj"], A_eq=A, b_eq=d["rhs"],
                  bounds=np.stack([d["lb"], d["ub"]], axis=1),
                  method="highs")
    assert ref.status == 0
    for dualize in (0, 1):
        p = Parameters()
        p.display = 0
        p.device = "cpu"
        p.dualize = dualize
        s = LpSolver(p)
        assert load_into_solver(d, s) == 0
        assert s.solve() == 1000
        assert abs(s.get_info().objval - ref.fun) \
            <= 1e-6 * max(1.0, abs(ref.fun))
