"""Differential testing against scipy.optimize.linprog (HiGHS): optimal
objective values must agree on randomized structured instances."""
import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import linprog

from ipx_tpu import LpSolver, Parameters
from ipx_tpu.status import Status
from ipx_tpu.testgen import grid_flow, production, transportation, \
    load_into_solver


def reference_objective(data):
    m, n = data["num_constr"], data["num_var"]
    A = sp.csc_matrix((data["Ax"], data["Ai"], data["Ap"]), shape=(m, n))
    ct = np.array(list(data["constr_type"]))
    eq = ct == "="
    lt = ct == "<"
    gt = ct == ">"
    A_ub_parts = []
    b_ub_parts = []
    if lt.any():
        A_ub_parts.append(A[np.nonzero(lt)[0]])
        b_ub_parts.append(data["rhs"][lt])
    if gt.any():
        A_ub_parts.append(-A[np.nonzero(gt)[0]])
        b_ub_parts.append(-data["rhs"][gt])
    A_ub = sp.vstack(A_ub_parts) if A_ub_parts else None
    b_ub = np.concatenate(b_ub_parts) if b_ub_parts else None
    A_eq = A[np.nonzero(eq)[0]] if eq.any() else None
    b_eq = data["rhs"][eq] if eq.any() else None
    res = linprog(data["obj"], A_ub=A_ub, b_ub=b_ub, A_eq=A_eq, b_eq=b_eq,
                  bounds=np.stack([data["lb"], data["ub"]], axis=1),
                  method="highs")
    return res


CASES = [
    ("transport", lambda s: transportation(60, 90, 0.12, s)),
    ("grid", lambda s: grid_flow(9, 11, s)),
    ("production", lambda s: production(120, 90, 4, s)),
]


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_objective_matches_highs(name, gen, seed):
    data = gen(seed)
    ref = reference_objective(data)
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    s = LpSolver(p)
    assert load_into_solver(data, s) == 0
    status = s.solve()
    info = s.get_info()
    if ref.status == 0:
        assert status == int(Status.SOLVED), \
            f"HiGHS optimal but we returned {status}"
        assert info.objval == pytest.approx(ref.fun, rel=1e-7, abs=1e-7)
    elif ref.status == 2:      # infeasible
        assert info.status_ipm in (3, 4) or status != int(Status.SOLVED)
