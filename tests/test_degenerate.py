"""Massively degenerate LPs (assignment problems): exercises DropPrimal/
DropDual, maxvolume and crossover on the structure class where the reference
is weakest (its nug benchmarks). Oracle: Hungarian algorithm."""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from ipx_tpu import LpSolver, Parameters
from ipx_tpu.status import Status, SolveStatus


def assignment_lp(N, seed):
    rng = np.random.default_rng(seed)
    n = N * N
    Ap, Ai, Ax = [0], [], []
    for i in range(N):
        for j in range(N):
            Ai.extend([i, N + j])
            Ax.extend([1.0, 1.0])
            Ap.append(len(Ai))
    return dict(num_var=n, obj=rng.uniform(0, 10, n), lb=np.zeros(n),
                ub=np.full(n, np.inf), num_constr=2 * N,
                Ap=np.array(Ap, dtype=np.int64),
                Ai=np.array(Ai, dtype=np.int64),
                Ax=np.array(Ax, dtype=np.float64),
                rhs=np.ones(2 * N), constr_type="=" * (2 * N))


@pytest.mark.parametrize("N,seed", [(20, 0), (40, 1), (60, 2)])
def test_assignment_exact(N, seed):
    data = assignment_lp(N, seed)
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    s = LpSolver(p)
    assert s.load_model(data["num_var"], data["obj"], data["lb"],
                        data["ub"], data["num_constr"], data["Ap"],
                        data["Ai"], data["Ax"], data["rhs"],
                        data["constr_type"]) == 0
    assert s.solve() == int(Status.SOLVED)
    info = s.get_info()
    assert info.status_crossover in (int(SolveStatus.OPTIMAL),
                                     int(SolveStatus.IMPRECISE))
    C = data["obj"].reshape(N, N)
    r, c = linear_sum_assignment(C)
    assert info.objval == pytest.approx(float(C[r, c].sum()), abs=1e-7)
