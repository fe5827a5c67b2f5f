"""Batched scenario IPM: per-scenario results match the reference solver."""
import numpy as np
import pytest
import scipy.sparse as sp

from ipx_tpu import LpSolver, Parameters
from ipx_tpu.parallel.batch import BatchedLp, BatchedPhase1Solver

from lp_fixtures import random_lp


def make_batch(B=4, m=30, n=40, seed=0):
    a = random_lp(m, n, density=0.25, seed=seed)
    A = sp.csc_matrix((a["Ax"], a["Ai"], a["Ap"]), shape=(m, n))
    rng = np.random.default_rng(seed + 1)
    # batch of perturbed rhs/cost; slack bounds for '<' constraints
    b = a["rhs"][None, :] * rng.uniform(0.9, 1.1, size=(B, m))
    c = np.zeros((B, n + m))
    c[:, :n] = a["obj"][None, :] * rng.uniform(0.9, 1.1, size=(B, n))
    lb = np.concatenate([a["lb"], np.zeros(m)])
    ub = np.concatenate([a["ub"], np.full(m, np.inf)])
    return a, BatchedLp(A=A, b=b, c=c, lb=lb, ub=ub)


def reference_solve(a, bk, ck):
    p = Parameters()
    p.display = 0
    p.crossover = 0
    p.device = "cpu"
    s = LpSolver(p)
    assert s.load_model(a["num_var"], ck, a["lb"], a["ub"], a["num_constr"],
                        a["Ap"], a["Ai"], a["Ax"], bk, a["constr_type"]) == 0
    s.solve()
    return s.get_info()


def test_batched_matches_sequential():
    a, blp = make_batch(B=4)
    solver = BatchedPhase1Solver(blp, maxiter=60)
    out = solver.solve()
    assert np.all(out["done"]), f"not converged: iters={out['iters']}"

    n = a["num_var"]
    for k in range(blp.batch):
        info = reference_solve(a, blp.b[k], blp.c[k, :n])
        assert out["pobj"][k] == pytest.approx(info.pobjval, rel=1e-6,
                                               abs=1e-6), f"scenario {k}"


def test_batched_convergence_mask():
    _, blp = make_batch(B=3, seed=5)
    solver = BatchedPhase1Solver(blp, maxiter=60)
    S = solver._start_fn(0)
    assert not bool(np.any(np.asarray(S["done"])))
    for _ in range(60):
        S = solver._step_fn(S)
        if bool(np.all(np.asarray(S["done"]))):
            break
    assert bool(np.all(np.asarray(S["done"])))
    iters = np.asarray(S["iters"])
    assert np.all(iters > 0) and np.all(iters <= 60)
