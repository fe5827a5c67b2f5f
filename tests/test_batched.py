"""Batched scenario IPM: per-scenario results match the reference solver."""
import numpy as np
import pytest
import scipy.sparse as sp

from ipx_tpu import LpSolver, Parameters
from ipx_tpu.parallel.batch import BatchedLp, BatchedPhase1Solver

from lp_fixtures import random_lp
from ipx_tpu.status import Status


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


def test_batched_scenario_full_solve():
    """Batched phase-1 + warm-started host finish reaches the same optimal
    vertex objectives as cold full solves."""
    from ipx_tpu.parallel.batch import BatchedScenarioSolver

    a = random_lp(25, 35, density=0.3, seed=11)
    rng = np.random.default_rng(12)
    B = 3
    b_batch = a["rhs"][None, :] * rng.uniform(0.9, 1.1, size=(B, 25))
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    solver = BatchedScenarioSolver(a, b_batch, parameters=p)
    results = solver.solve()
    assert len(results) == B
    for k, (status, info, s) in enumerate(results):
        # cold reference solve
        p2 = Parameters()
        p2.display = 0
        p2.device = "cpu"
        s2 = LpSolver(p2)
        assert s2.load_model(a["num_var"], a["obj"], a["lb"], a["ub"], 25,
                             a["Ap"], a["Ai"], a["Ax"], b_batch[k],
                             a["constr_type"]) == 0
        st2 = s2.solve()
        assert status == st2, f"scenario {k}"
        if st2 == int(Status.SOLVED):
            assert info.pobjval == pytest.approx(
                s2.get_info().pobjval, rel=1e-7, abs=1e-7), f"scenario {k}"
            assert info.status_crossover == 1
