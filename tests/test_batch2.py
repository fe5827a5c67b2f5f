"""Shared-basis batched KKT CR (ipx_tpu/parallel/batch2.py): scenario
batches of normal-equation solves preconditioned by ONE basis through
blocked native solves."""
import numpy as np
import pytest

from ipx_tpu import LpSolver, Parameters
from ipx_tpu.parallel.batch2 import SharedBasisBatchedCR
from ipx_tpu.testgen import transportation, load_into_solver


def _solved_mean_scenario():
    data = transportation(60, 120, 0.05, seed=9)
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    p.crossover = 0           # keep the IPM basis + iterate
    s = LpSolver(p)
    assert load_into_solver(data, s) == 0
    assert s.solve() == 1000
    assert s.basis is not None
    return s


def test_shared_basis_batched_cr_converges_fast():
    s = _solved_mean_scenario()
    md = s.model
    m, n = md.num_rows, md.num_cols
    basis = s.basis
    if not basis.factorization_is_fresh:
        assert basis.factorize() == 0

    # per-scenario weights: perturbations of the final iterate's barrier
    # weights (the phase-2 scaling the basis was refined for)
    it = s.iterate
    rng = np.random.default_rng(3)
    with np.errstate(divide="ignore", invalid="ignore"):
        g = np.where(it.barrier_lb_mask, it.zl / it.xl, 0.0) \
            + np.where(it.barrier_ub_mask, it.zu / it.xu, 0.0)
    W0 = np.where(g > 0, 1.0 / g, 1.0)
    W0 = np.clip(W0, 1e-8, 1e8)
    B = 5
    W = W0[:, None] * rng.uniform(0.8, 1.25, size=(n + m, B))
    resscale = 1.0 / np.sqrt(W[n:, :])
    RHS = rng.standard_normal((m, B))

    cr = SharedBasisBatchedCR(basis, W, resscale)
    Y, ok, iters = cr.solve(RHS, tol=1e-8, maxiter=m)
    assert ok.all()
    # residual check per scenario
    A = md.A
    for k in range(B):
        w, y = W[:, k], Y[:, k]
        res = RHS[:, k] - (A @ (w[:n] * (A.T @ y)) + w[n:] * y)
        assert np.max(np.abs(resscale[:, k] * res)) <= 1e-8

    # basis preconditioning must beat unpreconditioned behavior decisively:
    # a handful of iterations, not O(m)
    assert iters < m // 4, iters


def test_shared_basis_batched_cr_partial_convergence_mask():
    """A scenario with wildly different weights may not converge within a
    small iteration budget; the mask reports per-scenario status."""
    s = _solved_mean_scenario()
    md = s.model
    m, n = md.num_rows, md.num_cols
    basis = s.basis
    if not basis.factorization_is_fresh:
        assert basis.factorize() == 0
    rng = np.random.default_rng(4)
    W = np.ones((n + m, 3))
    W[:, 2] = 10.0 ** rng.uniform(-6, 6, size=n + m)   # hostile scenario
    resscale = 1.0 / np.sqrt(W[n:, :])
    RHS = rng.standard_normal((m, 3))
    cr = SharedBasisBatchedCR(basis, W, resscale)
    Y, ok, iters = cr.solve(RHS, tol=1e-10, maxiter=8)
    assert ok.dtype == bool and ok.shape == (3,)
    assert np.all(np.isfinite(Y))


def test_shared_basis_batched_polish_pipeline():
    """Batched diag phase 1 to a loose tolerance, one mean-scenario basis,
    then the shared-basis batched polish drives every scenario to tight
    tolerances; objectives match per-scenario reference solves."""
    import scipy.sparse as sp
    from ipx_tpu.parallel.batch import BatchedLp, BatchedPhase1Solver
    from ipx_tpu.parallel.batch2 import SharedBasisBatchedPolish

    data = transportation(50, 100, 0.06, seed=12)
    m, n = data["num_constr"], data["num_var"]
    A = sp.csc_matrix((data["Ax"], data["Ai"], data["Ap"]), shape=(m, n))
    ct = np.asarray(list(data["constr_type"]))
    lb = np.concatenate([data["lb"], np.where(ct == ">", -np.inf, 0.0)])
    ub = np.concatenate([data["ub"], np.where(ct == "<", np.inf, 0.0)])
    rng = np.random.default_rng(6)
    B = 4
    b_batch = data["rhs"][None, :] * rng.uniform(0.98, 1.05, size=(B, m))
    c = np.zeros((B, n + m))
    c[:, :n] = data["obj"]
    blp = BatchedLp(A=A, b=b_batch, c=c, lb=lb, ub=ub)

    # loose batched phase 1
    ph1 = BatchedPhase1Solver(blp, feasibility_tol=1e-3,
                              optimality_tol=1e-3, maxiter=60)
    state = ph1.solve()

    # mean-scenario basis (unscaled model so AI matches blp exactly)
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    p.scale = 0
    p.dualize = 0
    p.crossover = 0
    s = LpSolver(p)
    d_mean = dict(data)
    d_mean["rhs"] = b_batch.mean(axis=0)
    assert load_into_solver(d_mean, s) == 0
    assert s.solve() == 1000
    basis = s.basis
    if not basis.factorization_is_fresh:
        assert basis.factorize() == 0

    mu_before = None
    polish = SharedBasisBatchedPolish(blp, basis, feasibility_tol=1e-8,
                                      optimality_tol=1e-8)
    out = polish.run(state)
    # the polish either converges a scenario or reports it for a
    # per-scenario finish via the mask; either way the iterates must be
    # near-optimal: objectives match per-scenario reference solves
    assert out["done"].dtype == bool
    assert np.all(out["mu"] < 1e-5)     # complementarity driven far down
    for k in range(B):
        pk = Parameters()
        pk.display = 0
        pk.device = "cpu"
        sk = LpSolver(pk)
        dk = dict(data)
        dk["rhs"] = b_batch[k]
        assert load_into_solver(dk, sk) == 0
        assert sk.solve() == 1000
        ref = sk.get_info().objval
        assert abs(out["pobj"][k] - ref) <= 1e-5 * max(1.0, abs(ref)), k


def test_scenario_solver_with_polish_enabled():
    """BatchedScenarioSolver(phase2_polish=True) routes through the
    shared-basis polish and reaches the same per-scenario optima."""
    from ipx_tpu.parallel.batch import BatchedScenarioSolver

    data = transportation(40, 80, 0.08, seed=2)
    m = data["num_constr"]
    rng = np.random.default_rng(7)
    B = 3
    b_batch = data["rhs"][None, :] * rng.uniform(0.98, 1.04, size=(B, m))
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    res_ref = BatchedScenarioSolver(data, b_batch, parameters=p).solve()
    solver = BatchedScenarioSolver(data, b_batch, parameters=p,
                                   phase2_polish=True)
    res = solver.solve()
    for k in range(B):
        assert res[k][0] == 1000
        assert abs(res[k][1].objval - res_ref[k][1].objval) \
            <= 1e-6 * max(1.0, abs(res_ref[k][1].objval)), k


def test_low_rank_correction_kills_injected_outliers():
    """SharedBasisLowRank mechanism test: inflating a few nonbasic
    weights creates outlier eigenvalues the shared-basis preconditioner
    misses; the per-scenario Woodbury correction must restore fast CR
    convergence on exactly that system."""
    from ipx_tpu.parallel.batch2 import (SharedBasisBatchedCR,
                                         SharedBasisLowRank)

    data = transportation(100, 150, 0.04, seed=3)
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    p.scale = 0
    p.dualize = 0
    p.crossover = 0
    s = LpSolver(p)
    assert load_into_solver(data, s) == 0
    assert s.solve() == 1000
    basis = s.basis
    if not basis.factorization_is_fresh:
        assert basis.factorize() == 0
    md = basis.model
    m, n = md.num_rows, md.num_cols

    it = s.iterate
    with np.errstate(divide="ignore"):
        g = np.where(it.barrier_lb_mask, it.zl / it.xl, 0.0) \
            + np.where(it.barrier_ub_mask, it.zu / it.xu, 0.0)
    nz = g[g != 0.0]
    regval = min(it.mu(), float(nz.min()) if nz.size else it.mu())
    W = np.where(g > 0, 1.0 / g, 1.0 / regval)

    # inject outliers: push a few nonbasic structural weights ABOVE the
    # basic range (at an optimal iterate nonbasic weights are ~1e-12, so
    # a multiplicative bump would stay harmless — and the correction
    # should correctly ignore harmless columns)
    nb = np.setdiff1d(np.arange(n), basis.basis[basis.basis < n])
    rng = np.random.default_rng(0)
    bad = rng.choice(nb, size=4, replace=False)
    W = W.copy()
    W[bad] = 10.0 * W[np.asarray(basis.basis)].max()

    W2 = W[:, None]
    resscale = 1.0 / np.sqrt(W2[n:])
    rhs = rng.standard_normal((m, 1))

    base = SharedBasisBatchedCR(basis, W2, resscale)
    _, ok0, it0 = base.solve(rhs, 1e-8, 500)

    corr = SharedBasisBatchedCR(basis, W2, resscale)
    corr.correction = SharedBasisLowRank(basis, W2, corr._D2)
    Y, ok1, it1 = corr.solve(rhs, 1e-8, 500)
    assert corr.correction.active
    # the corrected solve must be much faster AND still correct
    assert it1 * 2 <= max(it0, 10), (it0, it1)
    A = md.A
    res = rhs[:, 0] - (A @ (W[:n] * (A.T @ Y[:, 0])) + W[n:] * Y[:, 0])
    # the injected weights span ~1e12, so the attainable scaled residual
    # floor is eps*cond ~ 1e-4; check against a meaningful bound
    assert np.max(np.abs(resscale[:, 0] * res)) <= 1e-3 * np.abs(rhs).max()


def test_phase1_handoff_stops_at_cr_saturation():
    """solve(handoff='auto') must stop once the batched CR saturates its
    budget on consecutive steps (the diag-era end), while the default
    runs to maxiter; the production pipeline relies on this split."""
    import scipy.sparse as sp
    from ipx_tpu.parallel.batch import BatchedLp, BatchedPhase1Solver

    data = transportation(60, 90, 0.05, seed=2)
    m, n = data["num_constr"], data["num_var"]
    A = sp.csc_matrix((data["Ax"], data["Ai"], data["Ap"]), shape=(m, n))
    ct = np.asarray(list(data["constr_type"]))
    lb = np.concatenate([data["lb"], np.where(ct == ">", -np.inf, 0.0)])
    ub = np.concatenate([data["ub"], np.where(ct == "<", np.inf, 0.0)])
    rng = np.random.default_rng(1)
    B = 4
    b_batch = data["rhs"][None, :] * rng.uniform(0.97, 1.03, size=(B, m))
    c = np.zeros((B, n + m))
    c[:, :n] = data["obj"]
    blp = BatchedLp(A=A, b=b_batch, c=c, lb=lb, ub=ub)

    # starved CR budget: every step saturates, so 'auto' must hand off
    # after ~2 steps while the default grinds to maxiter
    kw = dict(feasibility_tol=1e-10, optimality_tol=1e-12, maxiter=8,
              cr_maxiter=4, cr64_maxiter=2)
    auto_iters = int(np.asarray(
        BatchedPhase1Solver(blp, **kw).solve(handoff="auto")["iters"]
    ).max())
    full_iters = int(np.asarray(
        BatchedPhase1Solver(blp, **kw).solve()["iters"]).max())
    assert auto_iters <= 3
    assert full_iters == 8
