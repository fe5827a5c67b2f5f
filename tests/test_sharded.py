"""Multi-chip sharding: row-block CR over a virtual 8-device mesh."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax
from jax.sharding import Mesh

from ipx_tpu.parallel.sharding import ShardedNormalMatrix, sharded_cr_solve

from lp_fixtures import random_lp


def test_sharded_cr_matches_direct():
    devices = jax.local_devices(backend="cpu")
    assert len(devices) >= 8, "conftest must create 8 virtual CPU devices"
    mesh = Mesh(np.array(devices[:4]), axis_names=("rows",))

    a = random_lp(64, 90, density=0.15, seed=11)
    A = sp.csc_matrix((a["Ax"], a["Ai"], a["Ap"]),
                      shape=(a["num_constr"], a["num_var"]))
    m, n = A.shape
    rng = np.random.default_rng(0)
    W = rng.uniform(0.5, 2.0, size=n + m)
    A2 = A.copy()
    A2.data = A2.data ** 2
    diag = np.asarray(A2 @ W[:n]).ravel() + W[n:]
    rhs = rng.standard_normal(m)

    snm = ShardedNormalMatrix(A, num_blocks=4)
    y, iters = sharded_cr_solve(snm, W[:n], W[n:], diag, rhs,
                                tol=1e-10, maxiter=2000, mesh=mesh)
    assert iters > 0
    # check normal equations residual
    res = rhs - (A @ (W[:n] * (A.T @ y)) + W[n:] * y)
    assert np.max(np.abs(res)) <= 1e-9 * max(1.0, np.abs(rhs).max())


def test_sharded_batched_cr_2d_mesh():
    """Scenario-batched + row-sharded CR on a 2D (rows x batch) mesh with
    per-scenario weights and per-scenario convergence freeze."""
    from ipx_tpu.parallel.sharding import sharded_batched_cr_solve
    devices = jax.local_devices(backend="cpu")
    assert len(devices) >= 8
    mesh = Mesh(np.array(devices[:8]).reshape(4, 2),
                axis_names=("rows", "batch"))

    a = random_lp(64, 90, density=0.15, seed=7)
    A = sp.csc_matrix((a["Ax"], a["Ai"], a["Ap"]),
                      shape=(a["num_constr"], a["num_var"]))
    m, n = A.shape
    B = 6
    rng = np.random.default_rng(1)
    W = rng.uniform(0.5, 2.0, size=(n + m, B))
    A2 = A.copy()
    A2.data = A2.data ** 2
    diag = np.asarray(A2 @ W[:n]) + W[n:]
    RHS = rng.standard_normal((m, B))

    snm = ShardedNormalMatrix(A, num_blocks=4)
    Y, iters = sharded_batched_cr_solve(
        snm, W[:n], W[n:], diag, RHS, tol=1e-10, maxiter=2000, mesh=mesh)
    assert iters > 0
    for k in range(B):
        w, y, rhs = W[:, k], Y[:, k], RHS[:, k]
        res = rhs - (A @ (w[:n] * (A.T @ y)) + w[n:] * y)
        assert np.max(np.abs(res)) <= 1e-9 * max(1.0, np.abs(rhs).max()), k


def test_sharded_full_solve_via_lp_solver():
    """A sharded full solve of one LP through the public API matches the
    unsharded objective (VERDICT r2 item 3: Parameters.shards wires the
    mesh CR into LpSolver's phase-1 KKT path)."""
    from ipx_tpu import LpSolver, Parameters
    from ipx_tpu.testgen import transportation, load_into_solver

    data = transportation(60, 90, 0.05, seed=3)

    p0 = Parameters()
    p0.display = 0
    p0.device = "cpu"
    s0 = LpSolver(p0)
    load_into_solver(data, s0)
    assert s0.solve() == 1000
    ref_obj = s0.get_info().pobjval

    p = Parameters()
    p.display = 0
    p.shards = 4
    s = LpSolver(p)
    load_into_solver(data, s)
    assert s.solve() == 1000
    info = s.get_info()
    assert info.pobjval == pytest.approx(ref_obj, rel=1e-7)
    assert info.kktiter1 > 0


def test_sharded_phase2_full_solve_parity_10k():
    """Phase-2 NNt runs the mesh path (VERDICT r3 item 2) during a full
    public-API solve at m >= 10k, with objective parity against the
    unsharded solve."""
    from ipx_tpu import LpSolver, Parameters
    from ipx_tpu.testgen import transportation, load_into_solver

    data = transportation(4000, 6000, 0.002, seed=2)
    assert data["num_constr"] >= 10000

    p0 = Parameters()
    p0.display = 0
    p0.device = "cpu"
    s0 = LpSolver(p0)
    load_into_solver(data, s0)
    assert s0.solve() == 1000
    ref_obj = s0.get_info().pobjval

    p = Parameters()
    p.display = 0
    p.shards = 4
    s = LpSolver(p)
    load_into_solver(data, s)
    assert s.solve() == 1000
    info = s.get_info()
    assert info.pobjval == pytest.approx(ref_obj, rel=1e-7)
    # the sharded phase-2 engine must actually have run the mesh NNt
    nnt = getattr(s.model, "_sharded_nnt", None)
    assert nnt is not None and nnt[1].applies > 0
    assert info.kktiter2 > 0
