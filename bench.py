"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric: phase-1 KKT matvec throughput (normal-equations applies per second,
the hot loop of the reference per SURVEY.md §3.2) on device via the
scatter-free SpMV, with vs_baseline = speedup over the single-threaded host
SpMV (the proxy for the reference's one-pass CPU matvec,
reference: src/normal_matrix.cc:64-75).

Also solves a mid-size LP end-to-end (2 phases + crossover) as a smoke check
and reports its wall clock in the JSON "extra" field.

Time-bounded: every device attempt runs under a watchdog budget; on an
unhealthy backend the script still emits a valid JSON line using the host
path (vs_baseline 1.0).
"""
import json
import os
import sys
import time

import numpy as np


def build_lp(m, n, nnz_per_col, seed=0):
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    cols = np.repeat(np.arange(n), nnz_per_col)
    rows = rng.integers(0, m, size=cols.size)
    vals = rng.standard_normal(cols.size)
    A = sp.csc_matrix((vals, (rows, cols)), shape=(m, n))
    A.sum_duplicates()
    return A


def host_matvec_rate(A, W, iters=50):
    n = A.shape[1]
    A_csr = A.tocsr()
    v = np.random.default_rng(1).standard_normal(A.shape[0])
    # warm
    u = (v @ A_csr) * W[:n]
    out = A @ u + W[n:] * v
    t0 = time.perf_counter()
    for _ in range(iters):
        u = (v @ A_csr) * W[:n]
        out = A @ u + W[n:] * v
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt, out


def device_matvec_rate(A, W, budget_s=240.0, batch=None):
    """Returns (applies/sec, ok). batch=None: single vector; otherwise the
    batched apply counts batch applies per launch."""
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ipx_tpu.ops.spmv import NormalMatrixDevice

    m, n = A.shape
    nmd = NormalMatrixDevice(A)
    Wj = jnp.asarray(W)
    rng = np.random.default_rng(1)
    if batch:
        V = jnp.asarray(rng.standard_normal((m, batch)))
        Wb = jnp.asarray(np.repeat(W[:, None], batch, axis=1))
        fn = jax.jit(lambda V: nmd.apply_batched(Wb, V))
    else:
        V = jnp.asarray(rng.standard_normal(m))
        fn = jax.jit(lambda v: nmd.apply(Wj, v))

    t0 = time.perf_counter()
    out = fn(V)
    jax.block_until_ready(out)
    compile_time = time.perf_counter() - t0
    if compile_time > budget_s:
        return 0.0, False

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(V)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    applies = (batch or 1) / dt
    return applies, True


def full_solve_time(m=2000, n=3000, seed=3):
    from ipx_tpu import LpSolver, Parameters
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    A = build_lp(m, n, 6, seed)
    x0 = rng.uniform(0.5, 1.5, size=n)
    b = A @ x0 + rng.uniform(0.1, 1.0, size=m)
    c = rng.standard_normal(n)
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    s = LpSolver(p)
    s.load_model(n, c, np.zeros(n), np.full(n, 10.0), m,
                 A.indptr, A.indices, A.data, b, "<" * m)
    t0 = time.perf_counter()
    status = s.solve()
    dt = time.perf_counter() - t0
    info = s.get_info()
    return dt, status, info.status_ipm, info.status_crossover


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # benchmark instance: medium sparse LP normal-matrix apply
    m, n = 50_000, 75_000
    A = build_lp(m, n, 6)
    rng = np.random.default_rng(2)
    W = rng.uniform(0.5, 2.0, size=n + m)

    host_rate, _ = host_matvec_rate(A, W)

    dev_rate, ok = 0.0, False
    try:
        dev_rate, ok = device_matvec_rate(A, W, batch=64)
    except Exception:
        ok = False
    if not ok:
        try:
            dev_rate, ok = device_matvec_rate(A, W, batch=None)
        except Exception:
            ok = False

    solve_dt, status, st_ipm, st_xover = full_solve_time()

    rate = dev_rate if ok else host_rate
    result = {
        "metric": "kkt_matvec_throughput",
        "value": round(rate, 2),
        "unit": "applies/s (m=50k nnz=450k normal-equations applies)",
        "vs_baseline": round(rate / host_rate, 3),
        "extra": {
            "host_applies_per_s": round(host_rate, 2),
            "device_path": bool(ok),
            "full_solve_2000x3000_s": round(solve_dt, 3),
            "full_solve_status": [status, st_ipm, st_xover],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
