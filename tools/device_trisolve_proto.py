"""On-device level-scheduled sparse triangular solve prototype
(VERDICT r4 item 8 / SURVEY §7.4 item 1).

Takes a REAL basis factor from a solved m=20k transportation LP
(scipy splu of B as a stand-in with the same structure class as the
native factor), computes the level schedule of L, packs padded per-level
CSR arrays, and runs the whole forward solve as ONE jitted
lax.fori_loop over levels on the device — for B=1 and B=256
right-hand sides — against the host paths (native hypersparse
solve_dense / blocked solve_dense_block).

Network bases have shallow elimination trees (24 levels at m=20k), so
the sequential depth is small; the question is whether per-level
gather/segment/scatter op latency on the chip beats the host's
cache-resident sweep. Prints one JSON line; results go to
docs/DEVICE_r05.md.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "device"
    src = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    snk = int(sys.argv[3]) if len(sys.argv) > 3 else 12000
    dens = float(sys.argv[4]) if len(sys.argv) > 4 else 0.001
    if backend == "host":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("JAX_ENABLE_X64", "1")
    import numpy as np
    import scipy.sparse as sp
    import jax
    jax.config.update("jax_enable_x64", True)
    if backend == "host":
        jax.config.update("jax_default_device",
                          jax.local_devices(backend="cpu")[0])
    import jax.numpy as jnp
    from jax import lax

    from ipx_tpu import LpSolver, Parameters
    from ipx_tpu.testgen import transportation, load_into_solver

    data = transportation(src, snk, dens, 1)
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    p.crossover = 0
    s = LpSolver(p)
    load_into_solver(data, s)
    assert s.solve() == 1000
    basis = s.basis
    md = basis.model
    m, n = md.num_rows, md.num_cols
    cols = np.asarray(basis.basis)
    A = md.A.tocsc()
    eye = sp.eye(m, format="csc")
    Bm = sp.hstack([A[:, cols[cols < n]], eye[:, cols[cols >= n] - n]],
                   format="csc").tocsc()
    lu = sp.linalg.splu(Bm, permc_spec="COLAMD")
    L = lu.L.tocsr()

    # ---- level schedule + padded per-level CSR pack --------------------
    def pack(T, lower: bool):
        """Level schedule of a triangular CSR matrix (forward for lower,
        backward for upper), packed as padded per-level arrays."""
        indptr, indices, vals = T.indptr, T.indices, T.data
        lev = np.zeros(m, dtype=np.int64)
        order = range(m) if lower else range(m - 1, -1, -1)
        for i in order:
            deps = indices[indptr[i]:indptr[i + 1]]
            deps = deps[deps < i] if lower else deps[deps > i]
            if len(deps):
                lev[i] = lev[deps].max() + 1
        nlev = int(lev.max()) + 1
        rows_of = [np.where(lev == l)[0] for l in range(nlev)]
        Rmax = max(len(r) for r in rows_of)
        ecount = []
        for r in rows_of:
            tot = 0
            for i in r:
                dep = indices[indptr[i]:indptr[i + 1]]
                tot += int(np.sum(dep < i if lower else dep > i))
            ecount.append(tot)
        Emax = max(max(ecount), 1)
        lev_rows = np.full((nlev, Rmax), m, dtype=np.int32)
        lev_inv = np.zeros((nlev, Rmax))
        lev_cols = np.full((nlev, Emax), m, dtype=np.int32)
        lev_vals = np.zeros((nlev, Emax))
        lev_dst = np.full((nlev, Emax), Rmax, dtype=np.int32)
        dia = T.diagonal()
        for l, r in enumerate(rows_of):
            lev_rows[l, :len(r)] = r
            lev_inv[l, :len(r)] = 1.0 / dia[r]
            e = 0
            for k, i in enumerate(r):
                dep = indices[indptr[i]:indptr[i + 1]]
                val = vals[indptr[i]:indptr[i + 1]]
                mask = dep < i if lower else dep > i
                cnt = int(mask.sum())
                lev_cols[l, e:e + cnt] = dep[mask]
                lev_vals[l, e:e + cnt] = val[mask]
                lev_dst[l, e:e + cnt] = k
                e += cnt
        tree = dict(rows=jnp.asarray(lev_rows), inv=jnp.asarray(lev_inv),
                    cols=jnp.asarray(lev_cols), vals=jnp.asarray(lev_vals),
                    dst=jnp.asarray(lev_dst))
        return tree, nlev, Rmax, Emax

    U = lu.U.tocsr()
    treeL, nlevL, RmaxL, EmaxL = pack(L, True)
    treeU, nlevU, RmaxU, EmaxU = pack(U, False)

    def level_solve(tr, nlev, Rmax, Bv):
        """One triangular level solve: Bv (m, B) -> x (m, B)."""
        Bw = Bv.shape[1]
        x = jnp.zeros((m + 1, Bw), Bv.dtype)
        b_ext = jnp.concatenate([Bv, jnp.zeros((1, Bw), Bv.dtype)])

        def body(l, x):
            g = tr["vals"][l][:, None] * x[tr["cols"][l], :]
            ssum = jax.ops.segment_sum(g, tr["dst"][l],
                                       num_segments=Rmax + 1)[:Rmax]
            xi = (b_ext[tr["rows"][l], :] - ssum) * tr["inv"][l][:, None]
            return x.at[tr["rows"][l], :].set(xi, mode="drop")

        x = lax.fori_loop(0, nlev, body, x)
        return x[:m]

    def full_solve(trL, trU, Bv):
        """B x = b through both sweeps (row/col perms omitted — they are
        gathers fused into the first/last level in a production version)."""
        y = level_solve(trL, nlevL, RmaxL, Bv)
        return level_solve(trU, nlevU, RmaxU, y)

    fnL = jax.jit(lambda tr, v: level_solve(tr, nlevL, RmaxL, v))
    fnF = jax.jit(full_solve)
    rng = np.random.default_rng(0)
    out = {"backend": backend, "m": m, "levels_L": nlevL,
           "levels_U": nlevU, "Rmax": RmaxL, "Emax": EmaxL,
           "nnzL": int(L.nnz), "nnzU": int(U.nnz)}

    for Bw in (1, 256, 1024):
        V = jnp.asarray(rng.standard_normal((m, Bw)))
        t0 = time.perf_counter()
        X = fnL(treeL, V)
        jax.block_until_ready(X)
        out[f"compile_B{Bw}_s"] = round(time.perf_counter() - t0, 1)
        ref = sp.linalg.spsolve_triangular(L.tocsr(),
                                           np.asarray(V)[:, :min(Bw, 8)],
                                           lower=True)
        err = float(np.max(np.abs(np.asarray(X)[:, :min(Bw, 8)] - ref))
                    / max(1.0, np.abs(ref).max()))
        out[f"relerr_B{Bw}"] = float(f"{err:.2e}")
        reps = 50 if Bw == 1 else 20
        t0 = time.perf_counter()
        for _ in range(reps):
            X = fnL(treeL, V)
        jax.block_until_ready(X)
        out[f"lvl_solveL_B{Bw}_ms"] = round(
            (time.perf_counter() - t0) / reps * 1000, 2)
        # full L+U solve
        XF = fnF(treeL, treeU, V)
        jax.block_until_ready(XF)
        t0 = time.perf_counter()
        for _ in range(reps):
            XF = fnF(treeL, treeU, V)
        jax.block_until_ready(XF)
        out[f"full_solve_B{Bw}_ms"] = round(
            (time.perf_counter() - t0) / reps * 1000, 2)

    # host baselines: the production native paths
    b1 = rng.standard_normal(m)
    t0 = time.perf_counter()
    for _ in range(50):
        basis.solve_dense(b1, "N")
    out["host_native_solve_ms"] = round((time.perf_counter() - t0) / 50
                                        * 1000, 2)
    for Bw in (256, 1024):
        V = np.ascontiguousarray(rng.standard_normal((m, Bw)))
        t0 = time.perf_counter()
        for _ in range(5):
            basis.lu.solve_dense_block(V, False)
        out[f"host_blocked_solve{Bw}_ms"] = round(
            (time.perf_counter() - t0) / 5 * 1000, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
