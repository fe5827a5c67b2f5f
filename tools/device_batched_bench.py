"""Device-vs-host sweep of the batched normal-matrix apply (B sweep).

Produces the committed evidence table for docs/DEVICE_r04.md: per-vector-
equivalent throughput of C V = AI W AI' V at the bench headline instance
(transportation m=20k), device f32 (take+segment_sum formulation,
ipx_tpu/ops/spmv.py) vs the host comparators:

  - host native:   the OMP C++ single-vector kernel looped over the batch
                   (ipx_tpu/native, the fastest host path; reference analog
                   src/normal_matrix.cc:64-75)
  - host scipy:    batched sparse*dense products (A @ U)

Usage: python tools/device_batched_bench.py [--rows 20000]
"""
import argparse
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sources", type=int, default=8000)
    ap.add_argument("--sinks", type=int, default=12000)
    ap.add_argument("--density", type=float, default=0.001)
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[8, 32, 64, 128, 256, 512])
    args = ap.parse_args()

    from ipx_tpu.testgen import transportation
    data = transportation(args.sources, args.sinks, args.density, 1)
    m, n = data["num_constr"], data["num_var"]
    A = sp.csc_matrix((data["Ax"], data["Ai"], data["Ap"]), shape=(m, n))
    print(f"# transportation m={m} n={n} nnz={A.nnz}")

    rng = np.random.default_rng(1)
    W = rng.uniform(0.5, 2.0, size=n + m)

    # host native single-vector rate (looped = the honest host batch path)
    from ipx_tpu.model import Model
    from ipx_tpu.user_model import UserModel
    from ipx_tpu.presolve import Presolver
    from ipx_tpu.control import Control
    from ipx_tpu.kkt.normal_matrix import NormalMatrix
    um = UserModel()
    um.load(m, n, data["Ap"], data["Ai"], data["Ax"], data["rhs"],
            data["constr_type"], data["obj"], data["lb"], data["ub"])
    md = Model()
    ctrl = Control()
    ctrl.parameters.display = 0
    ctrl.parameters.scale = 0
    Presolver(um, md).presolve_model(ctrl)
    nm = NormalMatrix(md)
    Wm = rng.uniform(0.5, 2.0, size=md.num_var_all)
    nm.prepare(Wm)
    v = rng.standard_normal(md.num_rows)
    nm.apply(v)
    t0 = time.perf_counter()
    for _ in range(40):
        nm.apply(v)
    native_rate = 40 / (time.perf_counter() - t0)
    print(f"# host native single-vector: {native_rate:.1f} matvec/s")

    AIc = sp.hstack([A, sp.eye(m)], format="csc")
    AIr = AIc.tocsr()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from ipx_tpu.ops.spmv import NormalMatrixDevice

    nmd = NormalMatrixDevice(A, dtype=np.float32)
    print(f"# device: {jax.devices()[0]}")
    print(f"{'B':>5} {'dev_ms':>9} {'dev_mv/s':>10} {'scipy_ms':>9} "
          f"{'scipy_mv/s':>10} {'dev/native':>10}")
    rows = []
    for B in args.batches:
        V = rng.standard_normal((m, B))
        Wb = jnp.asarray(np.broadcast_to(
            W[:, None], (n + m, B)).astype(np.float32))
        Vd = jnp.asarray(V.astype(np.float32))
        K = 20

        def looped(V):
            def body(i, U):
                U = nmd.apply_batched(Wb, U)
                return U / jnp.max(jnp.abs(U))
            return lax.fori_loop(0, K, body, V)

        lfn = jax.jit(looped)
        out = lfn(Vd)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = lfn(Vd)
        jax.block_until_ready(out)
        dev_dt = (time.perf_counter() - t0) / (3 * K)

        # host scipy batched
        t0 = time.perf_counter()
        U = AIc.T @ V
        U *= W[:, None]
        ref = AIr @ U
        scipy_dt = time.perf_counter() - t0

        print(f"{B:5d} {dev_dt*1e3:9.2f} {B/dev_dt:10.1f} "
              f"{scipy_dt*1e3:9.2f} {B/scipy_dt:10.1f} "
              f"{(B/dev_dt)/native_rate:10.2f}")
        rows.append((B, dev_dt, scipy_dt))
    return rows


if __name__ == "__main__":
    main()
