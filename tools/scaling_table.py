"""CPU-mesh scaling table for the row-sharded phase-1 CR (VERDICT r4
item 7; BASELINE.md "scaling efficiency at 1 chip, 1 host, N hosts").

Runs ShardedDiagCR (the Parameters.shards mesh path: shard_map + psum
over a row-block mesh) at 1/2/4/8 virtual CPU devices on a fixed
m=20k normal-equations system with a FIXED iteration count, and writes
docs/SCALING.tbl.

Interpretation on this 2-core VM: the virtual devices SHARE two physical
cores, so total arithmetic is constant across mesh sizes and the ratio
t_d / t_1 isolates the partition + collective overhead of the sharded
program (the quantity that eats scaling efficiency on real multi-chip
meshes, where per-device arithmetic additionally shrinks by 1/d). A
ratio near 1 means the program's collectives are cheap enough that real
chips would scale near-linearly at this size.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python tools/scaling_table.py
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")


def main():
    import numpy as np
    import jax
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_default_device",
                          jax.local_devices(backend="cpu")[0])
    except Exception:
        pass
    import scipy.sparse as sp
    from ipx_tpu.testgen import transportation
    from ipx_tpu.parallel.sharding import ShardedDiagCR

    data = transportation(8000, 12000, 0.001, 1)
    m, n = data["num_constr"], data["num_var"]
    A = sp.csc_matrix((data["Ax"], data["Ai"], data["Ap"]), shape=(m, n))
    rng = np.random.default_rng(0)
    W = rng.uniform(0.5, 2.0, size=n + m)
    A2 = A.copy()
    A2.data = A2.data ** 2
    diag = np.asarray(A2 @ W[:n]).ravel() + W[n:]
    rhs = rng.standard_normal(m)
    resscale = 1.0 / np.sqrt(W[n:])
    ITERS = 200

    from jax.sharding import Mesh
    cpu_devs = jax.local_devices(backend="cpu")
    rows = []
    t1 = None
    for d in (1, 2, 4, 8):
        # explicit CPU mesh: jax.devices() is the TPU attachment even
        # under JAX_PLATFORMS=cpu (the axon plugin ignores it), and the
        # remote TPU AOT compiler rejects pmax collectives
        mesh = Mesh(np.array(cpu_devs[:d]), ("rows",))
        cr = ShardedDiagCR(A, d, mesh=mesh)
        # warm-up (compile)
        cr.solve(W[:n], W[n:], diag, resscale, rhs, 0.0, 5)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            y, iters, err = cr.solve(W[:n], W[n:], diag, resscale, rhs,
                                     0.0, ITERS)
            dt = time.perf_counter() - t0
            assert iters == ITERS, (iters, err)
            best = dt if best is None else min(best, dt)
        mv = ITERS / best
        if t1 is None:
            t1 = best
        rows.append((d, best, mv, best / t1))
        print(f"devices={d}: {best:.2f}s {mv:.1f} matvec/s "
              f"overhead x{best / t1:.2f}", flush=True)

    lines = ["# Row-sharded phase-1 CR on the virtual CPU mesh "
             "(tools/scaling_table.py)",
             f"# m={m} n={n} nnz={A.nnz} fixed {ITERS} CR iterations, "
             "best of 3",
             "# NOTE: virtual devices share 2 physical cores - total",
             "# arithmetic is constant across mesh sizes, so t_d/t_1",
             "# isolates partition+collective overhead (on real chips",
             "# per-device arithmetic additionally shrinks by 1/d).",
             f"{'devices':>8s} {'wall_s':>8s} {'matvec/s':>10s} "
             f"{'t_d/t_1':>8s}"]
    for d, dt, mv, ratio in rows:
        lines.append(f"{d:>8d} {dt:>8.2f} {mv:>10.1f} {ratio:>8.2f}")
    out = os.path.join(REPO, "docs", "SCALING.tbl")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
