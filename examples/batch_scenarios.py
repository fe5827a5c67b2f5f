"""Example: solve a fleet of scenario LPs on device in one batched IPM.

Capability with no counterpart in the reference solver: many LPs sharing one
constraint matrix with perturbed rhs/cost solve simultaneously, the whole
interior point method running as jitted device code.
"""
import os
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(batch=16):
    # Default to the CPU backend: the demo is about the API, and some TPU
    # attachments (remote-compile tunnels) take minutes to compile the
    # batched program. Pass --tpu to use the default accelerator.
    if "--tpu" not in sys.argv:
        import jax
        try:
            cpu = jax.local_devices(backend="cpu")[0]
            jax.config.update("jax_default_device", cpu)
        except Exception:
            pass
    from ipx_tpu.parallel.batch import BatchedLp, BatchedPhase1Solver
    from ipx_tpu.testgen import production

    data = production(150, 120, nnz_per_col=5, seed=0)
    m, n = data["num_constr"], data["num_var"]
    A = sp.csc_matrix((data["Ax"], data["Ai"], data["Ap"]), shape=(m, n))

    rng = np.random.default_rng(1)
    b = data["rhs"][None, :] * rng.uniform(0.9, 1.1, size=(batch, m))
    c = np.zeros((batch, n + m))
    c[:, :n] = data["obj"][None, :] * rng.uniform(0.9, 1.1, size=(batch, n))
    lp = BatchedLp(A=A, b=b, c=c,
                   lb=np.concatenate([data["lb"], np.zeros(m)]),
                   ub=np.concatenate([data["ub"], np.full(m, np.inf)]))

    solver = BatchedPhase1Solver(lp, maxiter=100)
    out = solver.solve()
    print(f"{batch} scenarios: {int(out['done'].sum())} converged, "
          f"iterations {out['iters'].min()}..{out['iters'].max()}")
    print("objectives:", np.round(out["pobj"][:8], 4), "...")


if __name__ == "__main__":
    main()
