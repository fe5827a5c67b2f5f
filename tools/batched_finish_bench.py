"""Batched-finish benchmark (VERDICT r3 item 3 / r4 item 2).

Measures the per-scenario cost of finishing a scenario batch to vertex
solutions from an IDENTICAL batched phase-1 state, under three finish
strategies:

  r3    — per-scenario warm finishes only (each builds its own starting
          basis; the round-3 pipeline),
  r4    — shared mean-scenario basis + batched polish, stagnation exit,
          then per-scenario finishes (the round-4 pipeline),
  r5    — r4 plus the per-scenario low-rank preconditioner correction in
          the polish (SharedBasisLowRank, parallel/batch2.py).

Prints one JSON line with ms/scenario per strategy and the speedups.

Usage: python tools/batched_finish_bench.py [--src 800 --snk 1200 --B 64]
"""
import argparse
import copy
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", type=int, default=800)
    ap.add_argument("--snk", type=int, default=1200)
    ap.add_argument("--density", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--phase1-tol", type=float, default=1e-4)
    args = ap.parse_args()

    import numpy as np
    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_device",
                      jax.local_devices(backend="cpu")[0])

    import ipx_tpu.testgen as tg
    from ipx_tpu.parallel.batch import BatchedScenarioSolver
    from ipx_tpu.parallel.batch import BatchedPhase1Solver

    data = tg.transportation(args.src, args.snk, args.density, args.seed)
    m = data["num_constr"]
    ns = args.src
    rng = np.random.default_rng(0)
    B = args.B
    fac = np.empty((B, m))
    fac[:, :ns] = rng.uniform(1.0, 1.1, size=(B, ns))
    fac[:, ns:] = rng.uniform(0.9, 1.0, size=(B, m - ns))
    b_batch = data["rhs"][None, :] * fac

    # shared phase-1 state (computed once; identical input to every
    # strategy)
    bss = BatchedScenarioSolver(data, b_batch, phase2_polish=False,
                                phase1_tol=args.phase1_tol)
    ph1 = BatchedPhase1Solver(bss.blp, feasibility_tol=args.phase1_tol,
                              optimality_tol=args.phase1_tol, maxiter=100)
    t0 = time.perf_counter()
    state = ph1.solve()
    t_phase1 = time.perf_counter() - t0
    state = {k: np.asarray(v) for k, v in state.items()}

    def run(tag, polish, correction):
        s = BatchedScenarioSolver(data, b_batch, phase2_polish=False,
                                  phase1_tol=args.phase1_tol)
        out = {k: v.copy() for k, v in state.items()}
        t0 = time.perf_counter()
        if polish:
            s.phase2_polish = True
            out = s._polish(out)
            if not correction:
                pass
        res = s._finish(out)
        dt = time.perf_counter() - t0
        ok = sum(1 for st, info, _ in res if st == 1000)
        iters = [info.iter for _, info, _ in res]
        return dict(ms_per_scen=round(dt / B * 1000, 2),
                    total_s=round(dt, 2), optimal=ok,
                    mean_finish_iters=round(float(np.mean(iters)), 2))

    import ipx_tpu.parallel.batch2 as b2

    # r3: no shared basis, no polish — per-scenario finishes only
    import ipx_tpu.parallel.batch as bmod
    saved = bmod.BatchedScenarioSolver._solve_mean_basis
    bmod.BatchedScenarioSolver._solve_mean_basis = lambda self: None
    r3 = run("r3", polish=False, correction=False)
    bmod.BatchedScenarioSolver._solve_mean_basis = saved

    # r4: shared basis + polish without the low-rank correction
    savedlr = b2.SharedBasisLowRank
    class _Off(savedlr):
        def __init__(self, *a, **k):
            self.active = False
    b2.SharedBasisLowRank = _Off
    r4 = run("r4", polish=True, correction=False)
    b2.SharedBasisLowRank = savedlr

    # r5: full pipeline with the correction
    r5 = run("r5", polish=True, correction=True)

    out = {
        "m": int(m), "n": int(data["num_var"]), "B": B,
        "phase1_s": round(t_phase1, 2),
        "r3_finish_only": r3,
        "r4_shared_basis_polish": r4,
        "r5_polish_with_correction": r5,
        "speedup_r5_vs_r3": round(r3["ms_per_scen"] / r5["ms_per_scen"], 2),
        "speedup_r5_vs_r4": round(r4["ms_per_scen"] / r5["ms_per_scen"], 2),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
