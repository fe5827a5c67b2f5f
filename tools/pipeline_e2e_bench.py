"""End-to-end scenario-batch pipeline: device phase-1 + host finishes
vs a cold per-scenario host loop (the honest full-solve comparison).

Pipeline = batched phase-1 IPM on the accelerator (stopped at the
diag-era handoff, BatchedPhase1Solver.solve), then per-scenario warm
basis-preconditioned finishes on host (BatchedScenarioSolver._finish).
Baseline = solving every scenario cold with the single-LP solver (the
host production path). Prints one JSON line with scenarios/s both ways.

Usage:
    python tools/pipeline_e2e_bench.py --src 8000 --snk 12000 --B 64
    python tools/pipeline_e2e_bench.py --phase1-backend host ...
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", type=int, default=8000)
    ap.add_argument("--snk", type=int, default=12000)
    ap.add_argument("--density", type=float, default=0.001)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--phase1-backend", choices=("device", "host"),
                    default="device")
    ap.add_argument("--cr-maxiter", type=int, default=300)
    ap.add_argument("--cr64-maxiter", type=int, default=100)
    ap.add_argument("--skip-cold", action="store_true")
    args = ap.parse_args()

    if args.phase1_backend == "host":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("JAX_ENABLE_X64", "1")

    import numpy as np
    import jax
    jax.config.update("jax_enable_x64", True)
    if args.phase1_backend == "host":
        jax.config.update("jax_default_device",
                          jax.local_devices(backend="cpu")[0])

    import ipx_tpu.testgen as tg
    from ipx_tpu.parallel.batch import (BatchedScenarioSolver,
                                        BatchedPhase1Solver)
    from ipx_tpu import LpSolver
    from ipx_tpu.parameters import Parameters
    from ipx_tpu.testgen import load_into_solver

    data = tg.transportation(args.src, args.snk, args.density, args.seed)
    m = data["num_constr"]
    ns = args.src
    rng = np.random.default_rng(0)
    B = args.B
    fac = np.empty((B, m))
    fac[:, :ns] = rng.uniform(1.0, 1.1, size=(B, ns))
    fac[:, ns:] = rng.uniform(0.9, 1.0, size=(B, m - ns))
    b_batch = data["rhs"][None, :] * fac

    out = {"m": int(m), "n": int(data["num_var"]), "B": B,
           "phase1_backend": args.phase1_backend}

    # ---- pipeline: batched phase-1 (handoff) + warm finishes ------------
    s = BatchedScenarioSolver(data, b_batch, phase2_polish=False)
    ph1 = BatchedPhase1Solver(s.blp, feasibility_tol=1e-4,
                              optimality_tol=1e-4, maxiter=100,
                              cr_maxiter=args.cr_maxiter,
                              cr64_maxiter=args.cr64_maxiter)
    # warm-up compile (excluded: one-time, persistently cached)
    t0 = time.perf_counter()
    S = ph1._start_fn(ph1._ops_tree, 0)
    S = ph1._step_fn(ph1._ops_tree, S)
    jax.block_until_ready(S["X"])
    del S
    out["compile_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    state = ph1.solve(handoff="auto")
    t_ph1 = time.perf_counter() - t0
    out["phase1_s"] = round(t_ph1, 2)
    out["phase1_steps"] = int(np.asarray(state["iters"]).max())
    out["phase1_cr_trips"] = int(state["cr"])
    out["phase1_mu_med"] = float(np.median(state["mu"]))
    out["phase1_platform"] = args.phase1_backend

    t0 = time.perf_counter()
    res = s._finish(state)
    t_fin = time.perf_counter() - t0
    ok = sum(1 for st_, i, _ in res if st_ == 1000)
    out["finish_s"] = round(t_fin, 2)
    out["finish_ms_per_scen"] = round(t_fin / B * 1000, 1)
    out["finish_mean_iters"] = round(
        float(np.mean([i.iter for _, i, _ in res])), 2)
    out["optimal"] = ok
    out["pipeline_s"] = round(t_ph1 + t_fin, 2)
    out["pipeline_scen_per_s"] = round(B / (t_ph1 + t_fin), 3)
    objs = [i.pobjval for _, i, _ in res]

    # ---- baseline: cold per-scenario host loop --------------------------
    if not args.skip_cold:
        t0 = time.perf_counter()
        cold_objs = []
        tot_it = 0
        for k in range(B):
            p = Parameters()
            p.display = 0
            p.device = "cpu"
            sv = LpSolver(p)
            dk = dict(data)
            dk["rhs"] = b_batch[k]
            load_into_solver(dk, sv)
            st_ = sv.solve()
            assert st_ == 1000, f"cold solve {k}: {st_}"
            cold_objs.append(sv.get_info().pobjval)
            tot_it += sv.get_info().iter
        t_cold = time.perf_counter() - t0
        out["cold_s"] = round(t_cold, 2)
        out["cold_scen_per_s"] = round(B / t_cold, 3)
        out["cold_mean_iters"] = round(tot_it / B, 2)
        out["pipeline_vs_cold"] = round(t_cold / (t_ph1 + t_fin), 2)
        rel = max(abs(a - b) / max(1.0, abs(b))
                  for a, b in zip(objs, cold_objs))
        out["max_obj_rel_diff"] = float(f"{rel:.3e}")

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
