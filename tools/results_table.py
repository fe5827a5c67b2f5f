"""Per-instance results table (the committed benchmark artifact).

Counterpart of the reference's committed result tables
(reference: benchmark/results/diverse.tbl, srd.tbl, nug.tbl,
benchmark/README.txt:5-28): solves the testgen families at reference-like
sizes with default parameters and records status, objective (cross-checked
against HiGHS where it finishes), wall-clock, IPM iterations, CR iteration
counts and the Info time breakdown. Netlib/Mittelmann files are not
fetchable in this environment (zero egress), so the synthetic families at
matching sizes stand in — same structure classes the reference benchmarks:
transportation (network), staircase (srd), grid (network flow),
production (dense-ish columns), assignment (nug-style degeneracy).

Regenerate:  python tools/results_table.py          (ref sizes, ~10-15 min)
             python tools/results_table.py --quick  (small tier, <1 min)

The quick tier is pinned by tests/test_results_table.py.
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def instances(tier):
    import ipx_tpu.testgen as tg
    if tier == "quick":
        yield "transport(300,450)", tg.transportation(300, 450, 0.02, 1)
        yield "staircase(20,150)", tg.staircase(20, 150, seed=1)
        yield "grid(40,40)", tg.grid_flow(40, 40, seed=1)
        yield "production(500,60)", tg.production(500, 60, seed=1)
        yield "assignment(60)", tg.assignment(60, seed=1)
        return
    yield "transport(8000,12000)", tg.transportation(8000, 12000, 0.001, 1)
    yield "transport(40000,60000)", tg.transportation(40000, 60000, 2e-4, 1)
    yield "staircase(120,1500)", tg.staircase(120, 1500, seed=1)
    yield "staircase(300,2000)", tg.staircase(300, 2000, seed=1)
    yield "grid(200,200)", tg.grid_flow(200, 200, seed=1)
    yield "production(20000,2000)", tg.production(20000, 2000, seed=1)
    yield "assignment(300)", tg.assignment(300, seed=1)


def run_ours(data, time_limit):
    from ipx_tpu import LpSolver, Parameters
    from ipx_tpu.testgen import load_into_solver
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    p.time_limit = time_limit
    s = LpSolver(p)
    load_into_solver(data, s)
    t0 = time.perf_counter()
    status = s.solve()
    dt = time.perf_counter() - t0
    i = s.get_info()
    return dict(status=status, obj=i.pobjval, time=dt, iter=i.iter,
                k1=i.kktiter1, k2=i.kktiter2, t1=i.time_ipm1,
                t2=i.time_ipm2, tmx=i.time_maxvol, txo=i.time_crossover)


_HIGHS_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
import ipx_tpu.testgen as tg
import bench
data = eval(%(expr)r, {"tg": tg})
t, st = bench.highs_solve_time(data, "highs-ipm")
import scipy.sparse as sp
print(json.dumps({"t": t, "status": st}))
"""


def run_highs(expr, timeout_s):
    """HiGHS comparator in a subprocess (scipy linprog has no time limit)."""
    code = _HIGHS_CHILD % {"repo": REPO, "expr": expr}
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s)
        for line in (out.stdout or "").strip().splitlines()[::-1]:
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        pass
    return None


def highs_obj(data, timeout_s):
    """HiGHS objective for the cross-check, run in-process with a small
    instance only (the table's large instances compare statuses/time)."""
    import bench
    from scipy.optimize import linprog
    import scipy.sparse as sp
    m, n = data["num_constr"], data["num_var"]
    A = sp.csc_matrix((data["Ax"], data["Ai"], data["Ap"]), shape=(m, n))
    ct = np.array(list(data["constr_type"]))
    eq, lt, gt = ct == "=", ct == "<", ct == ">"
    parts, bparts = [], []
    if lt.any():
        parts.append(A[np.nonzero(lt)[0]])
        bparts.append(data["rhs"][lt])
    if gt.any():
        parts.append(-A[np.nonzero(gt)[0]])
        bparts.append(-data["rhs"][gt])
    res = linprog(
        data["obj"], method="highs-ipm",
        A_ub=sp.vstack(parts) if parts else None,
        b_ub=np.concatenate(bparts) if bparts else None,
        A_eq=A[np.nonzero(eq)[0]] if eq.any() else None,
        b_eq=data["rhs"][eq] if eq.any() else None,
        bounds=np.stack([data["lb"], data["ub"]], axis=1))
    return (res.fun, int(res.status))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    tier = "quick" if args.quick else "ref"
    time_limit = 120.0 if args.quick else 1200.0

    exprs = {
        "transport(8000,12000)": "tg.transportation(8000, 12000, 0.001, 1)",
        "transport(40000,60000)":
            "tg.transportation(40000, 60000, 2e-4, 1)",
        "staircase(120,1500)": "tg.staircase(120, 1500, seed=1)",
        "staircase(300,2000)": "tg.staircase(300, 2000, seed=1)",
        "grid(200,200)": "tg.grid_flow(200, 200, seed=1)",
        "production(20000,2000)": "tg.production(20000, 2000, seed=1)",
        "assignment(300)": "tg.assignment(300, seed=1)",
    }

    hdr = (f"{'instance':24s} {'m':>7s} {'n':>8s} {'nnz':>9s} {'status':>6s} "
           f"{'objective':>16s} {'relHiGHS':>9s} {'time':>8s} {'hg_time':>8s}"
           f" {'iter':>5s} {'kkt1':>6s} {'kkt2':>6s} {'t_ipm1':>7s} "
           f"{'t_ipm2':>7s} {'t_mxv':>6s} {'t_xo':>6s}")
    lines = [hdr, "-" * len(hdr)]
    print(hdr, flush=True)
    for name, data in instances(tier):
        m, n = data["num_constr"], data["num_var"]
        nnz = int(data["Ap"][-1])
        r = run_ours(data, time_limit)
        # objective cross-check: in-process on small instances, subprocess
        # wall-clock comparison on the large tier
        rel = float("nan")
        hg_t = float("nan")
        if m <= 50000 and nnz <= 2_500_000:
            t0 = time.perf_counter()
            obj_h, st_h = highs_obj(data, time_limit)
            hg_t = time.perf_counter() - t0
            if st_h == 0 and obj_h is not None:
                rel = abs(r["obj"] - obj_h) / max(1.0, abs(obj_h))
        else:
            h = run_highs(exprs.get(name, ""), time_limit + 300)
            if h:
                hg_t = h["t"]
        line = (f"{name:24s} {m:7d} {n:8d} {nnz:9d} {r['status']:>6d} "
                f"{r['obj']:16.8g} {rel:9.2e} {r['time']:8.2f} {hg_t:8.2f}"
                f" {r['iter']:5d} {r['k1']:6d} {r['k2']:6d} {r['t1']:7.2f} "
                f"{r['t2']:7.2f} {r['tmx']:6.2f} {r['txo']:6.2f}")
        lines.append(line)
        print(line, flush=True)
    out = os.path.join(REPO, "docs",
                       "RESULTS.tbl" if tier == "ref" else
                       "RESULTS_quick.tbl")
    with open(out, "w") as f:
        f.write("# ipx_tpu per-instance results (testgen families at "
                "reference-like sizes)\n")
        f.write("# regenerate: python tools/results_table.py"
                + (" --quick" if tier == "quick" else "") + "\n")
        f.write("# relHiGHS = |obj - obj_HiGHS-ipm| / max(1,|obj_HiGHS|); "
                "nan = comparator not run in-process (see hg_time)\n")
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
