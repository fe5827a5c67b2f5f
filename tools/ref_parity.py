"""Mine the reference's committed benchmark logfiles for unit-level
algorithmic-efficiency anchors and compare this solver's testgen families
against them (VERDICT r3 item 6).

The reference repo ships full IPX 1.0 logs with machine-readable `info.*`
dumps (/root/reference/benchmark/logfiles/{srd,nug,diverse*}/ipx/*.log,
format reference: src/info.cc:20-115). Objective parity vs HiGHS is
covered elsewhere (docs/RESULTS.tbl); what these anchors add is the
*algorithmic efficiency* half: IPM iteration counts, CR iterations per
IPM iteration (kktiter2/iter — preconditioner quality), basis updates per
iteration (maxvolume behavior) and crossover push volume, which must land
in the same bands for capability parity with the reference.

Usage:
    python tools/ref_parity.py              # table to stdout + docs/
    python tools/ref_parity.py --json       # machine-readable
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REF_LOGS = "/root/reference/benchmark/logfiles"


def parse_ipx_log(path):
    """Extracts name/dims/counters from one reference IPX logfile."""
    out = {}
    txt = open(path, errors="replace").read()
    m = re.search(r"^name:\s*(\S+)", txt, re.M)
    out["name"] = m.group(1) if m else os.path.basename(path)
    for field, key in [
            (r"Number of constraints:\s*(\d+)", "rows"),
            (r"Number of variables:\s*(\d+)", "cols"),
            (r"Number of matrix entries:\s*(\d+)", "nnz"),
            (r"Number of dual pushes required:\s*(\d+)", "dual_pushes"),
            (r"Number of primal pushes required:\s*(\d+)",
             "primal_pushes")]:
        m = re.search(field, txt)
        if m:
            out[key] = int(m.group(1))
    for key in ("iter", "kktiter1", "kktiter2", "updates_start",
                "updates_ipm", "updates_crossover"):
        m = re.search(rf"info\.{key}\s+(-?\d+)", txt)
        if m:
            out[key] = int(m.group(1))
    for key in ("time_total", "time_ipm2", "time_crossover"):
        m = re.search(rf"info\.{key}\s+([\d.]+)", txt)
        if m:
            out[key] = float(m.group(1))
    return out


def reference_anchors():
    """Parses every committed IPX logfile; returns {name: stats}."""
    anchors = {}
    for group in ("srd", "nug", "diverse", "diverse_small"):
        d = os.path.join(REF_LOGS, group, "ipx")
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if not f.endswith(".log"):
                continue
            st = parse_ipx_log(os.path.join(d, f))
            if "iter" in st and st.get("iter", 0) > 0:
                st["group"] = group
                anchors[st["name"]] = st
    return anchors


def derived(st):
    it = max(st.get("iter", 0), 1)
    return dict(
        iter=st.get("iter"),
        kkt2_per_iter=round(st.get("kktiter2", 0) / it, 1),
        upd_per_iter=round(st.get("updates_ipm", 0) / it, 1),
        pushes_per_krow=round(
            (st.get("dual_pushes", 0) + st.get("primal_pushes", 0))
            / max(st.get("rows", 1), 1) * 1000, 1),
    )


def solve_ours(name, data):
    import time
    from ipx_tpu import LpSolver, Parameters
    from ipx_tpu.testgen import load_into_solver
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    s = LpSolver(p)
    load_into_solver(data, s)
    t0 = time.perf_counter()
    status = s.solve()
    dt = time.perf_counter() - t0
    i = s.get_info()
    return dict(name=name, rows=data["num_constr"], cols=data["num_var"],
                status=status, iter=i.iter, kktiter1=i.kktiter1,
                kktiter2=i.kktiter2, updates_ipm=i.updates_ipm,
                dual_pushes=i.pushes_dual
                if hasattr(i, "pushes_dual") else 0,
                primal_pushes=i.pushes_primal
                if hasattr(i, "pushes_primal") else 0,
                time_total=dt)


def main():
    import ipx_tpu.testgen as tg
    anchors = reference_anchors()

    # matched-class pairs: (reference anchor, our testgen instance).
    # Class matching: srdNNN are stochastic multi-period staircases;
    # nugNN are QAP linearizations (dense assignment-like, massively
    # degenerate); ken-18 is a multicommodity network (our transportation
    # class); pds-100 is a pure network-flow family (our grid class);
    # cre-b is a resource-allocation LP (our production class).
    pairs = [
        ("srd060", "staircase(120,1500)",
         lambda: tg.staircase(120, 1500, seed=1)),
        ("srd180", "staircase(240,1500)",
         lambda: tg.staircase(240, 1500, seed=1)),
        ("nug12", "assignment(300)", lambda: tg.assignment(300, seed=1)),
        ("nug15", "assignment(400)", lambda: tg.assignment(400, seed=1)),
        ("ken-18", "transport(2000,3000)",
         lambda: tg.transportation(2000, 3000, 0.004, 1)),
        ("pds-100", "grid_flow(150,150)",
         lambda: tg.grid_flow(150, 150, seed=1)),
        ("cre-b", "production(5000,1500)",
         lambda: tg.production(5000, 1500, seed=1)),
    ]
    rows = []
    for ref_name, our_name, gen in pairs:
        if ref_name not in anchors:
            continue
        ours = solve_ours(our_name, gen())
        rows.append((anchors[ref_name], ours))

    hdr = (f"{'instance':22s} {'m':>8s} {'iter':>5s} {'kkt2/it':>8s} "
           f"{'upd/it':>8s} {'push/krow':>10s}")
    lines = [hdr]
    for ref, ours in rows:
        for tag, st in (("ref:" + ref["name"], ref),
                        ("ours:" + ours["name"], ours)):
            d = derived(st)
            lines.append(
                f"{tag:22s} {st.get('rows', 0):>8d} {d['iter']:>5d} "
                f"{d['kkt2_per_iter']:>8.1f} {d['upd_per_iter']:>8.1f} "
                f"{d['pushes_per_krow']:>10.1f}")
    table = "\n".join(lines)
    print(table)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "docs", "REF_PARITY.tbl"), "w") as f:
        f.write(table + "\n")
        f.write("\n# ref anchors parsed from the committed IPX 1.0 logs\n"
                "# (/root/reference/benchmark/logfiles/*/ipx/*.log);\n"
                "# 'ours' are matched-class testgen instances. kkt2/it =\n"
                "# basis-preconditioner quality, upd/it = maxvolume churn,\n"
                "# push/krow = crossover pushes per 1000 rows.\n")
    if "--json" in sys.argv:
        print(json.dumps({r["name"]: derived(r)
                          for r in anchors.values()}))


if __name__ == "__main__":
    main()
