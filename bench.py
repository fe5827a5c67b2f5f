"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: full solve wall-clock of a structured (transportation) LP through
the complete pipeline (presolve -> 2-phase IPM -> crossover), the scenario
the reference's own benchmarks measure (SURVEY.md §6).

vs_baseline compares against scipy's `linprog(method="highs-ipm")` on the
SAME instance — HiGHS embeds the reference IPX itself (compiled C++ with
HiGHS presolve + IPX IPM + crossover), so this is a direct wall-clock ratio
vs CPU IPX, the comparison BASELINE.md asks for. Values > 1 mean this
framework beats the C++ reference end-to-end.

Also reported in "extra": the HiGHS comparator times, the naive-python
speedup (native kernels disabled), and KKT matvec throughput (the
reference's hot loop) for host-native vs device paths. Device attempts run
in a SUBPROCESS with a hard timeout so pathological accelerator compiles
cannot hang the driver. (Batched-scenario throughput is a TPU-scale
capability; on this 2-core host + remote-compile tunnel it is exercised by
tests and the multichip dry run, not timed here.)
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def full_solve(m_sources=8000, m_sinks=12000, seed=1, density=0.001):
    from ipx_tpu import LpSolver, Parameters
    from ipx_tpu.testgen import transportation, load_into_solver
    data = transportation(m_sources, m_sinks, density, seed)
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    s = LpSolver(p)
    load_into_solver(data, s)
    t0 = time.perf_counter()
    status = s.solve()
    dt = time.perf_counter() - t0
    info = s.get_info()
    return dt, data, (status, info.status_ipm, info.status_crossover,
                      info.iter, info.kktiter1 + info.kktiter2)


def highs_solve_time(data, method="highs-ipm"):
    """Wall clock of scipy linprog/HiGHS on the same instance. highs-ipm is
    HiGHS's embedded IPX (the reference, compiled C++), crossover on."""
    import scipy.sparse as sp
    from scipy.optimize import linprog
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
    kw = dict(
        A_ub=sp.vstack(A_ub_parts) if A_ub_parts else None,
        b_ub=np.concatenate(b_ub_parts) if b_ub_parts else None,
        A_eq=A[np.nonzero(eq)[0]] if eq.any() else None,
        b_eq=data["rhs"][eq] if eq.any() else None,
        bounds=np.stack([data["lb"], data["ub"]], axis=1))
    t0 = time.perf_counter()
    res = linprog(data["obj"], method=method, **kw)
    dt = time.perf_counter() - t0
    return dt, int(res.status)


def host_matvec_rate(data, iters=40):
    import scipy.sparse as sp
    m, n = data["num_constr"], data["num_var"]
    A = sp.csc_matrix((data["Ax"], data["Ai"], data["Ap"]), shape=(m, n))
    A_csr = A.tocsr()
    rng = np.random.default_rng(1)
    W = rng.uniform(0.5, 2.0, size=n + m)
    v = rng.standard_normal(m)
    u = (v @ A_csr) * W[:n]
    out = A @ u + W[n:] * v
    t0 = time.perf_counter()
    for _ in range(iters):
        u = (v @ A_csr) * W[:n]
        out = A @ u + W[n:] * v
    return iters / (time.perf_counter() - t0)


def native_matvec_rate(data, iters=40):
    from ipx_tpu.model import Model
    from ipx_tpu.user_model import UserModel
    from ipx_tpu.presolve import Presolver
    from ipx_tpu.control import Control
    from ipx_tpu.kkt.normal_matrix import NormalMatrix
    um = UserModel()
    um.load(data["num_constr"], data["num_var"], data["Ap"], data["Ai"],
            data["Ax"], data["rhs"], data["constr_type"], data["obj"],
            data["lb"], data["ub"])
    md = Model()
    ctrl = Control()
    ctrl.parameters.display = 0
    ctrl.parameters.scale = 0
    Presolver(um, md).presolve_model(ctrl)
    rng = np.random.default_rng(1)
    W = rng.uniform(0.5, 2.0, size=md.num_var_all)
    nm = NormalMatrix(md)
    nm.prepare(W)
    v = rng.standard_normal(md.num_rows)
    nm.apply(v)
    t0 = time.perf_counter()
    for _ in range(iters):
        nm.apply(v)
    return iters / (time.perf_counter() - t0)


_DEVICE_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
from ipx_tpu.testgen import transportation
import scipy.sparse as sp
data = transportation(%(src)d, %(snk)d, 0.001, %(seed)d)
m, n = data["num_constr"], data["num_var"]
A = sp.csc_matrix((data["Ax"], data["Ai"], data["Ap"]), shape=(m, n))
from ipx_tpu.ops.device_cr import _get_jax
jax = _get_jax()   # x64 + persistent compilation cache
import jax.numpy as jnp
from jax import lax
from ipx_tpu.ops.spmv import NormalMatrixDevice
rng = np.random.default_rng(1)
W64 = rng.uniform(0.5, 2.0, size=n + m)
v64 = rng.standard_normal(m)
out = {}
# f64 first: its loop program is reliably in the persistent cache
# (seconds), so a slow f32 remote compile cannot zero out the whole
# measurement — the parent parses the progressive partial prints even on
# timeout. The solver's mixed-precision device CR runs f32 matvecs with
# f64 iterative refinement, so the f32 rate is the operational one.
for name, dtype in (("f64", jnp.float64), ("f32", jnp.float32)):
    nmd = NormalMatrixDevice(A, dtype=np.float32 if name == "f32"
                             else np.float64)
    W = jnp.asarray(W64, dtype=dtype)
    v = jnp.asarray(v64, dtype=dtype)
    K = 200
    def looped(v):
        def body(i, u):
            u = nmd.apply(W, u)
            return u / jnp.max(jnp.abs(u))
        return lax.fori_loop(0, K, body, v)
    lfn = jax.jit(looped)
    t0 = time.perf_counter()
    o = lfn(v); jax.block_until_ready(o)
    out[name + "_loop_compile_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        o = lfn(v)
    jax.block_until_ready(o)
    out[name + "_looped_rate"] = 3 * K / (time.perf_counter() - t0)
    print(json.dumps(out), flush=True)
# batched normal-matrix apply (the TPU-native scenario-batch hot op):
# per-vector-equivalent throughput at B=256 in f32
B = 256
nmd = NormalMatrixDevice(A, dtype=np.float32)
W = jnp.asarray(np.broadcast_to(W64[:, None], (n + m, B)), dtype=jnp.float32)
V = jnp.asarray(rng.standard_normal((m, B)), dtype=jnp.float32)
K = 50
def looped_b(V):
    def body(i, U):
        U = nmd.apply_batched(W, U)
        return U / jnp.max(jnp.abs(U))
    return lax.fori_loop(0, K, body, V)
lfn = jax.jit(looped_b)
t0 = time.perf_counter()
o = lfn(V); jax.block_until_ready(o)
out["f32_batched256_compile_s"] = time.perf_counter() - t0
t0 = time.perf_counter()
for _ in range(3):
    o = lfn(V)
jax.block_until_ready(o)
out["f32_batched256_rate"] = 3 * K * B / (time.perf_counter() - t0)
print(json.dumps(out), flush=True)
print(json.dumps(out))
"""


def _device_responsive(timeout_s=60) -> bool:
    """Fast pre-flight: does the accelerator answer a trivial matmul?
    The tunnel backend can hang outright (even jax.devices() blocks);
    without this check a dead tunnel would cost the full device-child
    timeout."""
    code = ("import jax, jax.numpy as jnp;"
            "x = jnp.ones((128, 128));"
            "print('OK', float((x @ x).sum()))")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s)
        return "OK" in (out.stdout or "")
    except Exception:
        return False


def device_matvec_rate(src, snk, seed, timeout_s=480):
    """Runs the device matvec benchmark in a subprocess with a hard
    timeout; returns (rate, ok). The pre-flight retries with backoff — a
    transient tunnel stall at bench time zeroed out all of round 2's
    device evidence, so give the accelerator three chances."""
    responsive = False
    for attempt, t in enumerate((60, 180)):
        if _device_responsive(timeout_s=t):
            responsive = True
            break
        if attempt == 0:
            time.sleep(15)
    if not responsive:
        return {}, False
    code = _DEVICE_CHILD % {"repo": REPO, "src": src, "snk": snk,
                            "seed": seed}
    stdout = ""
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s)
        stdout = out.stdout or ""
    except subprocess.TimeoutExpired as e:
        # keep whatever partial results the child flushed before the kill
        stdout = (e.stdout or b"")
        if isinstance(stdout, bytes):
            stdout = stdout.decode(errors="replace")
    except Exception:
        pass
    for line in stdout.strip().splitlines()[::-1]:
        if line.startswith("{"):
            try:
                return json.loads(line), True
            except ValueError:
                continue
    return {}, False


def batched_stage_metrics(timeout_s=900):
    """Batched phase-1 stage on the chip (m=20k, B=256, handoff rule) and
    a 2-step host reference of the same program — the VERDICT-r4 item-1
    headline (full table: docs/DEVICE_r05.md). Subprocesses with hard
    timeouts; the compiled programs live in the persistent cache after
    the first round, so the device stage costs ~60 s warm."""
    tool = os.path.join(REPO, "tools", "device_batch_solve_bench.py")
    base = [sys.executable, tool, "--B", "256", "--cr-maxiter", "300",
            "--cr64-maxiter", "100"]

    def run(args, t):
        try:
            out = subprocess.run(base + args, capture_output=True,
                                 text=True, timeout=t)
            for line in (out.stdout or "").strip().splitlines()[::-1]:
                if line.startswith("{"):
                    return json.loads(line)
        except Exception:
            pass
        return None

    dev = run(["--backend", "device", "--handoff"], timeout_s)
    host = run(["--backend", "host", "--maxsteps", "2"], timeout_s)
    res = {}
    if dev:
        res["batched_stage_device"] = {
            k: dev.get(k) for k in
            ("wall_s", "steps", "cr_trips", "cr_matvec_lane_equiv_per_s",
             "ipm_iters_per_s", "mu_med_final", "handoff")}
    dsteps = (dev or {}).get("steps_s") or []
    hsteps = (host or {}).get("steps_s") or []
    if len(dsteps) >= 2 and len(hsteps) >= 2 and dsteps[1] > 0:
        # identical-prefix comparison: wall of step 2 of the SAME program
        # (host steps only get slower later in the stage, so this
        # underestimates the device advantage; full-stage measured 16.5x,
        # docs/DEVICE_r05.md)
        res["batched_stage_step2_ratio"] = round(hsteps[1] / dsteps[1], 2)
        res["batched_stage_step2_host_s"] = hsteps[1]
        res["batched_stage_step2_device_s"] = dsteps[1]
    return res


def baseline_solve_time(data):
    """Same solve with native kernels disabled (pure scipy/python paths):
    the 'naive implementation' baseline."""
    code = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
import ipx_tpu.basis.lu as lu_mod
import ipx_tpu.kkt.normal_matrix as nm_mod
# disable native acceleration
lu_mod._load_lib = lambda: (_ for _ in ()).throw(RuntimeError("disabled"))
nm_mod._native_apply_handle = lambda model: None
import numpy as np
from ipx_tpu import LpSolver, Parameters
from ipx_tpu.testgen import transportation, load_into_solver
data = transportation(%(src)d, %(snk)d, %(dens)f, %(seed)d)
p = Parameters(); p.display = 0; p.device = "cpu"
s = LpSolver(p)
load_into_solver(data, s)
t0 = time.perf_counter()
status = s.solve()
print(json.dumps({"dt": time.perf_counter() - t0, "status": status}))
"""
    return code


def main():
    # best-of-3 on BOTH sides of the headline comparison: the 2-core VM's
    # wall-clocks swing ~10-15% run to run (invisible-neighbor noise), and
    # a single sample can move the ratio either way; three draws per side
    # keep the comparison symmetric while shrinking the noise band
    t_solve, data, stats = full_solve()
    for _ in range(2):
        t_again, _, _ = full_solve()
        t_solve = min(t_solve, t_again)
    highs_ipm_s, highs_status = highs_solve_time(data, "highs-ipm")
    for _ in range(2):
        h_again, _ = highs_solve_time(data, "highs-ipm")
        highs_ipm_s = min(highs_ipm_s, h_again)
    highs_ds_s, _ = highs_solve_time(data, "highs-ds")
    # large-instance ratio (BASELINE.md's stated target regime): m=100k
    # transportation, same comparator
    try:
        t_large, data_large, _ = full_solve(40000, 60000, 1, density=2e-4)
        highs_large_s, _ = highs_solve_time(data_large, "highs-ipm")
        large_ratio = round(highs_large_s / t_large, 3)
        data_large = None
    except Exception:
        t_large, highs_large_s, large_ratio = None, None, None
    host_rate = host_matvec_rate(data)
    native_rate = native_matvec_rate(data)
    dev, dev_ok = device_matvec_rate(8000, 12000, 1)
    stage = batched_stage_metrics() if dev_ok else {}

    # naive baseline: the pure-python compute paths are orders of magnitude
    # slower, so measure naive vs accelerated on a reduced instance that the
    # naive paths can finish (~16 s at m=750), and report that ratio as
    # vs_baseline (speedup of the framework's native/vectorized paths over a
    # naive implementation of the same algorithm).
    small = dict(src=300, snk=450, dens=0.01, seed=1)
    code = baseline_solve_time(None) % {"repo": REPO, **small}
    naive_dt = None
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=400)
        for line in out.stdout.strip().splitlines()[::-1]:
            if line.startswith("{"):
                naive_dt = json.loads(line)["dt"]
                break
    except Exception:
        pass
    # accelerated run of the same small instance
    from ipx_tpu import LpSolver, Parameters
    from ipx_tpu.testgen import transportation, load_into_solver
    sdata = transportation(small["src"], small["snk"], small["dens"],
                           small["seed"])
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    s = LpSolver(p)
    load_into_solver(sdata, s)
    t0 = time.perf_counter()
    s.solve()
    accel_small_dt = time.perf_counter() - t0
    naive_speedup = (naive_dt / accel_small_dt) if naive_dt else 1.0

    result = {
        "metric": "full_solve_transportation_20k_rows",
        "value": round(t_solve, 3),
        "unit": "seconds (m=20k rows, n~96k cols, 2-phase IPM + crossover)",
        # wall-clock ratio vs C++ CPU IPX (HiGHS highs-ipm = HiGHS presolve
        # + embedded reference IPX + crossover) on the SAME instance;
        # > 1 means this framework is faster than the reference
        "vs_baseline": round(highs_ipm_s / t_solve, 3),
        "extra": {
            "solve_status": list(stats),
            "highs_ipm_s": round(highs_ipm_s, 3),
            "highs_ipm_status": highs_status,
            "highs_dual_simplex_s": round(highs_ds_s, 3),
            "full_solve_100k_rows_s": (round(t_large, 3)
                                       if t_large else None),
            "highs_ipm_100k_s": (round(highs_large_s, 3)
                                 if highs_large_s else None),
            "vs_baseline_100k_rows": large_ratio,
            "host_matvec_per_s": round(host_rate, 1),
            "native_matvec_per_s": round(native_rate, 1),
            "device_f32_matvec_per_s": round(dev.get("f32_looped_rate",
                                                     0.0), 1),
            "device_f32_compile_s": round(dev.get("f32_loop_compile_s",
                                                  0.0), 1),
            "device_f64_matvec_per_s": round(dev.get("f64_looped_rate",
                                                     0.0), 1),
            # per-vector-equivalent rate of the batched (B=256) device
            # normal-matrix apply — the scenario-batch hot op; compare to
            # native_matvec_per_s (host best per-vector throughput)
            "device_f32_batched256_matvec_per_s": round(
                dev.get("f32_batched256_rate", 0.0), 1),
            "device_vs_host_batched": round(
                dev.get("f32_batched256_rate", 0.0) / native_rate, 2)
            if dev.get("f32_batched256_rate") else None,
            "device_ok": bool(dev_ok),
            # full batched phase-1 stage on-chip (VERDICT r4 item 1;
            # docs/DEVICE_r05.md): whole-solve wall, CR matvec throughput,
            # IPM iters/s, plus the same-program host step-2 ratio
            **stage,
            "naive_small_solve_s": round(naive_dt, 3) if naive_dt else None,
            "accel_small_solve_s": round(accel_small_dt, 3),
            "vs_naive_python": round(naive_speedup, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
