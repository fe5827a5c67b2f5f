"""Device solve: both interior-point phases carried by the accelerator.

`Parameters.device = "tpu"` routes

  * the phase-1 diagonal-preconditioned CR as one jitted lax.while_loop
    (mixed precision: f32 device loop + f64 defect correction,
    ipx_tpu/ops/device_cr.py), and
  * the phase-2 basis-preconditioned CR with the NN' product as a jitted
    device program (callback-free — runs on attachments that reject host
    callbacks, ipx_tpu/ops/device_cr2.py)

while the sequential runtime (LU, maxvolume, crossover) stays on host.
Works on a real TPU or any jax backend (the tests pin the CPU backend).

    python examples/device_solve.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    from ipx_tpu import LpSolver, Parameters
    import ipx_tpu.testgen as tg
    import ipx_tpu.ops.device_cr2 as d2

    print("backend device:", jax.devices()[0])
    data = tg.transportation(800, 1200, 0.01, seed=4)

    # host reference
    p0 = Parameters()
    p0.display = 0
    p0.device = "cpu"
    s0 = LpSolver(p0)
    tg.load_into_solver(data, s0)
    assert s0.solve() == 1000
    ref_obj = s0.get_info().pobjval

    # count the device phase-2 engagements (no silent host fallback)
    calls = []
    orig = d2.DeviceSplittedCR.solve

    def counted(self, *a, **k):
        out = orig(self, *a, **k)
        calls.append(out[1])
        return out

    d2.DeviceSplittedCR.solve = counted
    try:
        p = Parameters()
        p.display = 0
        p.device = "tpu"
        s = LpSolver(p)
        tg.load_into_solver(data, s)
        t0 = time.perf_counter()
        status = s.solve()
        dt = time.perf_counter() - t0
    finally:
        d2.DeviceSplittedCR.solve = orig

    info = s.get_info()
    print(f"device solve: status={status} in {dt:.2f}s "
          f"(objective {info.pobjval:.6f}, host {ref_obj:.6f})")
    print(f"phase-2 KKT solves on device: {len(calls)} "
          f"({sum(calls)} CR iterations)")
    assert status == 1000
    assert abs(info.pobjval - ref_obj) <= 1e-7 * abs(ref_obj)
    assert calls, "device phase-2 never engaged"
    print("OK")


if __name__ == "__main__":
    main()
