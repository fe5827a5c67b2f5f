"""Differential tests: the native whole-loop crossover driver must agree
with the Python push loops (same final basic solution validity + objective).

The native driver (ipxlu_xover_dual/primal, ipx_tpu/native/ipxlu.cc) and the
Python loops (ipx_tpu/basis/crossover.py) implement the same two-pass ratio
tests and exchange rules (reference: src/crossover.cc:73-340,359-465); here
each solve runs twice with the native path enabled/disabled and the results
are compared.
"""
import numpy as np
import pytest

import ipx_tpu.basis.crossover as xover_mod
from ipx_tpu import LpSolver, Parameters
from ipx_tpu.status import Status
from ipx_tpu.testgen import grid_flow, production, transportation, \
    load_into_solver

CASES = [
    ("transport", lambda s: transportation(50, 70, 0.15, s)),
    ("grid", lambda s: grid_flow(8, 9, s)),
    ("production", lambda s: production(100, 80, 4, s)),
]


def _solve(data, native: bool, monkeypatch):
    if not native:
        monkeypatch.setattr(xover_mod, "_xover_native_ctx", lambda b: None)
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    s = LpSolver(p)
    assert load_into_solver(data, s) == 0
    status = s.solve()
    info = s.get_info()
    return status, info, s


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("seed", [7, 8])
def test_native_matches_python_crossover(name, gen, seed, monkeypatch):
    data = gen(seed)
    st_n, info_n, s_n = _solve(data, True, monkeypatch)
    with monkeypatch.context() as mp:
        st_p, info_p, s_p = _solve(data, False, mp)
    assert st_n == st_p
    if st_n != int(Status.SOLVED):
        return
    # objectives agree; both basic solutions feasible
    assert info_n.pobjval == pytest.approx(info_p.pobjval, rel=1e-7, abs=1e-7)
    for info in (info_n, info_p):
        assert info.status_crossover == 1
        assert info.primal_infeas <= 1e-7
        assert info.dual_infeas <= 1e-7


def test_native_crossover_used(monkeypatch):
    """The native driver actually runs (guards against silent fallback)."""
    calls = []
    orig = xover_mod._xover_native_ctx

    def spy(basis):
        ctx = orig(basis)
        calls.append(ctx is not None)
        return ctx

    monkeypatch.setattr(xover_mod, "_xover_native_ctx", spy)
    data = transportation(50, 70, 0.15, 3)
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    s = LpSolver(p)
    assert load_into_solver(data, s) == 0
    assert s.solve() == int(Status.SOLVED)
    assert calls and all(calls)
