"""Algorithmic-efficiency parity vs the reference's committed benchmark
logs (VERDICT r3 item 6): the per-iteration efficiency metrics of matched
testgen families must land in the bands the reference's own logfiles
establish — objective parity alone does not prove the algorithm is doing
comparable work per iteration.

Anchors are PARSED from /root/reference/benchmark/logfiles/*/ipx/*.log
(tools/ref_parity.py), not hardcoded."""
import os

import numpy as np
import pytest

from ipx_tpu import LpSolver, Parameters
import ipx_tpu.testgen as tg

REF_LOGS = "/root/reference/benchmark/logfiles"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_LOGS), reason="reference logfiles unavailable")


def _anchors():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.ref_parity import reference_anchors, derived
    return reference_anchors(), derived


def _solve(data):
    from ipx_tpu.testgen import load_into_solver
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    s = LpSolver(p)
    load_into_solver(data, s)
    assert s.solve() == 1000
    return s.get_info()


def test_parsed_anchor_set_is_substantial():
    anchors, derived = _anchors()
    # the reference commits logs for the srd/nug studies plus the diverse
    # sets; a broken parser would silently weaken every band below
    assert len(anchors) >= 100
    assert "srd060" in anchors and "nug12" in anchors
    d = derived(anchors["srd060"])
    assert d["iter"] == 57 and d["kkt2_per_iter"] == pytest.approx(69.2,
                                                                   abs=0.1)


def test_staircase_lands_in_srd_bands():
    """Our srd-like staircase family: IPM iterations, CR iterations per
    iteration and maxvolume updates per iteration must be within 2x of the
    srd logfile anchors (the reference's own efficiency on this class)."""
    anchors, derived = _anchors()
    ref = derived(anchors["srd060"])
    info = _solve(tg.staircase(40, 600, seed=1))
    it = max(info.iter, 1)
    assert info.iter <= 2 * ref["iter"]
    assert info.kktiter2 / it <= 2 * ref["kkt2_per_iter"]
    assert info.updates_ipm / it <= 2 * ref["upd_per_iter"]


def test_assignment_lands_in_nug_bands():
    """Our nug-like assignment family vs the nug12 anchors; crossover
    push volume per row is additionally banded (massively degenerate
    class, the reference's crossover stress case)."""
    anchors, derived = _anchors()
    ref = derived(anchors["nug12"])
    info = _solve(tg.assignment(120, seed=1))
    it = max(info.iter, 1)
    assert info.iter <= 2 * ref["iter"]
    assert info.kktiter2 / it <= 2 * ref["kkt2_per_iter"]
    assert info.updates_ipm / it <= 2 * ref["upd_per_iter"]
    m = 2 * 120
    pushes_per_krow = (info.pushes_dual + info.pushes_primal) / m * 1000
    assert pushes_per_krow <= 2 * ref["pushes_per_krow"]


def _bands(info, ref, rows=None, push_band=False):
    """Shared 2x-band assertions: per-iteration efficiency must be within
    a factor 2 of the reference anchor's own logfile-derived metrics."""
    it = max(info.iter, 1)
    assert info.iter <= 2 * ref["iter"]
    assert info.kktiter2 / it <= 2 * max(ref["kkt2_per_iter"], 1.0)
    assert info.updates_ipm / it <= 2 * max(ref["upd_per_iter"], 1.0)
    if push_band and rows:
        pushes_per_krow = (info.pushes_dual + info.pushes_primal) \
            / rows * 1000
        assert pushes_per_krow <= 2 * max(ref["pushes_per_krow"], 1.0)


def test_staircase_lands_in_srd180_bands():
    """Second srd anchor (m=280k class): larger staircase instance."""
    anchors, derived = _anchors()
    ref = derived(anchors["srd180"])
    info = _solve(tg.staircase(60, 900, seed=1))
    _bands(info, ref)


def test_assignment_lands_in_nug15_bands():
    """Second nug anchor: the QAP class scales iterations slowly."""
    anchors, derived = _anchors()
    ref = derived(anchors["nug15"])
    info = _solve(tg.assignment(150, seed=1))
    _bands(info, ref, rows=300, push_band=True)


def test_transportation_lands_in_ken18_bands():
    """Diverse-set anchor ken-18 (multicommodity network) vs our
    transportation class — the headline bench family."""
    anchors, derived = _anchors()
    ref = derived(anchors["ken-18"])
    info = _solve(tg.transportation(800, 1200, 0.01, 1))
    _bands(info, ref)


def test_grid_lands_in_pds100_bands():
    """Diverse-set anchor pds-100 (pure network flow) vs our grid class
    (the family where maxvolume quality is hardest, VERDICT r4 weak #3)."""
    anchors, derived = _anchors()
    ref = derived(anchors["pds-100"])
    info = _solve(tg.grid_flow(60, 60, seed=1))
    _bands(info, ref, rows=3600, push_band=True)


def test_production_lands_in_creb_bands():
    """Diverse-set anchor cre-b (resource allocation) vs our production
    class."""
    anchors, derived = _anchors()
    ref = derived(anchors["cre-b"])
    info = _solve(tg.production(1500, 400, seed=1))
    _bands(info, ref)
