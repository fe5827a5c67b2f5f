"""Maxvolume dry-streak early exit (round 5): a refresh against the
weights the basis was just refined for must stop scanning after a few
dry slices instead of paying a BTRAN + weights pass for every slice."""
import numpy as np

from ipx_tpu import LpSolver, Parameters
from ipx_tpu.basis.maxvolume import Maxvolume
from ipx_tpu.control import Control
from ipx_tpu.testgen import transportation, load_into_solver


def test_dry_refresh_stops_after_streak():
    data = transportation(400, 600, 0.02, seed=4)
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    p.scale = 0
    p.dualize = 0
    p.crossover = 0
    s = LpSolver(p)
    assert load_into_solver(data, s) == 0
    assert s.solve() == 1000
    basis = s.basis
    if not basis.factorization_is_fresh:
        assert basis.factorize() == 0

    colscale = s.iterate.scaling_factors()
    ctrl = Control()
    ctrl.parameters.display = 0

    # first refresh may still exchange a little; the second one against
    # the SAME scaling must be dry and exit early
    mv1 = Maxvolume(ctrl)
    assert mv1.run_heuristic(colscale, basis) == 0
    mv2 = Maxvolume(ctrl)
    assert mv2.run_heuristic(colscale, basis) == 0
    assert mv2.updates <= 1
    # exit rule: 3 consecutive dry slices after at least 5 visited
    assert mv2.slices_visited <= 8, mv2.slices_visited

    # and a refresh against a PERTURBED scaling must still do real work:
    # push a set of nonbasic scales ABOVE the basic range (at an optimum
    # nonbasic scales are tiny, so multiplicative noise stays harmless —
    # which the exit must, and does, treat as dry)
    rng = np.random.default_rng(0)
    nb_idx = np.where(basis.map2basis == -1)[0]
    cs = colscale.copy()
    bumped = rng.choice(nb_idx, size=20, replace=False)
    with np.errstate(invalid="ignore"):
        top = np.nanmax(np.where(np.isfinite(colscale[basis.basis]),
                                 colscale[basis.basis], np.nan))
    cs[bumped] = 10.0 * top
    mv3 = Maxvolume(ctrl)
    assert mv3.run_heuristic(cs, basis) == 0
    assert mv3.updates >= 10
