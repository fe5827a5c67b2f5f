"""Pins the statuses (and HiGHS objective agreement) of the results-table
quick tier, so the committed docs/RESULTS.tbl stays regenerable and the
instance families keep solving to optimality (VERDICT r2 item 6)."""
import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import results_table  # noqa: E402


@pytest.mark.parametrize("name,data", list(results_table.instances("quick")),
                         ids=lambda v: v if isinstance(v, str) else "")
def test_quick_tier_solves_to_optimal(name, data):
    r = results_table.run_ours(data, time_limit=120.0)
    assert r["status"] == 1000, (name, r)
    obj_h, st_h = results_table.highs_obj(data, 120.0)
    assert st_h == 0
    assert r["obj"] == pytest.approx(obj_h, rel=1e-6, abs=1e-9), name
