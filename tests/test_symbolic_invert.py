"""Symbolic inverse counts vs brute-force dense inverse pattern."""
import numpy as np
import pytest
import scipy.sparse as sp

from ipx_tpu.basis.symbolic_invert import symbolic_invert
from ipx_tpu.control import Control
from ipx_tpu.model import Model
from ipx_tpu.presolve import Presolver
from ipx_tpu.user_model import UserModel

from lp_fixtures import random_lp


def make_model(m, n, seed):
    a = random_lp(m, n, density=0.25, seed=seed)
    um = UserModel()
    assert um.load(a["num_constr"], a["num_var"], a["Ap"], a["Ai"],
                   a["Ax"], a["rhs"], a["constr_type"], a["obj"], a["lb"],
                   a["ub"]) == 0
    md = Model()
    ctrl = Control()
    ctrl.parameters.display = 0
    ctrl.parameters.scale = 0
    Presolver(um, md).presolve_model(ctrl)
    return md


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_counts_match_dense_pattern(seed):
    m, n = 25, 40
    md = make_model(m, n, seed)
    rng = np.random.default_rng(seed)
    # basis: random structural columns + slacks to complete; retry until
    # nonsingular
    for attempt in range(20):
        structs = rng.choice(n, size=m // 3, replace=False)
        slacks = n + rng.choice(m, size=m - m // 3, replace=False)
        basis = np.concatenate([structs, slacks])
        B = np.zeros((m, m))
        for p, j in enumerate(basis):
            bi, bx = md.AI_col(int(j))
            B[bi, p] = bx
        if abs(np.linalg.det(B)) > 1e-8:
            break
    else:
        pytest.skip("no nonsingular random basis found")
    rowcounts, colcounts = symbolic_invert(md, basis)

    # STRUCTURAL counts are an upper bound on the numeric pattern (exact
    # except for accidental cancellation); compare against the numeric
    # inverse's pattern.
    Binv = np.linalg.inv(B)
    num_rows = np.count_nonzero(np.abs(Binv) > 1e-12, axis=1)
    num_cols = np.count_nonzero(np.abs(Binv) > 1e-12, axis=0)
    assert np.all(rowcounts >= num_rows)
    assert np.all(colcounts >= num_cols)
    # total structural count can exceed numeric only moderately here
    assert rowcounts.sum() == colcounts.sum()
