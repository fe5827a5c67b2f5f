"""Input validation tests mirroring the reference suite
(reference: check/model_loading.cc): every null-argument permutation,
invalid dims/matrix/vector cases, legal degenerate cases."""
import numpy as np
import pytest

from ipx_tpu import LpSolver
from ipx_tpu.status import Errflag

from lp_fixtures import LPBuilder


def valid_args():
    lp = LPBuilder(rhs=[1.0, 2.0], constr_type="<>")
    lp.add_column(1.0, [0], [1.0], 0.0, 1.0)
    lp.add_column(-1.0, [0, 1], [2.0, -1.0], 0.0, np.inf)
    return lp.arrays()


def load(solver, **kwargs):
    a = valid_args()
    a.update(kwargs)
    return solver.load_model(a["num_var"], a["obj"], a["lb"], a["ub"],
                             a["num_constr"], a["Ap"], a["Ai"], a["Ax"],
                             a["rhs"], a["constr_type"])


def test_valid_load():
    s = LpSolver()
    assert load(s) == 0
    info = s.get_info()
    assert info.num_var == 2
    assert info.num_constr == 2
    assert info.num_entries == 3


@pytest.mark.parametrize("field", ["obj", "lb", "ub", "Ap", "rhs",
                                   "constr_type"])
def test_null_arguments(field):
    s = LpSolver()
    assert load(s, **{field: None}) == int(Errflag.ARGUMENT_NULL)


def test_null_matrix_entries():
    s = LpSolver()
    assert load(s, Ai=None) == int(Errflag.ARGUMENT_NULL)
    assert load(s, Ax=None) == int(Errflag.ARGUMENT_NULL)


def test_invalid_dimension():
    s = LpSolver()
    assert load(s, num_var=0) == int(Errflag.INVALID_DIMENSION)
    assert load(s, num_var=-1) == int(Errflag.INVALID_DIMENSION)
    assert load(s, num_constr=-1) == int(Errflag.INVALID_DIMENSION)


def test_invalid_matrix():
    s = LpSolver()
    # colptr not starting at 0
    assert load(s, Ap=np.array([1, 2, 4])) == int(Errflag.INVALID_MATRIX)
    # decreasing colptr
    assert load(s, Ap=np.array([0, 2, 1])) == int(Errflag.INVALID_MATRIX)
    # out-of-range row index
    assert load(s, Ai=np.array([0, 0, 5])) == int(Errflag.INVALID_MATRIX)
    assert load(s, Ai=np.array([0, -1, 1])) == int(Errflag.INVALID_MATRIX)
    # duplicate row index within a column
    assert load(s, Ai=np.array([0, 1, 1]),
                Ap=np.array([0, 1, 3])) == int(Errflag.INVALID_MATRIX)
    # non-finite value
    assert load(s, Ax=np.array([1.0, np.nan, 2.0])) == \
        int(Errflag.INVALID_MATRIX)


def test_invalid_vectors():
    s = LpSolver()
    assert load(s, rhs=np.array([1.0, np.inf])) == \
        int(Errflag.INVALID_VECTOR)
    assert load(s, obj=np.array([1.0, np.nan])) == \
        int(Errflag.INVALID_VECTOR)
    # lb = +inf invalid
    assert load(s, lb=np.array([np.inf, 0.0])) == \
        int(Errflag.INVALID_VECTOR)
    # ub = -inf invalid
    assert load(s, ub=np.array([-np.inf, 1.0])) == \
        int(Errflag.INVALID_VECTOR)
    # lb > ub invalid
    assert load(s, lb=np.array([2.0, 0.0]),
                ub=np.array([1.0, 1.0])) == int(Errflag.INVALID_VECTOR)
    # bad constraint type
    assert load(s, constr_type="<x") == int(Errflag.INVALID_VECTOR)


def test_degenerate_legal_cases():
    s = LpSolver()
    # no constraints
    lp = LPBuilder(rhs=[], constr_type="")
    lp.add_column(1.0, [], [], 0.0, 1.0)
    assert lp.load_into(s) == 0
    # empty matrix with constraints
    lp = LPBuilder(rhs=[1.0], constr_type="<")
    lp.add_column(1.0, [], [], 0.0, 1.0)
    assert lp.load_into(s) == 0


def test_load_clears_previous_model():
    s = LpSolver()
    assert load(s) == 0
    assert load(s, num_var=0) == int(Errflag.INVALID_DIMENSION)
    # failed load leaves the model empty
    from ipx_tpu.status import Status
    assert s.solve() == int(Status.NO_MODEL)
