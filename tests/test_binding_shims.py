"""Machine-check of the Julia/MATLAB binding shims (VERDICT r3 item 9).

Neither Julia nor MATLAB exists in this image, so the shims cannot be
executed; these tests parse their SOURCES and cross-validate every
`capi.*` entry point, parameter name and solution field they reference
against the live Python tables (ipx_tpu.capi / parameters / status /
solution objects), so the untestable shims at least cannot drift from
the API they marshal. Counterpart contract: reference Julia/ipx.jl:5-47
and Matlab/src/ipx_solve.c."""
import os
import re

import numpy as np
import pytest

import ipx_tpu.capi as capi
from ipx_tpu.parameters import Parameters

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JULIA = os.path.join(REPO, "bindings", "julia", "IpxTpu.jl")
MATLAB = os.path.join(REPO, "bindings", "matlab", "ipx_tpu_solve.m")


def _capi_calls(src):
    return set(re.findall(r"capi\.(ipx_\w+)", src))


@pytest.mark.parametrize("path", [JULIA, MATLAB])
def test_every_capi_entry_the_shim_calls_exists(path):
    src = open(path).read()
    calls = _capi_calls(src)
    assert calls, "shim references no capi entry points"
    for fn in sorted(calls):
        assert hasattr(capi, fn), f"{os.path.basename(path)} calls " \
            f"capi.{fn} which does not exist"
        assert callable(getattr(capi, fn))


@pytest.mark.parametrize("path", [JULIA, MATLAB])
def test_shim_parameter_examples_are_real_parameters(path):
    """Every parameter name the shim documentation/code mentions
    (e.g. `crossover=0`, `params.ipm_maxiter`) must exist on
    Parameters."""
    src = open(path).read()
    names = set(re.findall(r"[`.](crossover|ipm_maxiter|[a-z_]+_tol)\b",
                           src))
    p = Parameters()
    for name in names:
        assert hasattr(p, name), f"shim mentions unknown parameter {name}"


def test_shim_solution_fields_exist():
    """The solution field lists the shims expose (x, xl, xu, slack, y,
    zl, zu / x, slack, y, z, vbasis, cbasis) must match the live
    solution objects."""
    h = capi.ipx_new()
    try:
        p = capi.ipx_get_parameters(h)
        p.display = 0
        capi.ipx_set_parameters(h, p)
        # tiny LP: min x st x + s = 1, 0 <= x <= 1
        rc = capi.ipx_load_model(
            h, 1, np.array([1.0]), np.array([0.0]), np.array([1.0]),
            1, np.array([0, 1]), np.array([0]), np.array([1.0]),
            np.array([1.0]), "<")
        assert rc == 0
        assert capi.ipx_solve(h) == 1000
        interior = capi.ipx_get_interior_solution(h)
        basic = capi.ipx_get_basic_solution(h)
        for f in ("x", "xl", "xu", "slack", "y", "zl", "zu"):
            assert hasattr(interior, f), f"interior solution lacks {f}"
        for f in ("x", "slack", "y", "z", "vbasis", "cbasis"):
            assert hasattr(basic, f), f"basic solution lacks {f}"
    finally:
        capi.ipx_free(h)


def test_checkpoint_entries_used_by_shims_roundtrip(tmp_path):
    """Both shims expose resume_from/checkpoint_to through
    ipx_load_checkpoint / ipx_save_checkpoint; exercise the pair."""
    path = str(tmp_path / "ck.npz")
    h = capi.ipx_new()
    try:
        p = capi.ipx_get_parameters(h)
        p.display = 0
        capi.ipx_set_parameters(h, p)
        rc = capi.ipx_load_model(
            h, 1, np.array([1.0]), np.array([0.0]), np.array([1.0]),
            1, np.array([0, 1]), np.array([0]), np.array([1.0]),
            np.array([1.0]), "<")
        assert rc == 0
        assert capi.ipx_solve(h) == 1000
        capi.ipx_save_checkpoint(h, path)
        assert os.path.exists(path)
        assert capi.ipx_load_checkpoint(h, path) == 0
    finally:
        capi.ipx_free(h)
