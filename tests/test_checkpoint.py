"""Mid-solve checkpoint / resume (ipx_tpu/checkpoint.py).

Capability added beyond the reference (SURVEY §5.4: the reference only has
user warm starts, reference: src/lp_solver.h:60-66). A checkpoint captures
the pre-postsolve IPM state (iterate + state machine + basis); resuming on
the same model continues in phase 2 exactly where the run stopped.
"""
import os

import numpy as np
import pytest

from ipx_tpu import LpSolver, Parameters
from ipx_tpu.status import Errflag, SolveStatus, Status

from lp_fixtures import afiro, random_lp, AFIRO_OBJECTIVE


def params(**kw):
    p = Parameters()
    p.display = 0
    p.device = "cpu"
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def _solve_limited(maxiter, **kw):
    s = LpSolver(params(ipm_maxiter=maxiter, **kw))
    assert afiro().load_into(s) == 0
    s.solve()
    return s


def test_resume_after_iter_limit_reaches_optimum():
    # full run for the iteration-count yardstick
    s_full = _solve_limited(300)
    full_iters = s_full.get_info().iter
    assert s_full.get_info().status_ipm == int(SolveStatus.OPTIMAL)

    # stop early, checkpoint, resume on a fresh solver
    s1 = _solve_limited(max(2, full_iters // 2))
    info1 = s1.get_info()
    assert info1.status_ipm == int(SolveStatus.ITER_LIMIT)
    ckpt = s1.get_checkpoint()
    assert ckpt is not None

    s2 = LpSolver(params())
    assert afiro().load_into(s2) == 0
    assert s2.load_checkpoint(ckpt) == 0
    s2.solve()
    info2 = s2.get_info()
    assert info2.status == int(Status.SOLVED)
    assert info2.objval == pytest.approx(AFIRO_OBJECTIVE, abs=1e-6)
    # the resumed run continues counting from the checkpoint iteration and
    # needs no more total iterations than the uninterrupted run (+ slack for
    # the phase-switch perturbation)
    assert info2.iter >= info1.iter
    assert info2.iter <= full_iters + 5


def test_checkpoint_file_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    s1 = _solve_limited(4)
    assert s1.save_checkpoint(path) == 0
    assert os.path.exists(path)

    s2 = LpSolver(params())
    assert afiro().load_into(s2) == 0
    assert s2.load_checkpoint(path) == 0
    s2.solve()
    info = s2.get_info()
    assert info.status == int(Status.SOLVED)
    assert info.objval == pytest.approx(AFIRO_OBJECTIVE, abs=1e-6)


def test_periodic_checkpoint_written_during_solve(tmp_path):
    path = str(tmp_path / "periodic.npz")
    # interval 0 writes after every IPM iteration; iter-limited run leaves
    # the final state in the file too
    s = _solve_limited(5, checkpoint_file=path, checkpoint_interval=0.0)
    assert s.get_info().status_ipm == int(SolveStatus.ITER_LIMIT)
    assert os.path.exists(path)

    s2 = LpSolver(params())
    assert afiro().load_into(s2) == 0
    assert s2.load_checkpoint(path) == 0
    s2.solve()
    assert s2.get_info().objval == pytest.approx(AFIRO_OBJECTIVE, abs=1e-6)


def test_checkpoint_rejects_wrong_model():
    s1 = _solve_limited(4)
    ckpt = s1.get_checkpoint()

    s2 = LpSolver(params())
    data = random_lp(40, 60, density=0.2, seed=3)
    assert s2.load_model(**data) == 0
    assert s2.load_checkpoint(ckpt) == 0   # armed; validated at solve
    s2.solve()
    info = s2.get_info()
    assert info.errflag == int(Errflag.INVALID_CHECKPOINT)
    assert info.status_ipm == int(SolveStatus.FAILED)


def test_load_checkpoint_rejects_malformed():
    s = LpSolver(params())
    assert s.load_checkpoint({"nonsense": 1}) == int(
        Errflag.INVALID_CHECKPOINT)


def test_resume_rejects_mis_sized_arrays():
    """A checkpoint whose fingerprint matches but whose arrays are truncated
    must fail with INVALID_CHECKPOINT, not crash into INTERNAL_ERROR."""
    s1 = _solve_limited(4)
    ckpt = dict(s1.get_checkpoint())
    ckpt["x"] = ckpt["x"][:-3]          # truncate one iterate array

    s2 = LpSolver(params())
    assert afiro().load_into(s2) == 0
    assert s2.load_checkpoint(ckpt) == 0   # armed; validated at solve
    s2.solve()
    info = s2.get_info()
    assert info.errflag == int(Errflag.INVALID_CHECKPOINT)
    assert info.status_ipm == int(SolveStatus.FAILED)


def test_resume_with_singular_restored_basis_repairs_and_continues():
    """A stale checkpoint whose basis is singular resumes with the repaired
    (slack-patched) basis instead of aborting."""
    data = random_lp(60, 90, density=0.15, seed=11)
    s_full = LpSolver(params(dualize=0))
    assert s_full.load_model(**data) == 0
    s_full.solve()
    ref = s_full.get_info()

    stop = max(3, ref.iter - 3)
    s1 = LpSolver(params(dualize=0, ipm_maxiter=stop))
    assert s1.load_model(**data) == 0
    s1.solve()
    ckpt = dict(s1.get_checkpoint())
    assert "basis" in ckpt
    # Corrupt the basis into a singular one: duplicate a structural column.
    basis = np.array(ckpt["basis"])
    struct = np.where(basis < s1.model.num_cols)[0]
    assert struct.size >= 2
    m2b = np.array(ckpt["map2basis"])
    m2b[basis[struct[1]]] = -1
    basis[struct[1]] = basis[struct[0]]
    ckpt["basis"], ckpt["map2basis"] = basis, m2b

    s2 = LpSolver(params(dualize=0))
    assert s2.load_model(**data) == 0
    assert s2.load_checkpoint(ckpt) == 0
    s2.solve()
    info = s2.get_info()
    assert info.errflag == 0
    assert info.status == int(Status.SOLVED)
    assert info.objval == pytest.approx(ref.objval, rel=1e-6, abs=1e-7)


def test_save_checkpoint_atomic(tmp_path):
    """save_npz swaps the file in atomically and leaves no .tmp behind."""
    path = str(tmp_path / "atomic.npz")
    s = _solve_limited(4)
    assert s.save_checkpoint(path) == 0
    assert s.save_checkpoint(path) == 0   # overwrite goes through the swap
    assert os.path.exists(path)
    assert not os.path.exists(path + ".tmp")
    # the file on disk is a complete, loadable checkpoint
    s2 = LpSolver(params())
    assert afiro().load_into(s2) == 0
    assert s2.load_checkpoint(path) == 0


def test_resume_preserves_phase2_state_machine():
    """Checkpoint taken after the phase switch restores the basis and the
    implied/fixed variable states exactly (map2basis round trip)."""
    data = random_lp(60, 90, density=0.15, seed=11)

    s_full = LpSolver(params(dualize=0))
    assert s_full.load_model(**data) == 0
    s_full.solve()
    ref = s_full.get_info()
    assert ref.status_ipm in (int(SolveStatus.OPTIMAL),
                              int(SolveStatus.IMPRECISE))

    # stop mid phase 2: enough iterations that the basis exists
    stop = max(3, ref.iter - 3)
    s1 = LpSolver(params(dualize=0, ipm_maxiter=stop))
    assert s1.load_model(**data) == 0
    s1.solve()
    ckpt = s1.get_checkpoint()
    assert ckpt is not None
    if "basis" in ckpt:
        assert ckpt["basis"].shape == (s1.model.num_rows,)

    s2 = LpSolver(params(dualize=0))
    assert s2.load_model(**data) == 0
    assert s2.load_checkpoint(ckpt) == 0
    s2.solve()
    info2 = s2.get_info()
    assert info2.status == int(Status.SOLVED)
    assert info2.objval == pytest.approx(ref.objval, rel=1e-6, abs=1e-7)


def test_resume_from_phase1_checkpoint_builds_basis():
    """A checkpoint taken before the phase switch has no basis; resume must
    construct a starting basis from the restored iterate and still reach
    the optimum."""
    s1 = _solve_limited(2)   # afiro switches after ~5 initial iterations
    ckpt = s1.get_checkpoint()
    assert ckpt is not None
    assert "basis" not in ckpt

    s2 = LpSolver(params())
    assert afiro().load_into(s2) == 0
    assert s2.load_checkpoint(ckpt) == 0
    s2.solve()
    info = s2.get_info()
    assert info.status == int(Status.SOLVED)
    assert info.objval == pytest.approx(AFIRO_OBJECTIVE, abs=1e-6)


def test_resume_dualized_and_scaled_model():
    """Checkpoints live in solver-model space, so resume works for dualized
    and scaled models too (unlike the reference's user warm start, which is
    refused when the model was dualized, src/lp_solver.cc:337-347)."""
    s1 = LpSolver(params(dualize=1, scale=1, ipm_maxiter=4))
    assert afiro().load_into(s1) == 0
    s1.solve()
    ckpt = s1.get_checkpoint()
    assert ckpt is not None

    s2 = LpSolver(params(dualize=1, scale=1))
    assert afiro().load_into(s2) == 0
    assert s2.load_checkpoint(ckpt) == 0
    s2.solve()
    info = s2.get_info()
    assert info.status == int(Status.SOLVED)
    assert info.objval == pytest.approx(AFIRO_OBJECTIVE, abs=1e-6)

    # but a checkpoint from different preprocessing must be refused
    s3 = LpSolver(params(dualize=0))
    assert afiro().load_into(s3) == 0
    assert s3.load_checkpoint(ckpt) == 0
    s3.solve()
    assert s3.get_info().errflag == int(Errflag.INVALID_CHECKPOINT)


def test_capi_checkpoint_surface(tmp_path):
    from ipx_tpu import capi
    path = str(tmp_path / "capi_ckpt.npz")
    h = capi.ipx_new()
    p = capi.ipx_get_parameters(h)
    p.display = 0
    p.device = "cpu"
    p.ipm_maxiter = 4
    capi.ipx_set_parameters(h, p)
    a = afiro().arrays()
    assert capi.ipx_load_model(h, **a) == 0
    capi.ipx_solve(h)
    assert capi.ipx_save_checkpoint(h, path) == 0

    h2 = capi.ipx_new()
    p2 = capi.ipx_get_parameters(h2)
    p2.display = 0
    p2.device = "cpu"
    capi.ipx_set_parameters(h2, p2)
    assert capi.ipx_load_model(h2, **a) == 0
    assert capi.ipx_load_checkpoint(h2, path) == 0
    capi.ipx_solve(h2)
    info = capi.ipx_get_info(h2)
    assert info.objval == pytest.approx(AFIRO_OBJECTIVE, abs=1e-6)
    capi.ipx_free(h)
    capi.ipx_free(h2)
