"""ControlProblem preprocessing parity (system_parameters.py semantics)."""

import numpy as np
import pytest

from qoc_tpu.models.operators import SIGMA_X, SIGMA_Y
from qoc_tpu.models.system import ControlProblem
from qoc_tpu.ops.taylor import approx_expm, choose_taylor_terms
import scipy.linalg as la


def build(**kw):
    H0 = np.diag([0.0, 1.0]).astype(complex)
    args = dict(
        H0=H0, Hops=[SIGMA_X, SIGMA_Y], Hnames=["x", "y"],
        U=np.eye(2, dtype=complex), total_time=4.0, steps=40,
        states_concerned_list=[0, 1], seed=0,
    )
    args.update(kw)
    return ControlProblem.build(**args)


def test_dt_and_shapes():
    p = build()
    assert p.dt == 0.1
    assert p.mats.shape == (3, 4, 4)
    assert p.initial_vectors.shape == (4, 2)
    assert p.target_vectors.shape == (4, 2)
    assert p.u0_base.shape == (2, 40)


def test_mats_are_minus_i_dt_H():
    p = build()
    from qoc_tpu.ops.isomorphism import r_to_c_mat

    H0 = np.diag([0.0, 1.0]).astype(complex)
    assert np.allclose(r_to_c_mat(p.mats[0]), -1j * 0.1 * H0, atol=1e-6)
    assert np.allclose(r_to_c_mat(p.mats[1]), -1j * 0.1 * SIGMA_X, atol=1e-6)


def test_max_amp_defaults():
    # no guess: maxA = 4.0 (grape.py:97)
    assert np.allclose(build().ops_max_amp, 4.0)
    # with guess: maxA = 1.5 * max|guess| (grape.py:99)
    guess = np.ones((2, 40)) * 2.0
    p = build(initial_guess=guess)
    assert np.allclose(p.ops_max_amp, 3.0)
    # guess is arcsin'd into base domain (system_parameters.py:46)
    assert np.allclose(p.u0_base, np.arcsin(2.0 / 3.0), atol=1e-6)


def test_guess_exceeding_maxA_raises():
    guess = np.ones((2, 40))
    with pytest.raises(ValueError, match="max_amp"):
        build(initial_guess=guess, maxA=[0.5, 0.5])


def test_negative_guess_exceeding_maxA_raises():
    """The reference's max-only check misses negative overshoots
    (system_parameters.py:44); we catch both signs loudly."""
    guess = -np.ones((2, 40))
    with pytest.raises(ValueError, match="max_amp"):
        build(initial_guess=guess, maxA=[0.5, 0.5])


def test_seeded_guess_reproducible():
    a = build(seed=7).u0_base
    b = build(seed=7).u0_base
    assert np.array_equal(a, b)
    assert np.isclose(np.std(a), 1 / np.sqrt(40), rtol=0.5)


def test_state_transfer_targets():
    psi0 = [np.array([1, 0], dtype=complex)]
    tgt = [np.array([0, 1j], dtype=complex)]
    p = build(states_concerned_list=psi0, U=tgt, state_transfer=True)
    assert p.state_transfer
    assert np.allclose(p.target_vectors[:, 0], [0, 0, 0, 1])
    assert np.allclose(p.initial_vectors[:, 0], [1, 0, 0, 0])


def test_dressed_initial_vectors():
    H0 = np.array([[0.0, 0.1], [0.1, 1.0]], dtype=complex)
    w, v, dressed_id = __import__(
        "qoc_tpu.models.dressed", fromlist=["get_dressed_info"]
    ).get_dressed_info(H0)
    dinfo = {
        "eigenvectors": v, "eigenvalues": w,
        "dressed_id": dressed_id, "is_dressed": True,
    }
    p = build(H0=H0, dressed_info=dinfo)
    assert p.is_dressed
    from qoc_tpu.models.dressed import get_state_index

    want = v[:, get_state_index(0, dressed_id)]
    got = p.initial_vectors[:2, 0] + 1j * p.initial_vectors[2:, 0]
    assert np.allclose(got, want, atol=1e-6)


def test_taylor_terms_pinned():
    p = build(Taylor_terms=[8, 1])
    assert (p.taylor_terms, p.taylor_scaling) == (8, 1)


def test_envelope_mask():
    p = build()
    env = p.one_minus_gauss
    assert env.shape == (2, 40)
    # center of the pulse window is most constrained -> mask smallest there
    assert env[0, 20] < env[0, 0]
    assert np.all(env >= 0.01 - 1e-7)


def test_approx_expm_matches_scipy(rng):
    A = rng.standard_normal((4, 4)) * 0.3
    got = approx_expm(A.astype(complex), 18, 2)
    assert np.allclose(got, la.expm(A), atol=1e-8)


def test_choose_taylor_terms_runs_both_branches():
    H0 = np.diag(np.arange(12)).astype(complex)  # dim >= 10 scalar branch
    ops = [np.eye(12, dtype=complex)]
    t, s = choose_taylor_terms(H0, ops, [1.0], np.eye(12), 0.01, 100, 1e-4,
                               False, False)
    assert 3 <= t <= 20 and s >= 0
    H0s = np.diag([0.0, 1.0]).astype(complex)  # dim < 10 matrix branch
    t2, s2 = choose_taylor_terms(H0s, [SIGMA_X], [4.0], np.eye(2), 0.1, 50,
                                 1e-4, False, False)
    assert 3 <= t2 <= 20 and s2 >= 0
    # state transfer forces scaling 0
    t3, s3 = choose_taylor_terms(H0s, [SIGMA_X], [4.0], np.eye(2), 0.1, 50,
                                 1e-4, True, False)
    assert s3 == 0
