"""Unit tests: batched Taylor expm vs scipy.linalg.expm oracle."""

import numpy as np
import scipy.linalg as la
import jax.numpy as jnp
import pytest

from qoc_tpu.ops.expm import taylor_expm, taylor_expm_matvec, weighted_hamiltonians
from qoc_tpu.ops.isomorphism import c_to_r_mat


def random_hermitian(rng, n):
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    return (A + A.conj().T) / 2


@pytest.mark.parametrize("n", [2, 4, 8])
def test_expm_matches_scipy(rng, n):
    H = random_hermitian(rng, n)
    dt = 0.05
    A_iso = c_to_r_mat(-1j * dt * H).astype(np.float32)
    out = np.asarray(taylor_expm(jnp.asarray(A_iso), order=12, scaling=2))
    ref = c_to_r_mat(la.expm(-1j * dt * H))
    assert np.allclose(out, ref, atol=1e-5)


def test_expm_batched(rng):
    """[T, M, M] batch each matches the single-matrix oracle."""
    T, n, dt = 7, 3, 0.1
    Hs = [random_hermitian(rng, n) for _ in range(T)]
    A = jnp.asarray(
        np.stack([c_to_r_mat(-1j * dt * H) for H in Hs]).astype(np.float32)
    )
    out = np.asarray(taylor_expm(A, order=14, scaling=1))
    for t in range(T):
        ref = c_to_r_mat(la.expm(-1j * dt * Hs[t]))
        assert np.allclose(out[t], ref, atol=1e-5)


def test_expm_unitarity(rng):
    """exp(-i dt H) must stay unitary to the reference's 1e-4 budget."""
    H = random_hermitian(rng, 6)
    A = jnp.asarray(c_to_r_mat(-1j * 0.1 * H).astype(np.float32))
    U = np.asarray(taylor_expm(A, order=12, scaling=2))
    # unitary_scale metric (tensorflow_state.py:225) ~= 1
    n = 6
    metric = 0.5 / n * np.trace(U.T @ U)
    assert abs(metric - 1.0) < 1e-5


def test_matvec_expm(rng):
    n, dt = 5, 0.08
    H = random_hermitian(rng, n)
    v = rng.standard_normal(2 * n).astype(np.float32)[:, None]
    A = jnp.asarray(c_to_r_mat(-1j * dt * H).astype(np.float32))
    out = np.asarray(taylor_expm_matvec(A, jnp.asarray(v), order=15))
    ref = c_to_r_mat(la.expm(-1j * dt * H)) @ v
    assert np.allclose(out, ref, atol=1e-5)


def test_matvec_order_convention():
    """order=k keeps powers 0..k-1 (reference off-by-one,
    tensorflow_state.py:92)."""
    A = jnp.asarray(np.diag([1.0, 1.0]).astype(np.float32))
    v = jnp.asarray(np.ones((2, 1), dtype=np.float32))
    # order=2 -> I + A only: exp approx = 1 + 1 = 2
    out = np.asarray(taylor_expm_matvec(A, v, order=2))
    assert np.allclose(out, 2.0)


def test_weighted_hamiltonians(rng):
    K, T, M = 3, 5, 4
    mats = rng.standard_normal((K, M, M)).astype(np.float32)
    w = rng.standard_normal((K, T)).astype(np.float32)
    out = np.asarray(weighted_hamiltonians(jnp.asarray(mats), jnp.asarray(w)))
    ref = np.einsum("kt,kij->tij", w, mats)
    assert np.allclose(out, ref, atol=1e-5)
