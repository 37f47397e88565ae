"""Unit tests: complex<->real isomorphism (grape_functions.py:211-220 parity)."""

import numpy as np
import pytest

from qoc_tpu.ops.isomorphism import (
    c_to_r_mat, c_to_r_vec, r_to_c_mat, r_to_c_vec,
)


def random_complex(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def test_mat_roundtrip(rng):
    M = random_complex(rng, 5, 5)
    assert np.allclose(r_to_c_mat(c_to_r_mat(M)), M)


def test_vec_roundtrip(rng):
    v = random_complex(rng, 7)
    assert np.allclose(r_to_c_vec(c_to_r_vec(v)), v)


def test_homomorphism_product(rng):
    """iso(AB) == iso(A) iso(B) — the property propagation relies on."""
    A = random_complex(rng, 4, 4)
    B = random_complex(rng, 4, 4)
    assert np.allclose(c_to_r_mat(A @ B), c_to_r_mat(A) @ c_to_r_mat(B))


def test_transpose_is_dagger(rng):
    """iso(A)^T == iso(A^dagger): the adjoint-backward trick's foundation."""
    A = random_complex(rng, 4, 4)
    assert np.allclose(c_to_r_mat(A).T, c_to_r_mat(A.conj().T))


def test_matvec(rng):
    A = random_complex(rng, 4, 4)
    v = random_complex(rng, 4)
    assert np.allclose(c_to_r_mat(A) @ c_to_r_vec(v), c_to_r_vec(A @ v))


def test_block_layout():
    M = np.array([[1 + 2j]])
    iso = c_to_r_mat(M)
    assert iso.shape == (2, 2)
    assert np.allclose(iso, [[1, -2], [2, 1]])
