"""Fidelity inner products on the real-isomorphism representation.

Block-wise |<psi1|psi2>|^2 computations matching tensorflow_state.py:
  * get_inner_product_2D (:282-300): coherent sum over stacked vectors,
    normalized by V^2 — the phase-sensitive gate fidelity.
  * get_inner_product_3D (:302-321): same, per timestep, summed over time
    (used by the speed_up cost).
"""

from __future__ import annotations

import jax.numpy as jnp


def inner_product_1d(psi1: jnp.ndarray, psi2: jnp.ndarray, state_num: int) -> jnp.ndarray:
    """Single-vector overlap magnitude |<psi1|psi2>|^2 on the real iso
    (get_inner_product, tensorflow_state.py:263-280)."""
    n = state_num
    a, b = psi1[:n], psi1[n : 2 * n]
    c, d = psi2[:n], psi2[n : 2 * n]
    reals = jnp.square(jnp.sum(a * c) + jnp.sum(b * d))
    imags = jnp.square(jnp.sum(b * c) - jnp.sum(a * d))
    return reals + imags


def inner_product_2d(psi1: jnp.ndarray, psi2: jnp.ndarray, state_num: int) -> jnp.ndarray:
    """psi1, psi2: [2N, V] real-isomorphism stacked vectors -> scalar.

    Returns |sum_v <psi1_v | psi2_v>|^2 / V^2.
    """
    n = state_num
    a, b = psi1[:n, :], psi1[n : 2 * n, :]
    c, d = psi2[:n, :], psi2[n : 2 * n, :]
    ac = jnp.sum(a * c, axis=0)
    bd = jnp.sum(b * d, axis=0)
    bc = jnp.sum(b * c, axis=0)
    ad = jnp.sum(a * d, axis=0)
    reals = jnp.square(jnp.sum(ac + bd))
    imags = jnp.square(jnp.sum(bc - ad))
    V = psi1.shape[-1]
    return (reals + imags) / (V * V)


def inner_product_3d(psi1: jnp.ndarray, psi2: jnp.ndarray, state_num: int) -> jnp.ndarray:
    """psi1, psi2: [T, 2N, V] -> scalar; per-time overlaps summed over T.

    (The reference packs time on axis 1, tensorflow_state.py:302-321; our
    propagation engines emit time-major [T, 2N, V], same contraction.)
    """
    n = state_num
    a, b = psi1[:, :n, :], psi1[:, n : 2 * n, :]
    c, d = psi2[:, :n, :], psi2[:, n : 2 * n, :]
    ac = jnp.sum(a * c, axis=1)  # [T, V]
    bd = jnp.sum(b * d, axis=1)
    bc = jnp.sum(b * c, axis=1)
    ad = jnp.sum(a * d, axis=1)
    reals = jnp.sum(jnp.square(jnp.sum(ac + bd, axis=1)))
    imags = jnp.sum(jnp.square(jnp.sum(bc - ad, axis=1)))
    V = psi1.shape[-1]
    return (reals + imags) / (V * V)
