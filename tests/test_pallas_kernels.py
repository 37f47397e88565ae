"""Pallas kernels vs XLA-path oracles (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qoc_tpu.ops.pallas_chain import fused_state_chain
from qoc_tpu.ops.pallas_tree import (
    fused_tree_chain, tree_chain_supported,
)
from qoc_tpu.ops.propagation import (
    chain_product_tree, state_transfer_chain, step_propagators,
)


def rel_close(a, b, rtol):
    scale = max(np.max(np.abs(b)), 1e-6)
    return np.max(np.abs(a - b)) / scale < rtol


@pytest.mark.parametrize("K,M,T,order,scaling", [
    (3, 4, 10, 5, 0),
    (3, 4, 37, 6, 2),
    (2, 6, 16, 4, 1),
    (4, 4, 64, 3, 0),
])
def test_tree_kernel_forward(rng, K, M, T, order, scaling):
    mats = (0.1 * rng.standard_normal((K, M, M))).astype(np.float32)
    w = rng.standard_normal((K, T)).astype(np.float32)
    w[0, :] = 1.0
    E = np.asarray(
        fused_tree_chain(jnp.asarray(mats), jnp.asarray(w), order, scaling)
    )
    E_ref = np.asarray(
        chain_product_tree(
            step_propagators(jnp.asarray(mats), jnp.asarray(w), order, scaling)
        )
    )
    assert rel_close(E, E_ref, 1e-5)


def test_tree_kernel_gradient(rng):
    K, M, T, order, scaling = 3, 4, 20, 5, 1
    mats = (0.1 * rng.standard_normal((K, M, M))).astype(np.float32)
    w = rng.standard_normal((K, T)).astype(np.float32)
    w[0, :] = 1.0
    tgt = rng.standard_normal((M, M)).astype(np.float32)
    g_p = np.asarray(jax.grad(
        lambda w: jnp.sum(
            fused_tree_chain(jnp.asarray(mats), w, order, scaling) * tgt)
    )(jnp.asarray(w)))
    g_x = np.asarray(jax.grad(
        lambda w: jnp.sum(chain_product_tree(
            step_propagators(jnp.asarray(mats), w, order, scaling)) * tgt)
    )(jnp.asarray(w)))
    assert rel_close(g_p, g_x, 1e-4)


def test_tree_kernel_nonpow2_padding(rng):
    """T=5 pads to 8 with identity factors; result matches exact product."""
    K, M, order = 2, 4, 6
    mats = (0.1 * rng.standard_normal((K, M, M))).astype(np.float32)
    w = rng.standard_normal((K, 5)).astype(np.float32)
    w[0] = 1.0
    E = np.asarray(fused_tree_chain(jnp.asarray(mats), jnp.asarray(w), order, 0))
    P = np.asarray(step_propagators(jnp.asarray(mats), jnp.asarray(w), order, 0))
    want = P[4] @ P[3] @ P[2] @ P[1] @ P[0]
    assert rel_close(E, want, 1e-5)


def test_tree_chain_supported_bounds():
    assert tree_chain_supported(4, 1000)
    assert tree_chain_supported(12, 1000)
    assert not tree_chain_supported(64, 1000)


def test_state_chain_kernel_matches_scan(rng):
    K, M, C, T, order = 3, 6, 4, 12, 5
    mats = (0.1 * rng.standard_normal((K, M, M))).astype(np.float32)
    w = rng.standard_normal((T, K, C)).astype(np.float32)
    w[:, 0, :] = 1.0
    psi0 = rng.standard_normal((M, C)).astype(np.float32)
    out = np.asarray(
        fused_state_chain(jnp.asarray(mats), jnp.asarray(w),
                          jnp.asarray(psi0), order)
    )
    for c in range(C):
        vecs = state_transfer_chain(
            jnp.asarray(mats), jnp.asarray(w[:, :, c].T),
            jnp.asarray(psi0[:, c : c + 1]), order=order, engine="scan",
        )
        assert np.allclose(out[:, c], np.asarray(vecs[-1])[:, 0], atol=1e-5)


def test_state_chain_kernel_gradients(rng):
    K, M, C, T, order = 2, 4, 2, 8, 4
    mats = (0.1 * rng.standard_normal((K, M, M))).astype(np.float32)
    w = rng.standard_normal((T, K, C)).astype(np.float32)
    w[:, 0, :] = 1.0
    psi0 = rng.standard_normal((M, C)).astype(np.float32)
    tgt = rng.standard_normal((M, C)).astype(np.float32)

    def loss_p(w, psi0):
        return jnp.sum(
            fused_state_chain(jnp.asarray(mats), w, psi0, order) * tgt)

    def loss_s(w, psi0):
        tot = 0.0
        for c in range(C):
            vecs = state_transfer_chain(
                jnp.asarray(mats), w[:, :, c].T, psi0[:, c : c + 1],
                order=order, engine="scan")
            tot = tot + jnp.sum(vecs[-1][:, 0] * tgt[:, c])
        return tot

    gw_p, gp_p = jax.grad(loss_p, argnums=(0, 1))(
        jnp.asarray(w), jnp.asarray(psi0))
    gw_s, gp_s = jax.grad(loss_s, argnums=(0, 1))(
        jnp.asarray(w), jnp.asarray(psi0))
    assert rel_close(np.asarray(gw_p), np.asarray(gw_s), 1e-4)
    assert rel_close(np.asarray(gp_p), np.asarray(gp_s), 1e-4)


def test_tree_kernel_T1_edge(rng):
    """T=1 pads to Tp=2 with an identity factor."""
    mats = (0.1 * rng.standard_normal((2, 4, 4))).astype(np.float32)
    w = rng.standard_normal((2, 1)).astype(np.float32)
    w[0] = 1.0
    E = np.asarray(fused_tree_chain(jnp.asarray(mats), jnp.asarray(w), 6, 0))
    P = np.asarray(step_propagators(jnp.asarray(mats), jnp.asarray(w), 6, 0))
    assert np.allclose(E, P[0], atol=1e-5)


def test_state_chain_high_order(rng):
    """Taylor order 12 (large p_scratch) still matches the scan."""
    K, M, C, T = 2, 4, 2, 6
    mats = (0.2 * rng.standard_normal((K, M, M))).astype(np.float32)
    w = rng.standard_normal((T, K, C)).astype(np.float32)
    w[:, 0, :] = 1.0
    psi0 = rng.standard_normal((M, C)).astype(np.float32)
    out = np.asarray(fused_state_chain(jnp.asarray(mats), jnp.asarray(w),
                                       jnp.asarray(psi0), 12))
    for c in range(C):
        vecs = state_transfer_chain(
            jnp.asarray(mats), jnp.asarray(w[:, :, c].T),
            jnp.asarray(psi0[:, c : c + 1]), order=12, engine="scan")
        assert np.allclose(out[:, c], np.asarray(vecs[-1])[:, 0], atol=1e-5)


def test_state_chain_bad_column_count(rng):
    from qoc_tpu.ops.pallas_chain import COLUMN_BLOCK

    C = COLUMN_BLOCK + 1  # > block, not a multiple
    mats = np.zeros((2, 4, 4), np.float32)
    w = np.ones((3, 2, C), np.float32)
    psi0 = np.ones((4, C), np.float32)
    with pytest.raises(ValueError, match="multiple"):
        fused_state_chain(jnp.asarray(mats), jnp.asarray(w),
                          jnp.asarray(psi0), 3)
