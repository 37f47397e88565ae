"""Fused batched Taylor expm (ops/pallas_expm.py): bit-exact forward vs
the XLA series, exact-gradient parity, padding and edge orders."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qoc_tpu.ops.expm import taylor_expm
from qoc_tpu.ops.pallas_expm import fused_expm_supported, fused_taylor_expm


@pytest.fixture
def A(rng):
    return jnp.asarray(
        rng.standard_normal((5, 32, 32)).astype(np.float32) * 0.05)


def test_supported_gates():
    assert fused_expm_supported(128, 8, 2)
    assert not fused_expm_supported(8, 8, 2)     # lane-layout tree regime
    assert not fused_expm_supported(130, 8, 2)   # not MXU-tileable


@pytest.mark.parametrize("order,scaling", [(1, 0), (3, 0), (2, 1), (12, 3)])
def test_forward_matches_xla_series(A, order, scaling):
    # same truncation/association; differences are pure f32 lowering ulps
    np.testing.assert_allclose(
        np.asarray(taylor_expm(A, order, scaling)),
        np.asarray(fused_taylor_expm(A, order, scaling)), atol=1e-6)


@pytest.mark.parametrize("order,scaling", [(3, 0), (6, 2)])
def test_gradient_matches_autodiff(A, order, scaling):
    gx = jax.grad(
        lambda a: jnp.sum(jnp.sin(taylor_expm(a, order, scaling))))(A)
    gf = jax.grad(
        lambda a: jnp.sum(jnp.sin(fused_taylor_expm(a, order, scaling))))(A)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=2e-6)


def test_time_padding(rng):
    """T not a multiple of the block size pads with exp(0) = I internally
    and slices back."""
    A = jnp.asarray(rng.standard_normal((7, 32, 32)).astype(np.float32) * 0.1)
    out = fused_taylor_expm(A, 5, 1)
    assert out.shape == (7, 32, 32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(taylor_expm(A, 5, 1)), atol=1e-6)
