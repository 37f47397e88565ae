"""Pallas kernels on REAL TPU hardware vs float64 oracles and XLA paths.

These are the on-device assertions VERDICT.md round 1 called out: the CPU
suite only ever ran the kernels in interpret mode; here the actual Mosaic
lowerings are checked numerically on the chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import random_hermitian, state_problem, unitary_problem

from qoc_tpu.models.forward import make_forward
from qoc_tpu.ops.pallas_chain import fused_state_chain
from qoc_tpu.ops.pallas_tree import fused_tree_chain
from qoc_tpu.ops.propagation import (
    evolve_unitary,
    state_transfer_chain,
    step_propagators,
    chain_product_tree,
)
from qoc_tpu.utils.verification import scipy_oracle_states


def _chain_inputs(problem, u_base=None):
    """(mats [K,M,M], weights [K,T], psi0 [M,V]) from a ControlProblem."""
    p = problem
    u = np.asarray(p.u0_base if u_base is None else u_base, dtype=np.float32)
    amps = np.asarray(p.ops_max_amp, dtype=np.float32)[:, None] * np.sin(u)
    w = np.concatenate([np.ones((1, p.steps), np.float32), amps], axis=0)
    return (
        jnp.asarray(p.mats, dtype=jnp.float32),
        jnp.asarray(w),
        jnp.asarray(p.initial_vectors, dtype=jnp.float32),
    )


# ---------------------------------------------------------------------------
# chain kernel (state-transfer): float64 scipy oracle + XLA-scan gradients
# ---------------------------------------------------------------------------


def test_chain_kernel_final_state_vs_scipy_float64():
    p = state_problem(steps=64)
    mats, w, psi0 = _chain_inputs(p)
    # kernel layout: w [T, K, C]
    w_cols = jnp.transpose(w)[:, :, None] * jnp.ones(
        (1, 1, psi0.shape[1]), jnp.float32)
    out = np.asarray(
        jax.jit(fused_state_chain, static_argnums=3)(
            mats, w_cols, psi0, p.taylor_terms))

    uks = np.asarray(p.ops_max_amp)[:, None] * np.sin(np.asarray(p.u0_base))
    states = scipy_oracle_states(
        np.asarray(p.H0_c), np.asarray(p.ops_c), uks,
        p.total_time, p.steps, p.initial_vectors_c[0])
    oracle = states[:, -1]  # [N] complex, float64 Pade propagation
    got = out[: p.state_num, 0] + 1j * out[p.state_num :, 0]
    np.testing.assert_allclose(got, oracle, atol=5e-6)


def test_chain_kernel_gradients_vs_xla_scan():
    p = state_problem(steps=64)
    mats, w, psi0 = _chain_inputs(p)
    tgt = jnp.asarray(p.target_vectors, dtype=jnp.float32)

    def loss_kernel(wkt):
        w_cols = jnp.transpose(wkt)[:, :, None] * jnp.ones(
            (1, 1, psi0.shape[1]), jnp.float32)
        fin = fused_state_chain(mats, w_cols, psi0, p.taylor_terms)
        return jnp.sum(fin * tgt)

    def loss_scan(wkt):
        vecs = state_transfer_chain(mats, wkt, psi0, p.taylor_terms,
                                    engine="scan")
        return jnp.sum(vecs[-1] * tgt)

    gk = np.asarray(jax.jit(jax.grad(loss_kernel))(w))
    gs = np.asarray(jax.jit(jax.grad(loss_scan))(w))
    np.testing.assert_allclose(gk[1:], gs[1:], atol=2e-5)


# ---------------------------------------------------------------------------
# tree kernel (unitary): forward vs XLA product tree, gradient vs autodiff
# ---------------------------------------------------------------------------


def test_tree_kernel_forward_and_grad_vs_xla():
    p = unitary_problem(steps=24)
    assert p.taylor_scaling == 2  # exercises the in-kernel squaring branch
    mats, w, _ = _chain_inputs(p)
    order, scaling = p.taylor_terms, p.taylor_scaling

    E_kernel = np.asarray(jax.jit(
        lambda m, ww: fused_tree_chain(m, ww, order, scaling))(mats, w))
    P = step_propagators(mats, w, order, scaling)
    E_xla = np.asarray(chain_product_tree(P))
    np.testing.assert_allclose(E_kernel, E_xla, atol=2e-6)

    seedmat = jnp.asarray(
        np.random.default_rng(7).normal(size=E_xla.shape), jnp.float32)

    def lk(ww):
        return jnp.sum(fused_tree_chain(mats, ww, order, scaling) * seedmat)

    def lx(ww):
        return jnp.sum(
            chain_product_tree(step_propagators(mats, ww, order, scaling))
            * seedmat)

    gk = np.asarray(jax.jit(jax.grad(lk))(w))
    gx = np.asarray(jax.jit(jax.grad(lx))(w))
    np.testing.assert_allclose(gk[1:], gx[1:], atol=3e-5)


# ---------------------------------------------------------------------------
# MXU precision: unitarity drift at dim 64 (2N = 128, full MXU tiles)
# ---------------------------------------------------------------------------


def test_unitarity_drift_dim64_on_mxu(rng):
    """PERF.md's hardware-only bug class: without precision=HIGHEST the MXU
    rounds inputs to bf16 and the chain drifts ~1e-4.  Assert on-device
    unitarity and agreement with a float64 host oracle at dim 64."""
    from qoc_tpu.models.system import ControlProblem

    n = 64
    steps = 50
    H0 = random_hermitian(n, rng, scale=0.5)
    Hops = [random_hermitian(n, rng, scale=0.3) for _ in range(2)]
    U = np.eye(n, dtype=complex)
    # Taylor terms pinned: the reference's dim>=10 auto-search metric bounds
    # only the largest matrix ELEMENT (system_parameters.py:146-149) and
    # under-budgets dense random Hermitians (elementwise max underestimates
    # the spectral norm by ~sqrt(n)); this test isolates MXU arithmetic, not
    # that replicated quirk.
    p = ControlProblem.build(
        H0, Hops, ["a", "b"], U, 5.0, steps, [0, 1, 2, 3],
        maxA=[1.0, 1.0], seed=3, Taylor_terms=[12, 6],
    )
    forward, _ = make_forward(p)
    out = jax.jit(forward)(jnp.asarray(p.u0_base))
    uscale = float(out.unitary_scale)
    assert abs(uscale - 1.0) < 1e-4, f"unitarity drifted: {uscale}"

    # final unitary vs float64 oracle (scipy Pade expm per step)
    import scipy.linalg as la

    uks = np.asarray(p.ops_max_amp)[:, None] * np.sin(np.asarray(p.u0_base))
    dt = p.total_time / steps
    Uo = np.eye(n, dtype=complex)
    for t in range(steps):
        H = H0 + uks[0, t] * Hops[0] + uks[1, t] * Hops[1]
        Uo = la.expm(-1j * dt * H) @ Uo
    F = np.asarray(out.final_state)
    got = F[:n, :n] + 1j * F[n:, :n]
    np.testing.assert_allclose(got, Uo, atol=2e-4)


# ---------------------------------------------------------------------------
# XLA-path cross-check on device: scan vs associative engines agree
# ---------------------------------------------------------------------------


def test_engines_agree_on_device():
    p = state_problem(steps=64)
    mats, w, psi0 = _chain_inputs(p)
    scan = state_transfer_chain(mats, w, psi0, p.taylor_terms, engine="scan")
    asc = state_transfer_chain(mats, w, psi0, p.taylor_terms,
                               engine="associative")
    np.testing.assert_allclose(
        np.asarray(scan[-1]), np.asarray(asc[-1]), atol=2e-6)


def test_pscan_adjoint_grad_on_device(rng):
    """The pscan matvec-adjoint VJP on REAL hardware (MXU HIGHEST
    matmuls + reverse sweep) vs scan autodiff, value and gradient, at an
    MXU-tile dimension (M=32) with a trajectory-reading loss."""
    levels = 16
    a = np.diag(np.sqrt(np.arange(1, levels)), 1)
    H0 = np.diag(np.arange(levels, dtype=float)) * 0.3
    psi0 = np.zeros(levels, complex)
    psi0[0] = 1
    tgt = np.zeros(levels, complex)
    tgt[1] = 1
    import qoc_tpu as q
    from qoc_tpu.models.system import ControlProblem

    p = ControlProblem.build(
        H0, [a + a.conj().T, 1j * (a - a.conj().T)], ["x", "y"], [tgt],
        4.0, 50, [psi0], state_transfer=True, maxA=[1.0, 1.0], seed=0)
    mats, w, psi0r = _chain_inputs(p)

    def loss(w_, engine):
        vecs = state_transfer_chain(mats, w_, psi0r, p.taylor_terms,
                                    engine=engine)
        return jnp.sum(jnp.square(vecs[-1])) + 1e-2 * jnp.sum(
            jnp.square(vecs))

    vs, gs = jax.value_and_grad(lambda w_: loss(w_, "scan"))(w)
    vp, gp = jax.value_and_grad(lambda w_: loss(w_, "pscan"))(w)
    np.testing.assert_allclose(float(vp), float(vs), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gs), atol=1e-3)


def test_xla_cols_speed_up_on_device():
    """In-carry speed_up on the column-batched path matches the vmapped
    generic forward ON HARDWARE (round-5 xla-cols extension)."""
    import qoc_tpu as q
    from qoc_tpu.models.system import ControlProblem
    from qoc_tpu.parallel.batch import init_seeds
    from qoc_tpu.parallel.xla_batch import (make_xla_batched_loss,
                                            xla_cols_supported)

    levels = 6
    a = np.diag(np.sqrt(np.arange(1, levels)), 1)
    psi0 = np.zeros(levels, complex)
    psi0[0] = 1
    tgt = np.zeros(levels, complex)
    tgt[1] = 1
    p = ControlProblem.build(
        np.diag(np.arange(levels, dtype=float)) * 0.5,
        [a + a.conj().T, 1j * (a - a.conj().T)], ["x", "y"], [tgt],
        3.0, 16, [psi0], state_transfer=True, maxA=[1.0, 1.0], seed=0)
    rc = {"speed_up": 0.05}
    assert xla_cols_supported(p, rc)
    u = jnp.asarray(init_seeds(p, 3, jax.random.PRNGKey(5)))
    lx = make_xla_batched_loss(p, rc)
    rx, _ = lx(u)
    _, loss_fn = make_forward(p, reg_coeffs=rc, lean=True, engine="scan")
    for s in range(3):
        want, _ = loss_fn(u[s])
        np.testing.assert_allclose(float(rx[s]), float(want), atol=1e-4)
