"""Column-batched XLA loss (parallel/xla_batch.py): parity with the
per-seed forward and the pallas batched loss, and the public batched API
end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp

import qoc_tpu as q
from qoc_tpu.models.forward import make_forward
from qoc_tpu.models.system import ControlProblem
from qoc_tpu.parallel.batch import batched_grape_adam, init_seeds
from qoc_tpu.parallel.pallas_batch import make_pallas_batched_loss
from qoc_tpu.parallel.xla_batch import (
    make_xla_batched_loss,
    xla_cols_supported,
)


def _problem(levels=5, steps=12):
    a = q.annihilate(levels)
    H0 = 2 * np.pi * (-0.2) / 2 * (a.conj().T @ a.conj().T @ a @ a)
    psi0 = np.zeros(levels, complex)
    psi0[0] = 1
    tgt = np.zeros(levels, complex)
    tgt[1] = 1
    return ControlProblem.build(
        H0, [a + a.conj().T, 1j * (a - a.conj().T)], ["x", "y"], [tgt],
        3.0, steps, [psi0], state_transfer=True, maxA=[1.0, 1.0], seed=0,
    )


def test_supported():
    assert xla_cols_supported(_problem(), None)
    assert not xla_cols_supported(_problem(), {"forbidden_coeff_list": [1.0],
                                               "states_forbidden_list": [2]})


def test_matches_per_seed_forward():
    problem = _problem()
    S = 3
    u = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(0)))
    batched = make_xla_batched_loss(problem)
    reg_l, fid_l = batched(jnp.asarray(u))

    _, loss_fn = make_forward(problem, lean=True, engine="scan")
    for s in range(S):
        want, _ = loss_fn(jnp.asarray(u[s]))
        np.testing.assert_allclose(float(fid_l[s]), float(want), atol=1e-5)


def test_matches_pallas_loss_with_extras_and_reg():
    problem = _problem()
    S = 4
    u = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(1)))
    extra = np.stack([np.asarray(
        q.c_to_r_mat(-1j * problem.dt
                     * np.diag(np.arange(5, dtype=float))))])
    ew = jnp.asarray(np.linspace(-0.2, 0.2, S)[:, None].astype(np.float32))
    reg = {"amplitude": 0.1, "dwdt": 0.01}
    lx = make_xla_batched_loss(problem, reg, extra_channel_mats=extra)
    lp = make_pallas_batched_loss(problem, reg, extra_channel_mats=extra)
    rx, fx = lx(jnp.asarray(u), ew)
    rp, fp = lp(jnp.asarray(u), ew)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fp), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rx), np.asarray(rp), atol=1e-5)

    # gradients agree too
    gx = jax.grad(lambda a: jnp.sum(lx(a, ew)[0]))(jnp.asarray(u))
    gp = jax.grad(lambda a: jnp.sum(lp(a, ew)[0]))(jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gp), atol=2e-5)


def test_unitary_with_scaling_cols():
    """V=1 unitary problem with taylor_scaling > 0: the column backends
    (xla-cols and the fused chain kernel) match the per-seed forward's
    loss AND gradient — the squaring branch on propagated columns."""
    a = q.annihilate(3)
    problem = ControlProblem.build(
        np.diag([0.0, 1.0, 1.95]) * 2 * np.pi,
        [a + a.conj().T, 1j * (a - a.conj().T)], ["x", "y"],
        q.transmon_gate(q.SIGMA_X, 3), 3.0, 12, [0],
        maxA=[0.6, 0.6], seed=0, Taylor_terms=[8, 2],
    )
    assert problem.taylor_scaling == 2
    assert xla_cols_supported(problem, None)
    from qoc_tpu.parallel.pallas_batch import pallas_batch_supported
    assert pallas_batch_supported(problem, None)

    S = 3
    u = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(2)))
    _, loss_fn = make_forward(problem, lean=True, engine="scan")

    for make in (make_xla_batched_loss, make_pallas_batched_loss):
        batched = make(problem)
        reg_l, fid_l = batched(jnp.asarray(u))
        for s in range(S):
            want, _ = loss_fn(jnp.asarray(u[s]))
            np.testing.assert_allclose(float(fid_l[s]), float(want),
                                       atol=1e-5)
        gb = jax.grad(lambda x: jnp.sum(batched(x)[0]))(jnp.asarray(u))
        for s in range(S):
            gs = jax.grad(lambda x: loss_fn(x)[0])(jnp.asarray(u[s]))
            np.testing.assert_allclose(np.asarray(gb[s]), np.asarray(gs),
                                       atol=2e-5)


def test_batched_grape_adam_xla_cols_backend():
    problem = _problem(levels=3, steps=10)
    out = batched_grape_adam(
        problem, n_seeds=4,
        convergence={"rate": 0.05, "update_step": 20, "max_iterations": 60,
                     "conv_target": 1e-3},
        seed=0, backend="xla-cols",
    )
    ref = batched_grape_adam(
        problem, n_seeds=4,
        convergence={"rate": 0.05, "update_step": 20, "max_iterations": 60,
                     "conv_target": 1e-3},
        seed=0, backend="xla",
    )
    np.testing.assert_allclose(out["losses"], ref["losses"], atol=1e-4)
    np.testing.assert_allclose(out["uks"], ref["uks"], atol=1e-3)
