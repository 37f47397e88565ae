"""Seed-batched fused optimizer kernel (parallel/pallas_mega_batch.py):
gradient exactness vs a float64 finite-difference oracle, trajectory
agreement with the XLA+optax batched path, segment composition, and the
Hamiltonian-sweep extra channels."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import qoc_tpu as q
from qoc_tpu.models.system import ControlProblem
from qoc_tpu.optim.adam import make_adam_optimizer
from qoc_tpu.optim.convergence import ConvergenceSettings
from qoc_tpu.parallel.batch import init_seeds
from qoc_tpu.parallel.pallas_batch import make_pallas_batched_loss
from qoc_tpu.parallel.pallas_mega_batch import (
    batched_mega_supported,
    make_mega_batched_runner,
)


def _problem(steps=16):
    return ControlProblem.build(
        np.zeros((2, 2), dtype=complex), [q.SIGMA_X, q.SIGMA_Y], ["x", "y"],
        [np.array([0, 1], dtype=complex)], 2.0, steps,
        [np.array([1, 0], dtype=complex)],
        state_transfer=True, maxA=[0.7, 0.7], seed=0,
    )


def _conv():
    return ConvergenceSettings.from_dict(
        {"rate": 0.01, "update_step": 10, "max_iterations": 100,
         "conv_target": 1e-12})


def _loss_np64(problem, u, extra_mats=None, extra_w=None):
    """Float64 numpy oracle for the per-seed fidelity loss."""
    mats = np.asarray(problem.mats, dtype=np.float64)
    if extra_mats is not None:
        mats = np.concatenate([mats, np.asarray(extra_mats, np.float64)])
    psi = np.asarray(problem.initial_vectors, dtype=np.float64)[:, 0]
    tgt = np.asarray(problem.target_vectors, dtype=np.float64)[:, 0]
    maxA = np.asarray(problem.ops_max_amp, dtype=np.float64)
    N = problem.state_num
    T = u.shape[1]
    rows = [np.ones((1, T)), maxA[:, None] * np.sin(u)]
    if extra_w is not None:
        rows.append(np.broadcast_to(
            np.asarray(extra_w, np.float64)[:, None], (len(extra_w), T)))
    w = np.concatenate(rows, axis=0)
    for t in range(T):
        A = np.einsum("k,kij->ij", w[:, t], mats)
        acc, pn = psi.copy(), psi.copy()
        for n in range(1, problem.taylor_terms):
            pn = (A @ pn) / n
            acc = acc + pn
        psi = acc
    a, b = psi[:N], psi[N:]
    c, d = tgt[:N], tgt[N:]
    re, im = a @ c + b @ d, b @ c - a @ d
    return 1.0 - (re * re + im * im)


def test_supported_gates():
    assert batched_mega_supported(_problem())
    # round 4: ALL seven reference penalties are in-kernel in the batched
    # kernel (pulse-shape, bandpass, forbidden, speed_up)
    assert batched_mega_supported(_problem(), reg_coeffs={"dwdt": 0.1})
    assert batched_mega_supported(
        _problem(), reg_coeffs={"amplitude": 0.1, "envelope": 0.2,
                                "d2wdt2": 0.01})
    assert batched_mega_supported(
        _problem(), reg_coeffs={"bandpass": 0.1, "band": [0.1, 3.0]})
    assert batched_mega_supported(_problem(), reg_coeffs={"speed_up": 0.1})
    assert not batched_mega_supported(
        _problem(), reg_coeffs={"bandpass": 0.1})  # band required
    assert not batched_mega_supported(
        _problem(), reg_coeffs={"not_a_cost": 0.1})


def test_gradient_matches_float64_oracle():
    """The in-kernel reverse sweep is exact: after one Adam step the first
    moment equals (1-b1)*grad; compare to central differences in float64."""
    problem = _problem()
    u0 = np.asarray(init_seeds(problem, 2, jax.random.PRNGKey(0)))
    init_state, run_n, read_u = make_mega_batched_runner(problem, _conv())
    st = run_n(init_state(u0), 1)
    g_mega = np.transpose(np.asarray(st.m_cols), (2, 1, 0))[0] / 0.1

    u = u0[0].astype(np.float64)
    h = 1e-6
    g64 = np.zeros_like(u)
    for k in range(u.shape[0]):
        for t in range(u.shape[1]):
            up, um = u.copy(), u.copy()
            up[k, t] += h
            um[k, t] -= h
            g64[k, t] = (_loss_np64(problem, up)
                         - _loss_np64(problem, um)) / (2 * h)
    np.testing.assert_allclose(g_mega, g64, atol=5e-6)
    np.testing.assert_allclose(
        float(np.asarray(st.losses)[0]), _loss_np64(problem, u), atol=1e-6)


def test_matches_xla_optax_path():
    """Same trajectory as vmapped optax Adam over the XLA batched loss
    (float32 reassociation tolerance; the kernel is the *more* accurate
    side vs a float64 oracle)."""
    problem = _problem()
    conv = _conv()
    S = 8
    u0 = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(0)))
    batched_loss = make_pallas_batched_loss(problem)
    optimizer = make_adam_optimizer(conv)
    grad_all = jax.grad(lambda u: jnp.sum(batched_loss(u)[0]))
    vupd = jax.vmap(lambda g, os, u: optimizer.update(g, os, u),
                    in_axes=(0, 0, 0))
    u = jnp.asarray(u0)
    os_ = jax.vmap(optimizer.init)(u)
    for _ in range(5):
        g = grad_all(u)
        upd, os_ = vupd(g, os_, u)
        u = jax.vmap(optax.apply_updates)(u, upd)

    init_state, run_n, read_u = make_mega_batched_runner(problem, conv)
    st = run_n(init_state(u0), 5)
    np.testing.assert_allclose(read_u(st), np.asarray(u), atol=5e-4)
    # per-seed losses actually decrease under the kernel's own metric
    assert float(np.median(np.asarray(st.losses))) < 1.0


def test_segments_compose():
    problem = _problem()
    conv = _conv()
    u0 = np.asarray(init_seeds(problem, 4, jax.random.PRNGKey(1)))
    init_state, run_n, read_u = make_mega_batched_runner(problem, conv)
    a = run_n(init_state(u0), 12)
    b = init_state(u0)
    for _ in range(3):
        b = run_n(b, 4)
    np.testing.assert_allclose(read_u(a), read_u(b), atol=1e-6)
    assert b.iteration == 12
    np.testing.assert_array_equal(np.asarray(a.it_cols),
                                  np.asarray(b.it_cols))


def test_extra_sweep_channels():
    """Constant per-seed detuning channels (the Hamiltonian-sweep hook)
    against the float64 oracle."""
    problem = _problem(steps=8)
    extra = np.stack([np.asarray(
        q.c_to_r_mat(-1j * (problem.total_time / problem.steps)
                     * np.diag([0.0, 1.0])))])
    deltas = np.array([[0.3], [-0.5]], dtype=np.float32)  # [S=2, E=1]
    u0 = np.asarray(init_seeds(problem, 2, jax.random.PRNGKey(2)))
    init_state, run_n, read_u = make_mega_batched_runner(
        problem, _conv(), extra_channel_mats=extra)
    st = run_n(init_state(u0), 1, extra_weights=deltas)
    for s in range(2):
        want = _loss_np64(problem, u0[s].astype(np.float64),
                          extra_mats=extra, extra_w=deltas[s])
        np.testing.assert_allclose(
            float(np.asarray(st.losses)[s]), want, atol=1e-6)


def test_per_seed_convergence_freezes():
    """Seeds that hit conv_target freeze (controls, moments, per-seed
    iteration count) while the rest keep stepping — the batch.py early-stop
    semantics inside the kernel."""
    problem = _problem()
    conv = ConvergenceSettings.from_dict(
        {"rate": 0.05, "update_step": 10, "max_iterations": 1000,
         "conv_target": 0.5})
    S = 8
    u0 = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(5)))
    init_state, run_n, read_u = make_mega_batched_runner(problem, conv)
    st = run_n(init_state(u0), 120)
    done = np.asarray(st.done_cols)[0]
    its = np.asarray(st.it_cols)[0]
    losses = np.asarray(st.losses)
    assert done.any(), "expected at least one seed to converge"
    # frozen seeds stopped early; their reported loss satisfies the target
    assert (its[done > 0.5] < 120).all()
    assert (losses[done > 0.5] < 0.5).all()
    # live seeds advanced the full segment
    if (done < 0.5).any():
        assert (its[done < 0.5] == 120).all()

    # max_iterations predicate freezes everyone
    conv2 = ConvergenceSettings.from_dict(
        {"rate": 0.05, "update_step": 10, "max_iterations": 7,
         "conv_target": 1e-12})
    init2, run2, _ = make_mega_batched_runner(problem, conv2)
    st2 = run2(init2(u0), 30)
    np.testing.assert_array_equal(np.asarray(st2.it_cols)[0],
                                  np.full(S, 7.0, np.float32))
    assert (np.asarray(st2.done_cols)[0] > 0.5).all()


def test_sharded_over_mesh_matches_single_device(eight_devices):
    """shard_map over an 8-device mesh: identical trajectories to the
    single-device kernel (seeds are independent; no collectives fire)."""
    from qoc_tpu.parallel.mesh import make_mesh

    problem = _problem()
    conv = _conv()
    S = 16
    u0 = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(3)))

    init_a, run_a, read_a = make_mega_batched_runner(problem, conv)
    a = run_a(init_a(u0), 6)

    mesh = make_mesh(n_devices=8)
    init_b, run_b, read_b = make_mega_batched_runner(problem, conv,
                                                     mesh=mesh)
    b = run_b(init_b(u0), 6)

    np.testing.assert_allclose(read_b(b), read_a(a), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.losses), np.asarray(a.losses),
                               atol=1e-6)


@pytest.mark.slow
def test_multi_vector_unitary_group_fidelity():
    """V=4 concerned vectors (CNOT-class, no_scaling unitary): batched
    kernel losses match the per-seed forward's coherent fidelity, and
    the public API optimizes identically to the xla backend."""
    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.parallel.batch import batched_grape_adam

    CNOT = np.eye(4, dtype=complex)
    CNOT[2:, 2:] = [[0, 1], [1, 0]]
    XI = np.kron(q.SIGMA_X, np.eye(2))
    IX = np.kron(np.eye(2), q.SIGMA_X)
    ZZ = np.kron(q.SIGMA_Z, q.SIGMA_Z)
    YI = np.kron(q.SIGMA_Y, np.eye(2))
    problem = ControlProblem.build(
        np.zeros((4, 4), dtype=complex), [XI, IX, ZZ, YI],
        ["xi", "ix", "zz", "yi"], CNOT, 4.0, 12, [0, 1, 2, 3],
        maxA=[1.0] * 4, seed=0, no_scaling=True,
    )
    assert batched_mega_supported(problem)
    conv = _conv()
    S = 4
    u0 = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(7)))

    init_state, run_n, read_u = make_mega_batched_runner(problem, conv)
    st = run_n(init_state(u0), 1)
    _, loss_fn = make_forward(problem, lean=True, engine="scan")
    for s in range(S):
        want, _ = loss_fn(jnp.asarray(u0[s]))
        np.testing.assert_allclose(
            float(np.asarray(st.losses)[s]), float(want), atol=1e-5)

    conv_d = {"rate": 0.05, "update_step": 15, "max_iterations": 45,
              "conv_target": 1e-6}
    out = batched_grape_adam(problem, n_seeds=S, convergence=conv_d,
                             seed=0, backend="mega")
    ref = batched_grape_adam(problem, n_seeds=S, convergence=conv_d,
                             seed=0, backend="xla")
    np.testing.assert_allclose(out["losses"], ref["losses"], atol=1e-4)
    np.testing.assert_allclose(out["uks"], ref["uks"], atol=1e-3)


@pytest.mark.slow
def test_unitary_with_scaling_batched():
    """CNOT-class sweep WITH taylor_scaling > 0 (BASELINE config 2): the
    squaring branch runs as repeated pre-scaled Taylor applications on the
    column layout; losses and trajectories match the per-seed forward."""
    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.parallel.batch import batched_grape_adam

    CNOT = np.eye(4, dtype=complex)
    CNOT[2:, 2:] = [[0, 1], [1, 0]]
    XI = np.kron(q.SIGMA_X, np.eye(2))
    IX = np.kron(np.eye(2), q.SIGMA_X)
    ZZ = np.kron(q.SIGMA_Z, q.SIGMA_Z)
    problem = ControlProblem.build(
        np.zeros((4, 4), dtype=complex), [XI, IX, ZZ],
        ["xi", "ix", "zz"], CNOT, 4.0, 12, [0, 1, 2, 3],
        maxA=[1.0] * 3, seed=0, Taylor_terms=[8, 2],
    )
    assert problem.taylor_scaling == 2
    assert batched_mega_supported(problem)
    conv = _conv()
    S = 4
    u0 = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(7)))

    init_state, run_n, read_u = make_mega_batched_runner(problem, conv)
    st = run_n(init_state(u0), 1)
    _, loss_fn = make_forward(problem, lean=True, engine="scan")
    for s in range(S):
        want, _ = loss_fn(jnp.asarray(u0[s]))
        np.testing.assert_allclose(
            float(np.asarray(st.losses)[s]), float(want), atol=1e-5)

    conv_d = {"rate": 0.05, "update_step": 15, "max_iterations": 45,
              "conv_target": 1e-6}
    out = batched_grape_adam(problem, n_seeds=S, convergence=conv_d,
                             seed=0, backend="mega")
    ref = batched_grape_adam(problem, n_seeds=S, convergence=conv_d,
                             seed=0, backend="xla")
    np.testing.assert_allclose(out["losses"], ref["losses"], atol=1e-4)
    # 2^s extra float32 reassociations per step amplify over 45 iterations;
    # single-iteration parity is the 1e-5 check above
    np.testing.assert_allclose(out["uks"], ref["uks"], atol=5e-3)


def test_multi_vector_state_transfer():
    """V=2 stacked state-transfer targets: coherent group fidelity."""
    from qoc_tpu.models.forward import make_forward

    psi0s = [np.array([1, 0], dtype=complex), np.array([0, 1], dtype=complex)]
    tgts = [np.array([0, 1], dtype=complex), np.array([1, 0], dtype=complex)]
    problem = ControlProblem.build(
        np.zeros((2, 2), dtype=complex), [q.SIGMA_X, q.SIGMA_Y], ["x", "y"],
        tgts, 2.0, 16, psi0s, state_transfer=True, maxA=[0.7, 0.7], seed=0,
    )
    conv = _conv()
    u0 = np.asarray(init_seeds(problem, 4, jax.random.PRNGKey(8)))
    init_state, run_n, read_u = make_mega_batched_runner(problem, conv)
    # metrics are evaluated at the CURRENT iterate before the update, so
    # after 1 iteration st.losses is exactly loss(u0)
    st = run_n(init_state(u0), 1)
    _, loss_fn = make_forward(problem, lean=True, engine="scan")
    for s in range(4):
        want, _ = loss_fn(jnp.asarray(u0[s]))
        np.testing.assert_allclose(
            float(np.asarray(st.losses)[s]), float(want), atol=1e-5)
    # and optimization actually reduces the group fidelity loss
    st = run_n(st, 30)
    u_opt = read_u(st)
    for s in range(4):
        after, _ = loss_fn(jnp.asarray(u_opt[s]))
        assert float(after) < float(loss_fn(jnp.asarray(u0[s]))[0])


def _leakage_problem(steps=16):
    n = 3
    a = q.annihilate(n)
    H0 = np.diag([0.0, 1.0, 1.95]) * 2 * np.pi
    psi0 = np.zeros(n, complex); psi0[0] = 1
    tgt = np.zeros(n, complex); tgt[1] = 1
    return ControlProblem.build(
        H0, [a + a.conj().T, 1j * (a - a.conj().T)], ["x", "y"], [tgt],
        2.0, steps, [psi0], state_transfer=True, maxA=[0.5, 0.5], seed=0)


def test_forbidden_supported_and_matches_xla():
    """Forbidden-state penalties ride the VMEM trajectory: per-seed
    trajectories and reg losses match the per-seed XLA segment runner."""
    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.optim.adam import init_adam_state, make_segment_runner

    problem = _leakage_problem()
    rc = {"forbidden_coeff_list": [4.0], "states_forbidden_list": [2]}
    assert batched_mega_supported(problem, reg_coeffs=rc)
    # forbidden composes with the in-kernel pulse + speed_up costs (r4)
    assert batched_mega_supported(
        problem, reg_coeffs=dict(rc, amplitude=0.1))
    assert batched_mega_supported(
        problem, reg_coeffs=dict(rc, speed_up=0.1))
    conv = _conv()

    S = 3
    u0s = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(3)))
    init_state, run_n, read_u = make_mega_batched_runner(
        problem, conv, reg_coeffs=rc)
    st = run_n(init_state(u0s), 12)
    ub = read_u(st)

    _, loss_fn = make_forward(problem, lean=True, engine="scan",
                              reg_coeffs=rc)
    opt = make_adam_optimizer(conv)
    run_seg, _ = make_segment_runner(loss_fn, conv, opt)
    for s in range(S):
        ref = run_seg(init_adam_state(u0s[s], opt),
                      jnp.asarray(12, dtype=jnp.int32))
        np.testing.assert_allclose(ub[s], np.asarray(ref.u_base), atol=5e-5)
        np.testing.assert_allclose(float(st.losses[s]), float(ref.loss),
                                   atol=2e-5)
        np.testing.assert_allclose(float(st.reg_losses[s]),
                                   float(ref.reg_loss), atol=2e-5)


def test_forbidden_through_batch_layer():
    """parallel/batch.py auto-routes leakage problems to the fused kernel
    and reports distinct loss vs reg_loss."""
    from qoc_tpu.parallel.batch import make_batched_runner

    problem = _leakage_problem()
    # large coeff so the penalty clears float32 resolution next to a ~1
    # fidelity loss (the physical populations at these weak drives are 1e-4)
    rc = {"forbidden_coeff_list": [4e5], "states_forbidden_list": [2]}
    conv = _conv()
    init_state, run_segment = make_batched_runner(
        problem, conv, reg_coeffs=rc, backend="mega")
    u0s = np.asarray(init_seeds(problem, 2, jax.random.PRNGKey(5)))
    st = run_segment(init_state(u0s), jnp.asarray(8, dtype=jnp.int32), None)
    assert int(st.iteration) == 8
    reg = np.asarray(st.reg_loss)
    loss = np.asarray(st.loss)
    assert np.all(np.isfinite(reg)) and np.all(reg >= loss - 1e-7)
    assert np.any(reg > loss)  # the penalty is actually being charged


def test_pulse_costs_in_batched_kernel():
    """All five pulse-shape/spectral penalties
    (regularization_functions.py:15-67) computed IN-KERNEL on the column
    layout: per-seed reg losses, fidelity losses, and analytic gradients
    match the vmapped XLA path (value_and_grad of the generic forward)."""
    from qoc_tpu.models.forward import make_forward

    problem = _problem()
    rc = {"amplitude": 0.3, "envelope": 0.2, "dwdt": 0.05, "d2wdt2": 0.001,
          "bandpass": 0.1, "band": [0.1, 3.0]}
    assert batched_mega_supported(problem, reg_coeffs=rc)
    S = 4
    u0 = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(0)))
    init_m, run_m, _ = make_mega_batched_runner(
        problem, _conv(), reg_coeffs=rc)
    st = run_m(init_m(u0), 1)

    _, loss_fn = make_forward(problem, reg_coeffs=rc, lean=True,
                              engine="scan")
    vg = jax.vmap(lambda u: jax.value_and_grad(lambda x: loss_fn(x)[0])(u))
    regs, grads = vg(jnp.asarray(u0))
    fids = jax.vmap(lambda u: loss_fn(u)[1].loss)(jnp.asarray(u0))
    np.testing.assert_allclose(np.asarray(st.reg_losses), np.asarray(regs),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(st.losses), np.asarray(fids),
                               atol=2e-5)
    # after one Adam step the first moment is (1-b1) * grad
    g_mega = np.transpose(np.asarray(st.m_cols), (2, 1, 0)) / 0.1
    np.testing.assert_allclose(g_mega, np.asarray(grads), atol=2e-5)


def test_forbidden_plus_pulse_costs_compose():
    """Forbidden-state (trajectory) + pulse-shape penalties in ONE kernel:
    reg losses and gradients match the vmapped XLA path."""
    from qoc_tpu.models.forward import make_forward

    problem = _leakage_problem()
    rc = {"forbidden_coeff_list": [5.0], "states_forbidden_list": [2],
          "dwdt": 0.01, "amplitude": 0.05}
    assert batched_mega_supported(problem, reg_coeffs=rc)
    S = 2
    u0 = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(5)))
    init_m, run_m, _ = make_mega_batched_runner(
        problem, _conv(), reg_coeffs=rc)
    st = run_m(init_m(u0), 1)

    _, loss_fn = make_forward(problem, reg_coeffs=rc, lean=True,
                              engine="scan")
    vg = jax.vmap(lambda u: jax.value_and_grad(lambda x: loss_fn(x)[0])(u))
    regs, grads = vg(jnp.asarray(u0))
    np.testing.assert_allclose(np.asarray(st.reg_losses), np.asarray(regs),
                               atol=2e-5)
    V = problem.initial_vectors.shape[1]
    g_mega = np.transpose(np.asarray(st.m_cols)[:, :, ::V], (2, 1, 0)) / 0.1
    np.testing.assert_allclose(g_mega, np.asarray(grads), atol=1e-5)


@pytest.mark.slow
def test_cnot_smoothness_reg_batched():
    """BASELINE config 2's own reg_coeffs (smoothness + envelope) on a
    CNOT-class sweep with taylor_scaling > 0 stays on the fused batched
    kernel: values + gradients match the vmapped XLA path, and the batch
    layer auto-routes to backend 'mega'."""
    from qoc_tpu.models.forward import make_forward

    CNOT = np.eye(4, dtype=complex)
    CNOT[2:, 2:] = [[0, 1], [1, 0]]
    XI = np.kron(q.SIGMA_X, np.eye(2))
    IX = np.kron(np.eye(2), q.SIGMA_X)
    ZZ = np.kron(q.SIGMA_Z, q.SIGMA_Z)
    problem = ControlProblem.build(
        np.zeros((4, 4), dtype=complex), [XI, IX, ZZ],
        ["xi", "ix", "zz"], CNOT, 4.0, 12, [0, 1, 2, 3],
        maxA=[1.0] * 3, seed=0, Taylor_terms=[8, 2],
    )
    rc = {"dwdt": 0.01, "envelope": 0.1}
    assert problem.taylor_scaling == 2
    assert batched_mega_supported(problem, reg_coeffs=rc)
    S = 3
    u0 = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(3)))
    init_m, run_m, _ = make_mega_batched_runner(
        problem, _conv(), reg_coeffs=rc)
    st = run_m(init_m(u0), 1)

    _, loss_fn = make_forward(problem, reg_coeffs=rc, lean=True,
                              engine="scan")
    vg = jax.vmap(lambda u: jax.value_and_grad(lambda x: loss_fn(x)[0])(u))
    regs, grads = vg(jnp.asarray(u0))
    np.testing.assert_allclose(np.asarray(st.reg_losses), np.asarray(regs),
                               atol=2e-5)
    g_mega = np.transpose(np.asarray(st.m_cols)[:, :, ::4], (2, 1, 0)) / 0.1
    np.testing.assert_allclose(g_mega, np.asarray(grads), atol=1e-5)


def test_speed_up_in_batched_kernel():
    """speed_up (regularization_functions.py:88-95) in-kernel on the
    batched path: reg losses and gradients match the vmapped XLA forward
    (which materializes inter_vecs) — completing all 7 penalties
    in-kernel, state-transfer AND unitary/V>1 group-overlap cases."""
    from qoc_tpu.models.forward import make_forward

    # state transfer, V = 1
    problem = _problem()
    rc = {"speed_up": 0.05, "amplitude": 0.02}
    assert batched_mega_supported(problem, reg_coeffs=rc)
    S = 3
    u0 = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(8)))
    init_m, run_m, _ = make_mega_batched_runner(
        problem, _conv(), reg_coeffs=rc)
    st = run_m(init_m(u0), 1)
    _, loss_fn = make_forward(problem, reg_coeffs=rc, lean=True,
                              engine="scan")
    vg = jax.vmap(lambda u: jax.value_and_grad(lambda x: loss_fn(x)[0])(u))
    regs, grads = vg(jnp.asarray(u0))
    np.testing.assert_allclose(np.asarray(st.reg_losses), np.asarray(regs),
                               atol=2e-5)
    g_mega = np.transpose(np.asarray(st.m_cols), (2, 1, 0)) / 0.1
    np.testing.assert_allclose(g_mega, np.asarray(grads), atol=2e-5)

    # unitary mode, V = 2 (group-coherent per-tau overlap)
    a = q.annihilate(3)
    p2 = ControlProblem.build(
        np.diag([0.0, 1.0, 1.95]) * 2 * np.pi,
        [a + a.conj().T, 1j * (a - a.conj().T)], ["x", "y"],
        q.transmon_gate(q.SIGMA_X, 3), 3.0, 12, [0, 1],
        maxA=[0.6, 0.6], seed=0, Taylor_terms=[8, 0], no_scaling=True,
    )
    rc2 = {"speed_up": 0.1}
    assert batched_mega_supported(p2, reg_coeffs=rc2)
    u2 = np.asarray(init_seeds(p2, 2, jax.random.PRNGKey(9)))
    init_m2, run_m2, _ = make_mega_batched_runner(
        p2, _conv(), reg_coeffs=rc2)
    st2 = run_m2(init_m2(u2), 1)
    _, loss_fn2 = make_forward(p2, reg_coeffs=rc2, lean=True,
                               engine="scan")
    vg2 = jax.vmap(lambda u: jax.value_and_grad(lambda x: loss_fn2(x)[0])(u))
    regs2, grads2 = vg2(jnp.asarray(u2))
    np.testing.assert_allclose(np.asarray(st2.reg_losses),
                               np.asarray(regs2), atol=2e-5)
    V2 = p2.initial_vectors.shape[1]
    g2 = np.transpose(np.asarray(st2.m_cols)[:, :, ::V2], (2, 1, 0)) / 0.1
    np.testing.assert_allclose(g2, np.asarray(grads2), atol=2e-5)
