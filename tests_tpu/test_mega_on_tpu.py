"""Fused multi-iteration optimizer kernels on REAL TPU hardware.

The mega kernels (ops/pallas_mega.py, parallel/pallas_mega_batch.py) use
pltpu.roll lane tricks, input/output aliasing, and a raised
vmem_limit_bytes — none of which the CPU interpret mode exercises.  Here
full multi-iteration trajectories are compared against the XLA segment
runner ON DEVICE.
"""

import numpy as np

import jax
import jax.numpy as jnp

from conftest import state_problem, unitary_problem

from qoc_tpu.models.forward import make_forward
from qoc_tpu.optim.adam import (
    init_adam_state,
    make_adam_optimizer,
    make_segment_runner,
)
from qoc_tpu.optim.convergence import ConvergenceSettings
from qoc_tpu.ops.pallas_mega import make_mega_segment_runner, mega_supported
from qoc_tpu.parallel.pallas_mega_batch import (
    batched_mega_supported,
    make_mega_batched_runner,
)


def _conv(**over):
    base = {"rate": 0.01, "update_step": 10, "max_iterations": 500,
            "conv_target": 1e-12}
    base.update(over)
    return ConvergenceSettings.from_dict(base)


def _run_xla(problem, conv, n, reg_coeffs=None, u0=None):
    _, loss_fn = make_forward(problem, lean=True, engine="scan",
                              reg_coeffs=reg_coeffs)
    opt = make_adam_optimizer(conv)
    run_seg, _ = make_segment_runner(loss_fn, conv, opt)
    st = init_adam_state(problem.u0_base if u0 is None else u0, opt)
    return run_seg(st, jnp.asarray(n, dtype=jnp.int32))


def test_mega_state_transfer_trajectory_on_tpu():
    problem = state_problem(steps=64)
    conv = _conv()
    assert mega_supported(problem)
    ref = _run_xla(problem, conv, 30)
    init_state, run_segment, unpad = make_mega_segment_runner(problem, conv)
    ms = run_segment(init_state(problem.u0_base), 30)
    assert int(ms.iteration) == 30
    np.testing.assert_allclose(
        np.asarray(unpad(ms.u_base)), np.asarray(ref.u_base), atol=5e-5)
    np.testing.assert_allclose(float(ms.loss), float(ref.loss), atol=2e-5)
    np.testing.assert_allclose(
        float(ms.grad_squared), float(ref.grad_squared), rtol=2e-3)


def test_mega_unitary_with_penalties_on_tpu():
    problem = unitary_problem(steps=24)
    rc = {"amplitude": 0.1, "dwdt": 0.003}
    conv = _conv()
    ref = _run_xla(problem, conv, 20, reg_coeffs=rc)
    init_state, run_segment, unpad = make_mega_segment_runner(
        problem, conv, reg_coeffs=rc)
    ms = run_segment(init_state(problem.u0_base), 20)
    np.testing.assert_allclose(
        np.asarray(unpad(ms.u_base)), np.asarray(ref.u_base), atol=8e-5)
    np.testing.assert_allclose(float(ms.reg_loss), float(ref.reg_loss),
                               atol=2e-5)
    np.testing.assert_allclose(float(ms.unitary_scale),
                               float(ref.unitary_scale), atol=1e-4)


def test_mega_batch_per_seed_trajectories_on_tpu():
    """4 independent seeds through the batched kernel == 4 individual XLA
    segment-runner trajectories (checks the grid/aliasing/group-sum paths
    against the op-per-op reference on device)."""
    problem = state_problem(steps=64)
    conv = _conv()
    assert batched_mega_supported(problem)
    rng = np.random.default_rng(11)
    S = 4
    u0s = rng.normal(
        scale=1.0 / np.sqrt(problem.steps),
        size=(S, problem.ops_len, problem.steps)).astype(np.float32)

    init_state, run_n, read_u = make_mega_batched_runner(problem, conv)
    st = run_n(init_state(u0s), 25)
    u_batch = read_u(st)

    for s in range(S):
        ref = _run_xla(problem, conv, 25, u0=u0s[s])
        np.testing.assert_allclose(
            u_batch[s], np.asarray(ref.u_base), atol=1e-4,
            err_msg=f"seed {s} diverged from the XLA trajectory")
        np.testing.assert_allclose(
            float(st.losses[s]), float(ref.loss), atol=2e-5)


def test_mega_batch_convergence_freezing_on_tpu():
    """Per-seed freezing: with an immediately-satisfied target no seed
    advances (aliased state tensors must round-trip unchanged)."""
    problem = state_problem(steps=64)
    conv = _conv(conv_target=2.0)
    rng = np.random.default_rng(5)
    u0s = rng.normal(
        scale=0.1, size=(2, problem.ops_len, problem.steps)
    ).astype(np.float32)
    init_state, run_n, read_u = make_mega_batched_runner(problem, conv)
    st = run_n(init_state(u0s), 10)
    np.testing.assert_array_equal(read_u(st), u0s)
    assert np.all(np.asarray(st.it_cols) == 0.0)


def test_forbidden_scan_kernel_on_tpu():
    """The prefix-scan topology (forbidden-state costs in-kernel) on real
    hardware: pltpu.roll-based Hillis-Steele scan + dense-lane backward."""
    import numpy as np
    import qoc_tpu as q
    from qoc_tpu.models.system import ControlProblem

    n = 3
    a = q.annihilate(n)
    H0 = np.diag([0.0, 1.0, 1.95]) * 2 * np.pi
    psi0 = np.zeros(n, complex); psi0[0] = 1
    tgt = np.zeros(n, complex); tgt[1] = 1
    problem = ControlProblem.build(
        H0, [a + a.conj().T, 1j * (a - a.conj().T)], ["x", "y"], [tgt],
        3.0, 64, [psi0], state_transfer=True, maxA=[0.5, 0.5], seed=0)
    rc = {"forbidden_coeff_list": [5.0], "states_forbidden_list": [2],
          "amplitude": 0.1}
    conv = _conv()
    assert mega_supported(problem, rc)
    ref = _run_xla(problem, conv, 20, reg_coeffs=rc)
    init_state, run_segment, unpad = make_mega_segment_runner(
        problem, conv, reg_coeffs=rc)
    ms = run_segment(init_state(problem.u0_base), 20)
    np.testing.assert_allclose(
        np.asarray(unpad(ms.u_base)), np.asarray(ref.u_base), atol=8e-5)
    np.testing.assert_allclose(float(ms.reg_loss), float(ref.reg_loss),
                               atol=2e-5)
    np.testing.assert_allclose(float(ms.loss), float(ref.loss), atol=2e-5)


def test_forbidden_batched_kernel_on_tpu():
    """Forbidden-state cotangent injection in the batched chain kernel on
    real hardware."""
    import numpy as np
    import qoc_tpu as q
    from qoc_tpu.models.system import ControlProblem

    n = 3
    a = q.annihilate(n)
    H0 = np.diag([0.0, 1.0, 1.95]) * 2 * np.pi
    psi0 = np.zeros(n, complex); psi0[0] = 1
    tgt = np.zeros(n, complex); tgt[1] = 1
    problem = ControlProblem.build(
        H0, [a + a.conj().T, 1j * (a - a.conj().T)], ["x", "y"], [tgt],
        3.0, 64, [psi0], state_transfer=True, maxA=[0.5, 0.5], seed=0)
    rc = {"forbidden_coeff_list": [4.0], "states_forbidden_list": [2]}
    conv = _conv()
    assert batched_mega_supported(problem, rc)
    rng = np.random.default_rng(3)
    S = 2
    u0s = rng.normal(scale=1.0 / np.sqrt(problem.steps),
                     size=(S, problem.ops_len, problem.steps)
                     ).astype(np.float32)
    init_state, run_n, read_u = make_mega_batched_runner(
        problem, conv, reg_coeffs=rc)
    st = run_n(init_state(u0s), 12)
    ub = read_u(st)
    for s in range(S):
        ref = _run_xla(problem, conv, 12, reg_coeffs=rc, u0=u0s[s])
        np.testing.assert_allclose(ub[s], np.asarray(ref.u_base), atol=8e-5)
        np.testing.assert_allclose(float(st.reg_losses[s]),
                                   float(ref.reg_loss), atol=2e-5)
