"""Fused multi-iteration optimizer kernel (ops/pallas_mega.py) vs the
XLA-op segment runner (optim/adam.py): identical Adam + convergence
semantics, same trajectories within float32 reassociation noise."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qoc_tpu as q
from qoc_tpu.models.forward import make_forward
from qoc_tpu.models.system import ControlProblem
from qoc_tpu.optim.adam import (
    init_adam_state,
    make_adam_optimizer,
    make_segment_runner,
)
from qoc_tpu.optim.convergence import ConvergenceSettings
from qoc_tpu.ops.pallas_mega import (
    make_mega_segment_runner,
    mega_state_from_optax,
    mega_state_to_optax,
    mega_supported,
)


def _state_problem(steps=32):
    return ControlProblem.build(
        np.zeros((2, 2), dtype=complex), [q.SIGMA_X, q.SIGMA_Y], ["x", "y"],
        [np.array([0, 1], dtype=complex)], 2.0, steps,
        [np.array([1, 0], dtype=complex)],
        state_transfer=True, maxA=[0.7, 0.7], seed=0,
    )


def _unitary_problem(steps=24):
    return ControlProblem.build(
        np.zeros((2, 2), dtype=complex), [q.SIGMA_X, q.SIGMA_Y], ["x", "y"],
        q.SIGMA_X, 2.0, steps, [0, 1],
        maxA=[1.0, 1.0], seed=1, Taylor_terms=[6, 2],
    )


def _conv(**over):
    base = {"rate": 0.01, "update_step": 10, "max_iterations": 200,
            "conv_target": 1e-12}
    base.update(over)
    return ConvergenceSettings.from_dict(base)


def _run_xla(problem, conv, n):
    _, loss_fn = make_forward(problem, lean=True, engine="scan")
    opt = make_adam_optimizer(conv)
    run_seg, _ = make_segment_runner(loss_fn, conv, opt)
    st = init_adam_state(problem.u0_base, opt)
    return run_seg(st, jnp.asarray(n, dtype=jnp.int32))


def test_supported_gates():
    assert mega_supported(_state_problem())
    assert mega_supported(_state_problem(), reg_coeffs={"dwdt": 0.01})
    # all seven reference costs now run in-kernel
    assert mega_supported(
        _state_problem(), reg_coeffs={"bandpass": 0.1, "band": [0.1, 1.0]})
    assert not mega_supported(  # bandpass without its band parameter
        _state_problem(), reg_coeffs={"bandpass": 0.1})
    # forbidden-state penalties are in-kernel via the prefix-scan topology
    assert mega_supported(
        _state_problem(),
        reg_coeffs={"forbidden_coeff_list": [1.0],
                    "states_forbidden_list": [1]})
    assert mega_supported(
        _state_problem(),
        reg_coeffs={"speed_up": 1.0})
    assert not mega_supported(_state_problem(), gradient_mode="reference")


def _leakage_problem(steps=32, state_transfer=True):
    """3-level ladder with a forbidden leakage level (the reference's
    hallmark use case, regularization_functions.py:71-85)."""
    import qoc_tpu as q

    n = 3
    a = q.annihilate(n)
    H0 = np.diag([0.0, 1.0, 1.95]) * 2 * np.pi
    Hx = a + a.conj().T
    Hy = 1j * (a - a.conj().T)
    if state_transfer:
        psi0 = np.zeros(n, complex); psi0[0] = 1
        tgt = np.zeros(n, complex); tgt[1] = 1
        return ControlProblem.build(
            H0, [Hx, Hy], ["x", "y"], [tgt], 3.0, steps, [psi0],
            state_transfer=True, maxA=[0.5, 0.5], seed=0)
    return ControlProblem.build(
        H0, [Hx, Hy], ["x", "y"], q.transmon_gate(q.SIGMA_X, n),
        3.0, steps, [0, 1], maxA=[0.5, 0.5], seed=0)


@pytest.mark.parametrize("state_transfer", [True, False])
def test_forbidden_cost_in_kernel(state_transfer):
    """In-kernel forbidden-state penalty (prefix-scan topology) matches the
    XLA cost registry: value, gradient norm, and optimization trajectory."""
    problem = _leakage_problem(state_transfer=state_transfer)
    rc = {"forbidden_coeff_list": [5.0], "states_forbidden_list": [2],
          "amplitude": 0.1}
    conv = _conv()
    assert mega_supported(problem, reg_coeffs=rc)

    _, loss_fn = make_forward(problem, lean=True, engine="scan",
                              reg_coeffs=rc)
    opt = make_adam_optimizer(conv)
    run_seg, _ = make_segment_runner(loss_fn, conv, opt)
    ref = run_seg(init_adam_state(problem.u0_base, opt),
                  jnp.asarray(20, dtype=jnp.int32))

    init_state, run_segment, unpad = make_mega_segment_runner(
        problem, conv, reg_coeffs=rc)
    ms = run_segment(init_state(problem.u0_base), 20)
    np.testing.assert_allclose(
        np.asarray(unpad(ms.u_base)), np.asarray(ref.u_base), atol=5e-5)
    np.testing.assert_allclose(float(ms.reg_loss), float(ref.reg_loss),
                               atol=2e-5)
    np.testing.assert_allclose(float(ms.loss), float(ref.loss), atol=2e-5)
    np.testing.assert_allclose(float(ms.grad_squared),
                               float(ref.grad_squared), rtol=2e-3)


def test_forbidden_dressed_in_kernel():
    """forbid_dressed rotation folded into the static projection rows."""
    import qoc_tpu as q

    H0 = np.array([[0.0, 0.05, 0.0],
                   [0.05, 1.0, 0.05],
                   [0.0, 0.05, 2.2]], dtype=complex)
    w_c, v_c, dressed_id = q.get_dressed_info(H0)
    dinfo = {"eigenvectors": v_c, "eigenvalues": np.real(w_c),
             "dressed_id": dressed_id, "is_dressed": True}
    a = q.annihilate(3)
    problem = ControlProblem.build(
        H0, [a + a.conj().T, 1j * (a - a.conj().T)], ["x", "y"],
        q.transmon_gate(q.SIGMA_X, 3), 8.0, 48, [0, 1],
        dressed_info=dinfo, maxA=[2.0, 2.0], seed=0)
    rc = {"forbidden_coeff_list": [5.0], "states_forbidden_list": [2],
          "forbid_dressed": True}
    conv = _conv()
    ref = _run_xla_rc(problem, conv, 15, rc)
    init_state, run_segment, unpad = make_mega_segment_runner(
        problem, conv, reg_coeffs=rc)
    ms = run_segment(init_state(problem.u0_base), 15)
    np.testing.assert_allclose(
        np.asarray(unpad(ms.u_base)), np.asarray(ref.u_base), atol=5e-5)
    np.testing.assert_allclose(float(ms.reg_loss), float(ref.reg_loss),
                               atol=2e-5)


def _run_xla_rc(problem, conv, n, rc):
    _, loss_fn = make_forward(problem, lean=True, engine="scan",
                              reg_coeffs=rc)
    opt = make_adam_optimizer(conv)
    run_seg, _ = make_segment_runner(loss_fn, conv, opt)
    return run_seg(init_adam_state(problem.u0_base, opt),
                   jnp.asarray(n, dtype=jnp.int32))


def test_state_transfer_matches_xla_segment_runner():
    problem = _state_problem()
    conv = _conv()
    ref = _run_xla(problem, conv, 30)
    init_state, run_segment, unpad = make_mega_segment_runner(problem, conv)
    ms = run_segment(init_state(problem.u0_base), 30)
    assert int(ms.iteration) == int(ref.iteration) == 30
    np.testing.assert_allclose(
        np.asarray(unpad(ms.u_base)), np.asarray(ref.u_base), atol=3e-5)
    np.testing.assert_allclose(float(ms.loss), float(ref.loss), atol=1e-5)
    np.testing.assert_allclose(
        float(ms.grad_squared), float(ref.grad_squared), rtol=1e-3)
    np.testing.assert_allclose(
        float(ms.unitary_scale), float(ref.unitary_scale), atol=1e-4)


def test_unitary_mode_matches_xla_segment_runner():
    problem = _unitary_problem()
    assert problem.taylor_scaling == 2  # exercises the squaring branch
    conv = _conv()
    ref = _run_xla(problem, conv, 25)
    init_state, run_segment, unpad = make_mega_segment_runner(problem, conv)
    ms = run_segment(init_state(problem.u0_base), 25)
    np.testing.assert_allclose(
        np.asarray(unpad(ms.u_base)), np.asarray(ref.u_base), atol=3e-5)
    np.testing.assert_allclose(float(ms.loss), float(ref.loss), atol=1e-5)
    np.testing.assert_allclose(
        float(ms.unitary_scale), float(ref.unitary_scale), atol=1e-4)


def test_segments_compose():
    """3 segments of 10 == 1 segment of 30 (state carries across calls)."""
    problem = _state_problem()
    conv = _conv()
    init_state, run_segment, unpad = make_mega_segment_runner(problem, conv)
    a = run_segment(init_state(problem.u0_base), 30)
    b = init_state(problem.u0_base)
    for _ in range(3):
        b = run_segment(b, 10)
    np.testing.assert_allclose(
        np.asarray(a.u_base), np.asarray(b.u_base), atol=1e-6)
    assert int(b.iteration) == 30


def test_convergence_freezes_iterate():
    """Immediately-satisfied conv_target: metrics evaluated, no update."""
    problem = _state_problem()
    conv = _conv(conv_target=2.0)  # loss < 2 always true
    init_state, run_segment, unpad = make_mega_segment_runner(problem, conv)
    ms = run_segment(init_state(problem.u0_base), 10)
    assert bool(ms.done)
    assert int(ms.iteration) == 0
    np.testing.assert_array_equal(
        np.asarray(unpad(ms.u_base)), np.asarray(problem.u0_base))
    assert np.isfinite(float(ms.loss))


def test_max_iterations_predicate():
    problem = _state_problem()
    conv = _conv(max_iterations=7)
    init_state, run_segment, unpad = make_mega_segment_runner(problem, conv)
    ms = run_segment(init_state(problem.u0_base), 20)
    assert bool(ms.done)
    assert int(ms.iteration) == 7


def test_checkpoint_interop_roundtrip():
    """mega state -> optax pytree -> mega state is lossless, and the optax
    form continues identically under the XLA segment runner."""
    problem = _state_problem()
    conv = _conv()
    init_state, run_segment, unpad = make_mega_segment_runner(problem, conv)
    ms = run_segment(init_state(problem.u0_base), 15)
    u, opt_state = mega_state_to_optax(ms, conv, problem.steps)
    back = mega_state_from_optax(init_state(problem.u0_base), u, opt_state,
                                 int(ms.iteration))
    np.testing.assert_array_equal(np.asarray(back.u_base),
                                  np.asarray(ms.u_base))
    np.testing.assert_array_equal(np.asarray(back.m), np.asarray(ms.m))
    np.testing.assert_allclose(float(back.lr), float(ms.lr))

    # continue 15 more on each path; trajectories must stay glued
    _, loss_fn = make_forward(problem, lean=True, engine="scan")
    opt = make_adam_optimizer(conv)
    run_seg, _ = make_segment_runner(loss_fn, conv, opt)
    st = init_adam_state(u, opt)._replace(
        opt_state=opt_state, iteration=ms.iteration)
    st = run_seg(st, jnp.asarray(30, dtype=jnp.int32))
    ms2 = run_segment(ms, 15)
    np.testing.assert_allclose(
        np.asarray(unpad(ms2.u_base)), np.asarray(st.u_base), atol=3e-5)


def test_grape_engine_mega_end_to_end():
    """Grape(engine='mega') optimizes to the same loss as engine='scan'."""
    kwargs = dict(
        convergence={"rate": 0.05, "update_step": 20, "max_iterations": 60,
                     "conv_target": 1e-10},
        state_transfer=True, maxA=[0.7, 0.7], seed=0, save=False,
        show_plots=False,
    )
    r_mega = q.Grape(
        np.zeros((2, 2), dtype=complex), [q.SIGMA_X, q.SIGMA_Y], ["x", "y"],
        [np.array([0, 1], dtype=complex)], 2.0, 32,
        [np.array([1, 0], dtype=complex)], engine="mega", **kwargs)
    r_scan = q.Grape(
        np.zeros((2, 2), dtype=complex), [q.SIGMA_X, q.SIGMA_Y], ["x", "y"],
        [np.array([0, 1], dtype=complex)], 2.0, 32,
        [np.array([1, 0], dtype=complex)], engine="scan", **kwargs)
    assert r_mega.iterations == r_scan.iterations
    np.testing.assert_allclose(r_mega.loss, r_scan.loss, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(r_mega.uks), np.asarray(r_scan.uks), atol=1e-3)


@pytest.mark.parametrize("rc", [
    {"amplitude": 0.2},
    {"envelope": 0.3},
    {"dwdt": 0.005},
    {"d2wdt2": 1e-5},
    {"amplitude": 0.1, "dwdt": 0.003, "d2wdt2": 1e-6, "envelope": 0.05},
])
def test_pulse_penalties_in_kernel(rc):
    """amplitude/envelope/dwdt/d2wdt2 computed in-kernel match the XLA
    cost registry (value and optimization trajectory)."""
    problem = _state_problem()
    conv = _conv()
    assert mega_supported(problem, reg_coeffs=rc)

    _, loss_fn = make_forward(problem, lean=True, engine="scan",
                              reg_coeffs=rc)
    opt = make_adam_optimizer(conv)
    run_seg, _ = make_segment_runner(loss_fn, conv, opt)
    ref = run_seg(init_adam_state(problem.u0_base, opt),
                  jnp.asarray(20, dtype=jnp.int32))

    init_state, run_segment, unpad = make_mega_segment_runner(
        problem, conv, reg_coeffs=rc)
    ms = run_segment(init_state(problem.u0_base), 20)
    np.testing.assert_allclose(
        np.asarray(unpad(ms.u_base)), np.asarray(ref.u_base), atol=5e-5)
    np.testing.assert_allclose(float(ms.reg_loss), float(ref.reg_loss),
                               atol=1e-5)
    np.testing.assert_allclose(float(ms.loss), float(ref.loss), atol=1e-5)
    np.testing.assert_allclose(float(ms.grad_squared),
                               float(ref.grad_squared), rtol=1e-3)


@pytest.mark.parametrize("state_transfer", [True, False])
def test_speed_up_cost_in_kernel(state_transfer):
    """In-kernel speed_up (3D inner product over the prefix-scan
    trajectory) matches the XLA cost registry."""
    problem = _leakage_problem(state_transfer=state_transfer)
    rc = {"speed_up": 2.0, "amplitude": 0.05}
    conv = _conv()
    assert mega_supported(problem, reg_coeffs=rc)
    ref = _run_xla_rc(problem, conv, 20, rc)
    init_state, run_segment, unpad = make_mega_segment_runner(
        problem, conv, reg_coeffs=rc)
    ms = run_segment(init_state(problem.u0_base), 20)
    np.testing.assert_allclose(
        np.asarray(unpad(ms.u_base)), np.asarray(ref.u_base), atol=5e-5)
    np.testing.assert_allclose(float(ms.reg_loss), float(ref.reg_loss),
                               atol=2e-4)
    np.testing.assert_allclose(float(ms.loss), float(ref.loss), atol=2e-5)
    np.testing.assert_allclose(float(ms.grad_squared),
                               float(ref.grad_squared), rtol=2e-3)


@pytest.mark.parametrize("state_transfer", [True, False])
def test_bandpass_cost_in_kernel(state_transfer):
    """In-kernel bandpass (penalized-bin DFT matmuls) matches the XLA
    FFT-based cost."""
    problem = (_leakage_problem(steps=40, state_transfer=True)
               if state_transfer else _leakage_problem(steps=40,
                                                       state_transfer=False))
    rc = {"bandpass": 0.5, "band": [0.5, 2.0]}
    conv = _conv()
    assert mega_supported(problem, reg_coeffs=rc)
    ref = _run_xla_rc(problem, conv, 20, rc)
    init_state, run_segment, unpad = make_mega_segment_runner(
        problem, conv, reg_coeffs=rc)
    ms = run_segment(init_state(problem.u0_base), 20)
    np.testing.assert_allclose(
        np.asarray(unpad(ms.u_base)), np.asarray(ref.u_base), atol=1e-4)
    np.testing.assert_allclose(float(ms.reg_loss), float(ref.reg_loss),
                               atol=2e-4)
    np.testing.assert_allclose(float(ms.loss), float(ref.loss), atol=2e-5)


def test_all_seven_costs_in_kernel():
    """BASELINE config-4 shape: every reference cost active at once, fused
    path vs XLA registry."""
    problem = _leakage_problem(steps=40, state_transfer=False)
    rc = {"amplitude": 0.05, "envelope": 0.02, "dwdt": 0.001,
          "d2wdt2": 1e-7, "bandpass": 0.2, "band": [0.5, 2.0],
          "forbidden_coeff_list": [2.0], "states_forbidden_list": [2],
          "speed_up": 0.5}
    conv = _conv()
    assert mega_supported(problem, reg_coeffs=rc)
    ref = _run_xla_rc(problem, conv, 15, rc)
    init_state, run_segment, unpad = make_mega_segment_runner(
        problem, conv, reg_coeffs=rc)
    ms = run_segment(init_state(problem.u0_base), 15)
    np.testing.assert_allclose(
        np.asarray(unpad(ms.u_base)), np.asarray(ref.u_base), atol=1e-4)
    np.testing.assert_allclose(float(ms.reg_loss), float(ref.reg_loss),
                               atol=5e-4)
    np.testing.assert_allclose(float(ms.loss), float(ref.loss), atol=5e-5)


def test_pulse_penalties_power_of_two_steps():
    """steps = power of two forces the next tree size for the difference
    costs (the 2-zero padding needs lanes past T)."""
    problem = _state_problem(steps=16)  # Tp would be 16 == T
    rc = {"dwdt": 0.01}
    conv = _conv()
    _, loss_fn = make_forward(problem, lean=True, engine="scan",
                              reg_coeffs=rc)
    opt = make_adam_optimizer(conv)
    ref = make_segment_runner(loss_fn, conv, opt)[0](
        init_adam_state(problem.u0_base, opt),
        jnp.asarray(10, dtype=jnp.int32))
    init_state, run_segment, unpad = make_mega_segment_runner(
        problem, conv, reg_coeffs=rc)
    ms = run_segment(init_state(problem.u0_base), 10)
    np.testing.assert_allclose(
        np.asarray(unpad(ms.u_base)), np.asarray(ref.u_base), atol=5e-5)
    np.testing.assert_allclose(float(ms.reg_loss), float(ref.reg_loss),
                               atol=1e-5)
