"""Propagation engines: scan vs associative vs dense scipy oracle;
gradient modes: exact autodiff vs reference custom_vjp semantics."""

import numpy as np
import scipy.linalg as la
import jax
import jax.numpy as jnp
import pytest

from qoc_tpu.ops.expm import weighted_hamiltonians
from qoc_tpu.ops.isomorphism import c_to_r_mat, c_to_r_vec
from qoc_tpu.ops.propagation import (
    chain_associative,
    chain_scan,
    state_transfer_chain,
    step_propagators,
    step_propagators_ref_grad,
    evolve_unitary,
)


def setup_problem(rng, n=3, K=2, T=20, dt=0.05):
    H0 = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H0 = (H0 + H0.conj().T) / 2
    Hks = []
    for _ in range(K):
        Hk = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        Hks.append((Hk + Hk.conj().T) / 2)
    mats = np.stack(
        [c_to_r_mat(-1j * dt * H0)] + [c_to_r_mat(-1j * dt * H) for H in Hks]
    ).astype(np.float32)
    u = 0.5 * rng.standard_normal((K, T)).astype(np.float32)
    weights = np.concatenate([np.ones((1, T), np.float32), u], axis=0)
    return H0, Hks, mats, weights, u


def dense_oracle(H0, Hks, u, dt, psi0_c, U0_c):
    """Independent propagation with scipy.linalg.expm (float64, full expm)."""
    T = u.shape[1]
    U = U0_c.copy()
    vecs = [psi0_c.copy()]
    for t in range(T):
        H = H0 + sum(u[k, t] * Hks[k] for k in range(len(Hks)))
        P = la.expm(-1j * dt * H)
        U = P @ U
        vecs.append(U @ psi0_c)
    return U, np.stack(vecs)


def test_engines_agree(rng):
    H0, Hks, mats, weights, u = setup_problem(rng)
    n = 3
    U0 = jnp.asarray(c_to_r_mat(np.eye(n)).astype(np.float32))
    psi0_c = np.zeros((n, 2), dtype=complex)
    psi0_c[0, 0] = 1
    psi0_c[1, 1] = 1
    psi0 = jnp.asarray(
        np.stack([c_to_r_vec(psi0_c[:, i]) for i in range(2)], axis=1).astype(
            np.float32
        )
    )
    P = step_propagators(jnp.asarray(mats), jnp.asarray(weights), 12, 1)
    Ua, va = chain_associative(P, U0, psi0)
    Us, vs = chain_scan(P, U0, psi0)
    assert np.allclose(np.asarray(Ua), np.asarray(Us), atol=1e-5)
    assert np.allclose(np.asarray(va), np.asarray(vs), atol=1e-5)


def test_unitary_chain_vs_oracle(rng):
    H0, Hks, mats, weights, u = setup_problem(rng)
    n, dt = 3, 0.05
    U0_c = np.eye(n, dtype=complex)
    psi0_c = np.zeros(n, dtype=complex)
    psi0_c[0] = 1
    psi0 = jnp.asarray(c_to_r_vec(psi0_c).astype(np.float32)[:, None])
    U0 = jnp.asarray(c_to_r_mat(U0_c).astype(np.float32))
    final_U, inter_vecs = evolve_unitary(
        jnp.asarray(mats), jnp.asarray(weights), U0, psi0, 14, 2
    )
    U_ref, vecs_ref = dense_oracle(H0, Hks, u, dt, psi0_c, U0_c)
    assert np.allclose(np.asarray(final_U), c_to_r_mat(U_ref), atol=1e-4)
    got = np.asarray(inter_vecs)[:, :, 0]
    want = np.stack([c_to_r_vec(v) for v in vecs_ref])
    assert np.allclose(got, want, atol=1e-4)


def test_state_transfer_vs_oracle(rng):
    H0, Hks, mats, weights, u = setup_problem(rng, T=15)
    n, dt = 3, 0.05
    psi0_c = np.zeros(n, dtype=complex)
    psi0_c[0] = 1
    psi0 = jnp.asarray(c_to_r_vec(psi0_c).astype(np.float32)[:, None])
    vecs = state_transfer_chain(
        jnp.asarray(mats), jnp.asarray(weights), psi0, order=16
    )
    _, vecs_ref = dense_oracle(H0, Hks, u, dt, psi0_c, np.eye(n, dtype=complex))
    got = np.asarray(vecs)[:, :, 0]
    want = np.stack([c_to_r_vec(v) for v in vecs_ref])
    assert np.allclose(got, want, atol=1e-4)


def test_reference_grad_semantics(rng):
    """The custom_vjp coefficient gradient equals sum(G * (H_k @ P)) with a
    zero drift-row gradient (tensorflow_state.py:49-65)."""
    _, _, mats, weights, _ = setup_problem(rng, T=4)
    mats_j, w_j = jnp.asarray(mats), jnp.asarray(weights)
    order, scaling = 10, 1

    def f(w):
        P = step_propagators_ref_grad(mats_j, w, order, scaling)
        return jnp.sum(P ** 2)

    grad = np.asarray(jax.grad(f)(w_j))
    # manual: G = 2P; wbar[k,t] = sum(G[t] * (mats[k] @ P[t]))
    P = np.asarray(step_propagators(mats_j, w_j, order, scaling))
    G = 2 * P
    want = np.einsum("kij,tjm,tim->kt", mats, P, G)
    want[0, :] = 0.0
    assert np.allclose(grad, want, rtol=1e-4, atol=1e-4)


def test_exact_grad_matches_fd(rng):
    """Autodiff gradient vs central finite differences (float32 tolerance)."""
    _, _, mats, weights, _ = setup_problem(rng, n=2, K=1, T=6)
    mats_j = jnp.asarray(mats)

    def f(w):
        P = step_propagators(mats_j, w, 10, 1)
        return jnp.sum(jnp.sin(P))

    g = np.asarray(jax.grad(f)(jnp.asarray(weights)))
    eps = 1e-3
    for (k, t) in [(1, 0), (1, 3), (0, 2)]:
        wp = weights.copy(); wp[k, t] += eps
        wm = weights.copy(); wm[k, t] -= eps
        fd = (float(f(jnp.asarray(wp))) - float(f(jnp.asarray(wm)))) / (2 * eps)
        assert abs(g[k, t] - fd) < 5e-2 * max(1.0, abs(fd))


def test_adjoint_state_grad_is_exact_for_hermitian(rng):
    """For Hermitian H the reference's exp(-A) cotangent propagation equals
    the true transpose: reference-mode and exact-mode state gradients agree
    closely (SURVEY design note)."""
    _, _, mats, weights, _ = setup_problem(rng, T=8, dt=0.005)
    mats_j, w_j = jnp.asarray(mats), jnp.asarray(weights)
    psi0 = jnp.asarray(np.eye(6, 1, dtype=np.float32))
    target = jnp.asarray(rng.standard_normal((6, 1)).astype(np.float32))

    def loss(w, mode):
        vecs = state_transfer_chain(mats_j, w, psi0, order=14,
                                    gradient_mode=mode)
        return jnp.sum(vecs[-1] * target)

    g_exact = np.asarray(jax.grad(lambda w: loss(w, "exact"))(w_j))
    g_ref = np.asarray(jax.grad(lambda w: loss(w, "reference"))(w_j))
    # coefficient gradients: first-order approx -> loose tolerance;
    # both must agree in direction for small dt
    denom = np.linalg.norm(g_exact[1:]) * np.linalg.norm(g_ref[1:])
    cosine = float(np.sum(g_exact[1:] * g_ref[1:]) / denom)
    assert cosine > 0.99


def test_state_transfer_engines_agree(rng):
    """Associative (batched-propagator) and pscan (batched-propagator +
    serial state scan) chains == serial matvec chain."""
    _, _, mats, weights, _ = setup_problem(rng, T=12)
    psi0 = jnp.asarray(np.eye(6, 2, dtype=np.float32))
    a = state_transfer_chain(jnp.asarray(mats), jnp.asarray(weights), psi0,
                             order=10, engine="associative")
    p = state_transfer_chain(jnp.asarray(mats), jnp.asarray(weights), psi0,
                             order=10, engine="pscan")
    s = state_transfer_chain(jnp.asarray(mats), jnp.asarray(weights), psi0,
                             order=10, engine="scan")
    assert np.allclose(np.asarray(a), np.asarray(s), atol=1e-5)
    assert np.allclose(np.asarray(p), np.asarray(s), atol=1e-5)


def test_pscan_gradients_match_scan(rng):
    """pscan value AND gradient == serial scan (both exact autodiff),
    final_only and full-trajectory forms."""
    _, _, mats, weights, _ = setup_problem(rng, T=15)
    mats_j, w_j = jnp.asarray(mats), jnp.asarray(weights)
    psi0 = jnp.asarray(np.eye(6, 1, dtype=np.float32))
    tgt = jnp.asarray(rng.standard_normal((6, 1)).astype(np.float32))

    def loss(w, engine, final_only):
        vecs = state_transfer_chain(mats_j, w, psi0, order=10,
                                    engine=engine, final_only=final_only)
        # touch the whole trajectory so the trajectory cotangent is
        # exercised (speed_up/forbidden read every step)
        return jnp.sum(vecs[-1] * tgt) + 1e-3 * jnp.sum(jnp.square(vecs))

    for fo in (False, True):
        vs, gs = jax.value_and_grad(
            lambda w: loss(w, "scan", fo))(w_j), None
        vp = jax.value_and_grad(lambda w: loss(w, "pscan", fo))(w_j)
        np.testing.assert_allclose(float(vs[0]), float(vp[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(vs[1]), np.asarray(vp[1]),
                                   atol=1e-4)


def test_pscan_gradients_v2_and_mats(rng):
    """pscan adjoint VJP with V=2 stacked vectors, including the mats
    cotangent (exact matsbar = sum_t w_kt Abar_t) vs scan autodiff."""
    _, _, mats, weights, _ = setup_problem(rng, T=9)
    mats_j, w_j = jnp.asarray(mats), jnp.asarray(weights)
    psi0 = jnp.asarray(np.eye(6, 2, dtype=np.float32))
    tgt = jnp.asarray(rng.standard_normal((6, 2)).astype(np.float32))

    def loss(m, w, engine):
        vecs = state_transfer_chain(m, w, psi0, order=8, engine=engine)
        return jnp.sum(vecs[-1] * tgt) + 1e-2 * jnp.sum(jnp.square(vecs))

    gm_s, gw_s = jax.grad(lambda m, w: loss(m, w, "scan"),
                          argnums=(0, 1))(mats_j, w_j)
    gm_p, gw_p = jax.grad(lambda m, w: loss(m, w, "pscan"),
                          argnums=(0, 1))(mats_j, w_j)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gm_p), np.asarray(gm_s), atol=1e-4)


def test_unitary_pscan_forward_matches(rng):
    """Unitary-mode pscan (rank-V adjoint chain + ones-column
    unitary_scale + stop-grad product tree) == the associative/scan
    unitary forward: loss, unitary_scale, final_state, inter_vecs, and
    the u_base gradient — including a REAL squaring branch (scaling=2)
    and a non-identity U0."""
    import qoc_tpu as q
    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.models.system import ControlProblem

    a = q.annihilate(3)
    U0 = np.asarray(
        np.cos(0.3) * np.eye(3)
        - 1j * np.sin(0.3) * (a + a.conj().T) / np.sqrt(2), dtype=complex)
    # make U0 exactly unitary via QR
    U0, _ = np.linalg.qr(U0)
    problem = ControlProblem.build(
        np.diag([0.0, 1.0, 1.95]) * 2 * np.pi,
        [a + a.conj().T, 1j * (a - a.conj().T)], ["x", "y"],
        q.transmon_gate(q.SIGMA_X, 3), 3.0, 14, [0, 1], U0=U0,
        maxA=[0.6, 0.6], seed=0, Taylor_terms=[8, 2],
    )
    assert problem.taylor_scaling == 2
    rc = {"forbidden_coeff_list": [2.0], "states_forbidden_list": [2]}
    f_ref, l_ref = make_forward(problem, reg_coeffs=rc, engine="scan")
    f_ps, l_ps = make_forward(problem, reg_coeffs=rc, engine="pscan")
    u = jnp.asarray(problem.u0_base)
    o_ref, o_ps = f_ref(u), f_ps(u)
    np.testing.assert_allclose(float(o_ps.loss), float(o_ref.loss),
                               atol=1e-5)
    np.testing.assert_allclose(float(o_ps.unitary_scale),
                               float(o_ref.unitary_scale), atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_ps.final_state),
                               np.asarray(o_ref.final_state), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_ps.inter_vecs),
                               np.asarray(o_ref.inter_vecs), atol=1e-5)
    g_ref = jax.grad(lambda x: l_ref(x)[0])(u)
    g_ps = jax.grad(lambda x: l_ps(x)[0])(u)
    np.testing.assert_allclose(np.asarray(g_ps), np.asarray(g_ref),
                               atol=2e-5)


def test_unitary_pscan_lean_no_inter(rng):
    """Lean unitary pscan (no trajectory costs): loss and gradient match
    the tree/associative lean path."""
    import qoc_tpu as q
    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.models.system import ControlProblem

    a = q.annihilate(3)
    problem = ControlProblem.build(
        np.diag([0.0, 1.0, 1.95]) * 2 * np.pi,
        [a + a.conj().T, 1j * (a - a.conj().T)], ["x", "y"],
        q.transmon_gate(q.SIGMA_X, 3), 3.0, 14, [0],
        maxA=[0.6, 0.6], seed=0, Taylor_terms=[8, 2],
    )
    _, l_ref = make_forward(problem, engine="scan", lean=True)
    _, l_ps = make_forward(problem, engine="pscan", lean=True)
    u = jnp.asarray(problem.u0_base)
    (v_ref, _), g_ref = jax.value_and_grad(l_ref, has_aux=True)(u)
    (v_ps, _), g_ps = jax.value_and_grad(l_ps, has_aux=True)(u)
    np.testing.assert_allclose(float(v_ps), float(v_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_ps), np.asarray(g_ref),
                               atol=2e-5)


def test_remat_chunked_matches(rng):
    """Chunked-remat final-only scan == plain scan, values and gradients."""
    _, _, mats, weights, _ = setup_problem(rng, T=23)
    mats_j, w_j = jnp.asarray(mats), jnp.asarray(weights)
    psi0 = jnp.asarray(np.eye(6, 1, dtype=np.float32))
    tgt = jnp.asarray(rng.standard_normal((6, 1)).astype(np.float32))

    def loss(w, remat):
        out = state_transfer_chain(mats_j, w, psi0, order=10, engine="scan",
                                   final_only=True, remat=remat)
        return jnp.sum(out[-1] * tgt)

    v0, g0 = jax.value_and_grad(lambda w: loss(w, False))(w_j), None
    v1 = jax.value_and_grad(lambda w: loss(w, True))(w_j)
    va, ga = v0
    vb, gb = v1
    assert np.allclose(float(va), float(vb), atol=1e-6)
    assert np.allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)


def test_complex_representation_matches_iso(rng):
    """Native-complex64 forward == iso forward: loss, reg, grads,
    inter_vecs (numerically identical math, alternate layout)."""
    import qoc_tpu as q
    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.models.system import ControlProblem

    def herm(n):
        A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        return (A + A.conj().T) / 10

    N = 5
    H0 = np.diag(np.arange(N)).astype(complex) * 0.3
    Hops = [herm(N), herm(N)]
    U = np.eye(N, dtype=complex)
    U[:2, :2] = [[0, 1], [1, 0]]
    p = ControlProblem.build(H0, Hops, ["a", "b"], U, 5.0, 40, [0, 1],
                             maxA=[1.0] * 2, seed=0)
    regs = {"amplitude": 0.1, "dwdt": 0.01}
    _, lf_iso = make_forward(p, reg_coeffs=regs, representation="iso",
                             lean=True, engine="scan")
    _, lf_cpx = make_forward(p, reg_coeffs=regs, representation="complex",
                             lean=True)
    u = jnp.asarray(p.u0_base)
    rl_i, oi = lf_iso(u)
    rl_c, oc = lf_cpx(u)
    assert np.isclose(float(oi.loss), float(oc.loss), atol=1e-6)
    assert np.isclose(float(rl_i), float(rl_c), atol=1e-6)
    assert np.isclose(float(oi.unitary_scale), float(oc.unitary_scale),
                      atol=1e-5)
    g_i = jax.grad(lambda u: lf_iso(u)[0])(u)
    g_c = jax.grad(lambda u: lf_cpx(u)[0])(u)
    assert np.allclose(np.asarray(g_i), np.asarray(g_c), atol=1e-6)

    # state transfer with an inter-vec cost exercises the boundary convert
    ps = ControlProblem.build(
        H0, Hops, ["a", "b"], [np.eye(N, dtype=complex)[:, 1]], 5.0, 30,
        [np.eye(N, dtype=complex)[:, 0]], state_transfer=True,
        maxA=[1.0] * 2, seed=0)
    regs2 = {"forbidden_coeff_list": [1.0], "states_forbidden_list": [3]}
    _, sf_iso = make_forward(ps, reg_coeffs=regs2, representation="iso",
                             lean=True, engine="scan")
    _, sf_cpx = make_forward(ps, reg_coeffs=regs2, representation="complex",
                             lean=True)
    rl_i, oi = sf_iso(jnp.asarray(ps.u0_base))
    rl_c, oc = sf_cpx(jnp.asarray(ps.u0_base))
    assert np.isclose(float(rl_i), float(rl_c), atol=1e-6)
    assert np.allclose(np.asarray(oi.inter_vecs), np.asarray(oc.inter_vecs),
                       atol=1e-5)


def test_complex_rejects_reference_gradients():
    import pytest as _pytest
    import qoc_tpu as q
    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.models.system import ControlProblem

    p = ControlProblem.build(
        np.zeros((2, 2), dtype=complex), [q.SIGMA_X], ["x"],
        np.eye(2, dtype=complex), 1.0, 4, [0], maxA=[1.0], seed=0)
    with _pytest.raises(ValueError, match="complex"):
        make_forward(p, gradient_mode="reference", representation="complex")
