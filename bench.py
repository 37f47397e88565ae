"""Benchmark: GRAPE iterations/sec/chip on the qubit pi pulse.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Measurements (BASELINE.md targets):
  * single-problem GRAPE iterations/sec — one fused fwd+bwd+Adam update per
    iteration, fixed-count fori_loop (no early exit), on device;
  * wall-clock to fidelity 1-1e-4 with the real convergence-checking loop;
  * batched multi-seed throughput (seeds x iterations / sec) — the pod-bound
    metric where the MXU batching actually bites;
  * transmon-cavity with bandpass + speed_up costs (BASELINE config 4).

``vs_baseline`` compares single-problem iterations/sec against the same
optimized loop on the host CPU — a *conservative* stand-in for the TF1 CPU
reference, which is Python-2.7-only and cannot run here, and which ran the
graph twice per iteration through a session boundary
(run_session.py:53-69).

Methodology (pinned in round 3): every metric is timed over ``REPEATS``
independent windows after a warm-up window; the JSON reports the MEDIAN as
the headline value and the relative spread (max-min)/median per metric
under "windows".  A load statement (competing processes + 1-min loadavg)
is recorded before timing — concurrent TPU clients serialize through the
axon tunnel and produce 5-50x swings that are NOT regressions.

Window sizes are chosen so the per-launch host->tunnel->device dispatch
(~46 ms measured, tools/scaling_evidence.py --dispatch; ~0.1-0.5 ms on a
locally attached chip) stays under ~10% of each window — the metric is
device throughput, not tunnel latency.  n_iters per launch is recorded
implicitly by the function defaults below.
"""

import json
import os
import statistics
import subprocess
import time

import numpy as np

REPEATS = 3


def _sync(x):
    """Force completion AND fetch a scalar derived from x.

    On the tunneled TPU runtime (axon PJRT plugin) ``block_until_ready`` can
    return before enqueued Pallas work drains — measured: a 400k-iteration
    kernel "completed" in 3.8ms by block_until_ready but took its true
    ~1.3s when the value was fetched.  Every timing here therefore ends
    with a device->host value fetch, which is unconditionally honest.
    """
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _measure(window, units: float):
    """Run ``window()`` (one timed measurement ending in a value fetch)
    REPEATS times; return (median_rate, spread, runs) in units/sec."""
    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        window()
        rates.append(units / (time.perf_counter() - t0))
    med = statistics.median(rates)
    spread = (max(rates) - min(rates)) / med if med else 0.0
    return med, spread, [round(r, 2) for r in rates]


def _load_statement():
    """1-min loadavg + count of OTHER busy python processes: the honesty
    check for cross-round comparability (concurrent clients serialize
    through the TPU tunnel; host load inflates the CPU baselines)."""
    la = os.getloadavg()[0]
    me = os.getpid()
    busy = 0
    try:
        out = subprocess.run(
            ["ps", "-eo", "pid,pcpu,comm"], capture_output=True, text=True,
            timeout=10).stdout
        for line in out.splitlines()[1:]:
            parts = line.split()
            if len(parts) >= 3 and "python" in parts[2]:
                if int(parts[0]) != me and float(parts[1]) > 20.0:
                    busy += 1
    except Exception:
        busy = -1
    return {"loadavg_1min": round(la, 2), "busy_python_procs": busy}


def _problem(steps=1000):
    import qoc_tpu as q
    from qoc_tpu.models.system import ControlProblem

    return ControlProblem.build(
        np.zeros((2, 2), dtype=complex), [q.SIGMA_X, q.SIGMA_Y], ["x", "y"],
        [np.array([0, 1], dtype=complex)], 10.0, steps,
        [np.array([1, 0], dtype=complex)],
        state_transfer=True, maxA=[0.7, 0.7], seed=0,
    )


def _conv(**over):
    from qoc_tpu.optim.convergence import ConvergenceSettings

    base = {"rate": 0.01, "update_step": 100, "max_iterations": 5000,
            "conv_target": 1e-4}
    base.update(over)
    return ConvergenceSettings.from_dict(base)


def iters_per_sec(device, engine, n_iters=3000):
    """Steady-state single-problem throughput via fixed-count fori_loop."""
    import jax
    import jax.numpy as jnp
    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.optim.adam import make_adam_optimizer, make_throughput_runner

    problem = _problem()
    conv = _conv()
    _, loss_fn = make_forward(problem, lean=True, engine=engine)
    optimizer = make_adam_optimizer(conv)
    run_n = make_throughput_runner(loss_fn, conv, optimizer)
    u = jax.device_put(jnp.asarray(problem.u0_base), device)
    opt_state = jax.device_put(optimizer.init(jnp.asarray(problem.u0_base)),
                               device)
    # compile + warm
    _sync(run_n(u, opt_state, n_iters)[0])
    return _measure(lambda: _sync(run_n(u, opt_state, n_iters)[0]), n_iters)


def iters_per_sec_mega(n_iters=30000):
    """Single-problem throughput through the fused multi-iteration kernel
    (ops/pallas_mega.py): the ENTIRE n-iteration Adam run is ONE Pallas
    program — zero per-iteration dispatch.  ~3.3us/iteration on TPU v5lite
    (vs ~17us for the per-iteration fused-tree path)."""
    from qoc_tpu.ops.pallas_mega import make_mega_segment_runner

    problem = _problem()
    conv = _conv()
    init_state, run_segment, _ = make_mega_segment_runner(
        problem, conv, throughput=True)
    ms = init_state(problem.u0_base)
    _sync(run_segment(ms, n_iters).u_base)   # compile + warm
    return _measure(lambda: _sync(run_segment(ms, n_iters).u_base), n_iters)


def batched_iters_per_sec_mega(n_seeds=1024, n_iters=400):
    """Aggregate (seeds x iterations)/sec through the fused batched
    OPTIMIZER kernel (parallel/pallas_mega_batch.py): every seed's whole
    Adam segment runs in one kernel launch."""
    import jax
    from qoc_tpu.parallel.batch import init_seeds
    from qoc_tpu.parallel.pallas_mega_batch import make_mega_batched_runner

    import numpy as _np

    problem = _problem()
    conv = _conv()
    init_state, run_n, _ = make_mega_batched_runner(
        problem, conv, throughput=True)
    u0 = _np.asarray(init_seeds(problem, n_seeds, jax.random.PRNGKey(0)))
    st = init_state(u0)
    st = run_n(st, n_iters)
    _np.asarray(st.losses)      # compile + drain
    return _measure(lambda: _np.asarray(run_n(st, n_iters).losses),
                    n_seeds * n_iters)


def _leakage_problem(steps=100, levels=5):
    """Flagship config (BASELINE.json config 3 / __graft_entry__): transmon
    qudit X gate with forbidden leakage levels."""
    import qoc_tpu as q
    from qoc_tpu.models.system import ControlProblem

    a = q.annihilate(levels)
    H0 = 2 * np.pi * (-0.2) / 2 * (a.conj().T @ a.conj().T @ a @ a)
    return ControlProblem.build(
        H0, [a + a.conj().T, 1j * (a - a.conj().T)], ["x", "y"],
        q.transmon_gate(q.SIGMA_X, levels), 6.0, steps, [0, 1],
        maxA=[2.0, 2.0], seed=0,
    )


_LEAKAGE_RC = {"forbidden_coeff_list": [10.0, 10.0, 10.0],
               "states_forbidden_list": [2, 3, 4], "dwdt": 0.001}


def leakage_iters_per_sec(device, n_iters=3000, fused=True):
    """Flagship transmon-leakage throughput.  ``fused=True`` takes the
    prefix-scan mega kernel (forbidden-state penalties in-kernel — the
    round-1 gap: inter-vec costs used to fall back to the generic XLA
    path); ``fused=False`` measures that generic XLA path for comparison."""
    import jax
    import jax.numpy as jnp

    problem = _leakage_problem()
    conv = _conv()
    if fused:
        from qoc_tpu.ops.pallas_mega import (
            make_mega_segment_runner, mega_supported)

        assert mega_supported(problem, _LEAKAGE_RC)
        init_state, run_segment, _ = make_mega_segment_runner(
            problem, conv, throughput=True, reg_coeffs=_LEAKAGE_RC)
        ms = init_state(problem.u0_base)
        _sync(run_segment(ms, n_iters).u_base)   # compile + warm
        return _measure(lambda: _sync(run_segment(ms, n_iters).u_base),
                        n_iters)

    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.optim.adam import make_adam_optimizer, make_throughput_runner

    _, loss_fn = make_forward(problem, lean=True, engine="scan",
                              reg_coeffs=_LEAKAGE_RC)
    optimizer = make_adam_optimizer(conv)
    run_n = make_throughput_runner(loss_fn, conv, optimizer)
    u = jax.device_put(jnp.asarray(problem.u0_base), device)
    os0 = jax.device_put(optimizer.init(jnp.asarray(problem.u0_base)),
                         device)
    _sync(run_n(u, os0, n_iters)[0])
    return _measure(lambda: _sync(run_n(u, os0, n_iters)[0]), n_iters)


def cavity_costs_iters_per_sec(device, n_iters=200, engine="auto"):
    """BASELINE config 4: transmon x cavity (Hilbert dim 24) state transfer
    in the dressed basis with dwdt + bandpass + speed_up costs — the
    trajectory-reading config.  engine='auto' routes the pscan engine
    since round 5 (batched Taylor propagators + matvec-adjoint VJP,
    ops/propagation.py::pscan_chain): 108 -> 509 it/s on this window."""
    import jax
    import jax.numpy as jnp
    import qoc_tpu as q
    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.models.system import ControlProblem
    from qoc_tpu.optim.adam import make_adam_optimizer, make_throughput_runner

    ql, cl = 3, 8
    aq = q.annihilate(ql)
    ac = q.annihilate(cl)
    Iq, Ic = np.eye(ql), np.eye(cl)
    nq = np.kron(aq.conj().T @ aq, Ic)
    nc = np.kron(Iq, ac.conj().T @ ac)
    kerr = np.kron(aq.conj().T @ aq.conj().T @ aq @ aq, Ic)
    coupling = np.kron(aq, Ic) @ np.kron(Iq, ac).conj().T
    coupling = coupling + coupling.conj().T
    H0 = (2 * np.pi * 3.9 * nq + 2 * np.pi * 4.5 * nc
          - 2 * np.pi * 0.1 * kerr + 2 * np.pi * 0.1 * coupling)
    Hops = [np.kron(aq + aq.conj().T, Ic),
            np.kron(1j * (aq - aq.conj().T), Ic)]
    w_c, v_c, dressed_id = q.get_dressed_info(H0)
    psi0 = v_c[:, q.get_state_index(0, dressed_id)]
    tgt = v_c[:, q.get_state_index(1, dressed_id)]
    problem = ControlProblem.build(
        H0, Hops, ["qx", "qy"], [tgt], 20.0, 800, [psi0],
        state_transfer=True,
        dressed_info={"eigenvectors": v_c, "eigenvalues": np.real(w_c),
                      "dressed_id": dressed_id, "is_dressed": True},
        maxA=[2 * np.pi * 0.3] * 2, seed=0,
    )
    rc = {"dwdt": 0.0001, "bandpass": 0.1, "band": [0.1, 10.0],
          "speed_up": 0.001}
    conv = _conv()
    _, loss_fn = make_forward(problem, lean=True, engine=engine,
                              reg_coeffs=rc)
    optimizer = make_adam_optimizer(conv)
    run_n = make_throughput_runner(loss_fn, conv, optimizer)
    u = jax.device_put(jnp.asarray(problem.u0_base), device)
    os0 = jax.device_put(optimizer.init(jnp.asarray(problem.u0_base)),
                         device)
    _sync(run_n(u, os0, n_iters)[0])
    return _measure(lambda: _sync(run_n(u, os0, n_iters)[0]), n_iters)


def cavity_dim60_iters_per_sec(device, n_iters=150, engine="auto"):
    """BASELINE config 4 AT SPEC (dim 60 >= 50): the examples/jobs/
    transmon_cavity.json system — 3-level transmon x 20-level cavity in
    the qubit rotating frame, dressed basis, qubit+cavity drives, dwdt +
    bandpass + speed_up costs, 1000 steps."""
    import sys

    import jax
    import jax.numpy as jnp
    import qoc_tpu as q
    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.models.system import ControlProblem
    from qoc_tpu.optim.adam import make_adam_optimizer, make_throughput_runner

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "examples", "jobs"))
    from make_transmon_cavity import MAXA, STEPS, TOTAL_TIME, build_system

    H0, Hops, Hnames = build_system()
    w_c, v_c, dressed_id = q.get_dressed_info(H0)
    psi0 = v_c[:, q.get_state_index(0, dressed_id)]
    tgt = v_c[:, q.get_state_index(1, dressed_id)]
    problem = ControlProblem.build(
        H0, Hops, Hnames, [tgt], TOTAL_TIME, STEPS, [psi0],
        state_transfer=True,
        dressed_info={"eigenvectors": v_c, "eigenvalues": np.real(w_c),
                      "dressed_id": dressed_id, "is_dressed": True},
        maxA=[MAXA] * 4, seed=0,
    )
    rc = {"dwdt": 0.0001, "bandpass": 0.1, "band": [0.1, 10.0],
          "speed_up": 0.0001}
    conv = _conv()
    _, loss_fn = make_forward(problem, lean=True, engine=engine,
                              reg_coeffs=rc)
    optimizer = make_adam_optimizer(conv)
    run_n = make_throughput_runner(loss_fn, conv, optimizer)
    u = jax.device_put(jnp.asarray(problem.u0_base), device)
    os0 = jax.device_put(optimizer.init(jnp.asarray(problem.u0_base)),
                         device)
    _sync(run_n(u, os0, 3)[0])
    return _measure(lambda: _sync(run_n(u, os0, n_iters)[0]), n_iters)


def cnot_reg_batched_seediters(n_seeds=128, n_iters=60):
    """Batched CNOT-class sweep (BASELINE config 2) WITH config 2's own
    smoothness + envelope reg_coeffs on the fused batched kernel — the
    round-4 capability (pulse costs in-kernel; previously this fell off
    the fused path to the vmapped generic backend)."""
    import jax
    from qoc_tpu.models.system import ControlProblem
    from qoc_tpu.parallel.batch import init_seeds
    from qoc_tpu.parallel.pallas_mega_batch import (
        batched_mega_supported, make_mega_batched_runner)

    import qoc_tpu as q

    CNOT = np.eye(4, dtype=complex)
    CNOT[2:, 2:] = [[0, 1], [1, 0]]
    XI = np.kron(q.SIGMA_X, np.eye(2))
    IX = np.kron(np.eye(2), q.SIGMA_X)
    ZZ = np.kron(q.SIGMA_Z, q.SIGMA_Z)
    problem = ControlProblem.build(
        np.zeros((4, 4), dtype=complex), [XI, IX, ZZ], ["xi", "ix", "zz"],
        CNOT, 10.0, 1000, [0, 1, 2, 3], maxA=[1.0] * 3, seed=0,
        Taylor_terms=[8, 2],
    )
    rc = {"dwdt": 0.01, "envelope": 0.1}
    assert batched_mega_supported(problem, rc)
    conv = _conv()
    init_state, run_n, _ = make_mega_batched_runner(
        problem, conv, throughput=True, reg_coeffs=rc)
    u0 = np.asarray(init_seeds(problem, n_seeds, jax.random.PRNGKey(0)))
    st = run_n(init_state(u0), n_iters)
    np.asarray(st.losses)      # compile + drain
    return _measure(lambda: np.asarray(run_n(st, n_iters).losses),
                    n_seeds * n_iters)


def dim200_grid_4096_seediters(n_seeds=4096, n_iters=20, chunk=2048):
    """BASELINE config 5 AT SPEC: 4096 parallel seeds x detuning grid on
    the dim-200 multimode cavity through the column-batched xla-cols path
    (a cavity-frequency detuning as a constant extra channel per seed).
    The seed axis runs as per-launch chunks of ``chunk`` columns: one
    4096-column launch exhausts the v5lite worker (measured), and a pod
    shards the same seeds to <= 512 columns/device anyway — the timed
    quantity covers ALL chunks, so the metric is true aggregate
    seed-iters/s for the full 4096-seed workload."""
    import jax
    import jax.numpy as jnp
    import optax
    from qoc_tpu.models.system import ControlProblem
    from qoc_tpu.ops.isomorphism import c_to_r_mat
    from qoc_tpu.optim.adam import make_adam_optimizer
    from qoc_tpu.parallel.batch import init_seeds
    from qoc_tpu.parallel.xla_batch import make_xla_batched_loss

    Nc = 100
    a = np.kron(np.eye(2), np.diag(np.sqrt(np.arange(1, Nc)), 1))
    sm = np.kron(np.array([[0, 1], [0, 0]]), np.eye(Nc))
    H0 = (2 * np.pi * 0.1 * (a.conj().T @ a)
          + 2 * np.pi * 0.05 * (a.conj().T @ sm + a @ sm.conj().T))
    Hops = [sm + sm.conj().T, 1j * (sm - sm.conj().T), a + a.conj().T]
    psi0 = np.zeros(2 * Nc, complex)
    psi0[0] = 1
    tgt = np.zeros(2 * Nc, complex)
    tgt[Nc] = 1
    problem = ControlProblem.build(
        H0, Hops, ["x", "y", "c"], [tgt], 4.0, 200, [psi0],
        state_transfer=True, maxA=[2 * np.pi * 0.3] * 3, seed=0,
    )
    extra = np.stack([c_to_r_mat(
        -1j * problem.dt * np.asarray(a.conj().T @ a))]).astype(np.float32)
    deltas = np.linspace(-0.1, 0.1, n_seeds)[:, None].astype(np.float32)
    conv = _conv()
    batched_loss = make_xla_batched_loss(problem, extra_channel_mats=extra)
    opt = make_adam_optimizer(conv)
    grad_all = jax.grad(lambda u, ew: jnp.sum(batched_loss(u, ew)[0]))

    @jax.jit
    def run_n(u, os_, ew, n):
        def body(_, c):
            u, os_ = c
            g = grad_all(u, ew)
            upd, os_ = jax.vmap(opt.update)(g, os_, u)
            return (jax.vmap(optax.apply_updates)(u, upd), os_)

        return jax.lax.fori_loop(0, n, body, (u, os_))

    chunks = []
    for c0 in range(0, n_seeds, chunk):
        c1 = min(c0 + chunk, n_seeds)
        u = jnp.asarray(init_seeds(problem, c1 - c0,
                                   jax.random.PRNGKey(c0 // chunk)))
        chunks.append((u, jax.vmap(opt.init)(u), jnp.asarray(deltas[c0:c1])))
    _sync(run_n(chunks[0][0], chunks[0][1], chunks[0][2], 2)[0])

    def all_chunks():
        s = 0.0
        for u, os0, ew in chunks:
            s += _sync(run_n(u, os0, ew, n_iters)[0])
        return s

    return _measure(all_chunks, n_seeds * n_iters)


def dim200_single_iters_per_sec(device, n_iters=60):
    """Single-problem dim-200 time-optimal state transfer (speed_up +
    dwdt costs) — the large-M single-problem regime the r4 VERDICT
    called out.  engine='auto' routes the pscan matvec-adjoint chain
    (M=400, T=200)."""
    import jax
    import jax.numpy as jnp
    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.models.system import ControlProblem
    from qoc_tpu.optim.adam import make_adam_optimizer, make_throughput_runner

    Nc = 100
    a = np.kron(np.eye(2), np.diag(np.sqrt(np.arange(1, Nc)), 1))
    sm = np.kron(np.array([[0, 1], [0, 0]]), np.eye(Nc))
    H0 = (2 * np.pi * 0.1 * (a.conj().T @ a)
          + 2 * np.pi * 0.05 * (a.conj().T @ sm + a @ sm.conj().T))
    Hops = [sm + sm.conj().T, 1j * (sm - sm.conj().T), a + a.conj().T]
    psi0 = np.zeros(2 * Nc, complex)
    psi0[0] = 1
    tgt = np.zeros(2 * Nc, complex)
    tgt[Nc] = 1
    problem = ControlProblem.build(
        H0, Hops, ["x", "y", "c"], [tgt], 4.0, 200, [psi0],
        state_transfer=True, maxA=[2 * np.pi * 0.3] * 3, seed=0,
    )
    rc = {"speed_up": 0.001, "dwdt": 0.0001}
    conv = _conv()
    _, loss_fn = make_forward(problem, lean=True, engine="auto",
                              reg_coeffs=rc)
    optimizer = make_adam_optimizer(conv)
    run_n = make_throughput_runner(loss_fn, conv, optimizer)
    u = jax.device_put(jnp.asarray(problem.u0_base), device)
    os0 = jax.device_put(optimizer.init(jnp.asarray(problem.u0_base)),
                         device)
    _sync(run_n(u, os0, 3)[0])
    return _measure(lambda: _sync(run_n(u, os0, n_iters)[0]), n_iters)


def batched_iters_per_sec(device, n_seeds=1024, n_iters=100):
    """Aggregate (seeds x iterations)/sec through the fused Pallas batch
    kernel (parallel/pallas_batch.py): all seeds packed on the lane axis."""
    import jax
    import jax.numpy as jnp
    import optax
    from qoc_tpu.optim.adam import make_adam_optimizer
    from qoc_tpu.parallel.batch import init_seeds
    from qoc_tpu.parallel.pallas_batch import make_pallas_batched_loss

    problem = _problem()
    conv = _conv()
    batched_loss = make_pallas_batched_loss(problem)
    optimizer = make_adam_optimizer(conv)
    grad_all = jax.grad(lambda u: jnp.sum(batched_loss(u)[0]))
    vupd = jax.vmap(
        lambda g, os_, u: optimizer.update(g, os_, u), in_axes=(0, 0, 0)
    )

    @jax.jit
    def run_n(u, os_, n):
        def body(_, carry):
            u, os_ = carry
            g = grad_all(u)
            upd, os_ = vupd(g, os_, u)
            return (jax.vmap(optax.apply_updates)(u, upd), os_)

        return jax.lax.fori_loop(0, n, body, (u, os_))

    u = init_seeds(problem, n_seeds, jax.random.PRNGKey(0))
    u = jax.device_put(u, device)
    os0 = jax.device_put(jax.vmap(optimizer.init)(u), device)
    _sync(run_n(u, os0, 5)[0])
    return _measure(lambda: _sync(run_n(u, os0, n_iters)[0]),
                    n_seeds * n_iters)


def dim64_iters_per_sec(device, n_iters=240):
    """Unitary-mode GRAPE at Hilbert dim 64 (transmon-cavity scale,
    BASELINE config 4) — the regime where per-step matmuls are real MXU
    work.  [200 steps, 4 controls, Taylor order 8, 2 squarings]."""
    import jax
    import jax.numpy as jnp
    import qoc_tpu as q
    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.models.system import ControlProblem
    from qoc_tpu.optim.adam import make_adam_optimizer, make_throughput_runner

    N = 64
    rng = np.random.default_rng(0)

    def herm(n):
        A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        return (A + A.conj().T) / 20

    H0 = np.diag(np.arange(N)).astype(complex) * 0.1
    Hops = [herm(N) for _ in range(4)]
    U = np.eye(N, dtype=complex)
    U[:2, :2] = [[0, 1], [1, 0]]
    problem = ControlProblem.build(
        H0, Hops, ["a", "b", "c", "d"], U, 10.0, 200, [0, 1, 2, 3],
        maxA=[1.0] * 4, seed=0, Taylor_terms=[8, 2],
    )
    conv = _conv()
    _, loss_fn = make_forward(problem, lean=True, engine="auto")
    optimizer = make_adam_optimizer(conv)
    run_n = make_throughput_runner(loss_fn, conv, optimizer)
    u = jax.device_put(jnp.asarray(problem.u0_base), device)
    os0 = jax.device_put(optimizer.init(jnp.asarray(problem.u0_base)), device)
    _sync(run_n(u, os0, 3)[0])
    return _measure(lambda: _sync(run_n(u, os0, n_iters)[0]), n_iters)


def dim200_sweep_iters_per_sec(n_seeds=64, n_iters=50, reg_coeffs=None):
    """BASELINE config 5 scale: qubit x 100-level cavity (Hilbert dim 200),
    200 steps, seed batch through the column-batched XLA chain
    (parallel/xla_batch.py) — the large-dim MXU regime.  ``reg_coeffs``
    rides the same path (round 5: ALL seven costs incl. the in-carry
    speed_up are column-batched — no vmapped fallback)."""
    import jax
    import jax.numpy as jnp
    import optax
    from qoc_tpu.models.system import ControlProblem
    from qoc_tpu.optim.adam import make_adam_optimizer
    from qoc_tpu.parallel.xla_batch import make_xla_batched_loss

    Nc = 100
    a = np.kron(np.eye(2), np.diag(np.sqrt(np.arange(1, Nc)), 1))
    sm = np.kron(np.array([[0, 1], [0, 0]]), np.eye(Nc))
    H0 = (2 * np.pi * 0.1 * (a.conj().T @ a)
          + 2 * np.pi * 0.05 * (a.conj().T @ sm + a @ sm.conj().T))
    Hops = [sm + sm.conj().T, 1j * (sm - sm.conj().T), a + a.conj().T]
    psi0 = np.zeros(2 * Nc, complex)
    psi0[0] = 1
    tgt = np.zeros(2 * Nc, complex)
    tgt[Nc] = 1
    problem = ControlProblem.build(
        H0, Hops, ["x", "y", "c"], [tgt], 4.0, 200, [psi0],
        state_transfer=True, maxA=[2 * np.pi * 0.3] * 3, seed=0,
    )
    conv = _conv()
    batched_loss = make_xla_batched_loss(problem, reg_coeffs)
    opt = make_adam_optimizer(conv)
    grad_all = jax.grad(lambda u: jnp.sum(batched_loss(u)[0]))

    @jax.jit
    def run_n(u, os_, n):
        def body(_, c):
            u, os_ = c
            g = grad_all(u)
            upd, os_ = jax.vmap(opt.update)(g, os_, u)
            return (jax.vmap(optax.apply_updates)(u, upd), os_)

        return jax.lax.fori_loop(0, n, body, (u, os_))

    u = (jax.random.normal(jax.random.PRNGKey(0),
                           (n_seeds, 3, 200), dtype=jnp.float32)
         / np.sqrt(200))
    os0 = jax.vmap(opt.init)(u)
    _sync(run_n(u, os0, 2)[0])
    return _measure(lambda: _sync(run_n(u, os0, n_iters)[0]),
                    n_seeds * n_iters)


def wall_clock_to_fidelity(device, engine, target=1e-4):
    """Wall-clock (excluding compile) to reach loss < target with the real
    convergence-checking segment loop (engine='mega' = the fused-kernel
    path Grape takes by default on accelerators)."""
    import jax
    import jax.numpy as jnp

    problem = _problem()
    conv = _conv(conv_target=target)

    if engine == "mega":
        from qoc_tpu.ops.pallas_mega import make_mega_segment_runner

        init_state, run_segment, _ = make_mega_segment_runner(problem, conv)
        state = init_state(problem.u0_base)
        _sync(run_segment(state, 1).u_base)   # compile (n=1 & n=update_step)
        _sync(run_segment(state, conv.update_step).u_base)

        def once():
            st = init_state(problem.u0_base)
            while True:
                st = run_segment(st, conv.update_step)
                if bool(st.done):
                    break
            _sync(st.u_base)
            return st

        walls, state = [], None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            state = once()
            walls.append(time.perf_counter() - t0)
        wall = statistics.median(walls)
        spread = (max(walls) - min(walls)) / wall if wall else 0.0

        # --- decomposition (round-5: the headline swung 0.051 -> 0.096 s
        # between rounds at identical kernel throughput — the difference
        # is host<->tunnel round trips, so report them separately) ---
        # pure fetch round-trip on an already-materialized device array
        rts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(state.u_base)
            rts.append(time.perf_counter() - t0)
        rt = statistics.median(rts)
        # device time: ONE launch running exactly iterations_to_target
        # iterations (same kernel, single dispatch), minus one round trip
        n_hit = int(state.iteration)
        st1 = init_state(problem.u0_base)
        _sync(run_segment(st1, n_hit).u_base)    # compile n=n_hit
        devs = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            _sync(run_segment(init_state(problem.u0_base), n_hit).u_base)
            devs.append(time.perf_counter() - t0)
        device_s = max(statistics.median(devs) - rt, 0.0)
        decomp = {
            "wall_clock_device_s": round(device_s, 4),
            "wall_clock_dispatch_s": round(max(wall - device_s, 0.0), 4),
            "dispatch_roundtrip_s": round(rt, 4),
        }
        return (wall, spread, float(state.loss), int(state.iteration),
                decomp)

    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.optim.adam import (
        init_adam_state, make_adam_optimizer, make_segment_runner,
    )

    _, loss_fn = make_forward(problem, lean=True, engine=engine)
    optimizer = make_adam_optimizer(conv)
    run_segment, _ = make_segment_runner(loss_fn, conv, optimizer)
    state0 = init_adam_state(
        jax.device_put(jnp.asarray(problem.u0_base), device), optimizer
    )
    warm = run_segment(state0, jnp.asarray(1, dtype=jnp.int32))
    _sync(warm.u_base)
    warm = run_segment(state0, jnp.asarray(conv.update_step, dtype=jnp.int32))
    _sync(warm.u_base)

    def once():
        st = state0
        while True:
            stop = jnp.asarray(int(st.iteration) + conv.update_step,
                               dtype=jnp.int32)
            st = run_segment(st, stop)
            if bool(st.done):
                break
        _sync(st.u_base)
        return st

    walls, state = [], None
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state = once()
        walls.append(time.perf_counter() - t0)
    wall = statistics.median(walls)
    spread = (max(walls) - min(walls)) / wall if wall else 0.0
    return wall, spread, float(state.loss), int(state.iteration), None


def main():
    import jax

    primary = jax.devices()[0]
    is_tpu = primary.platform != "cpu"
    load = _load_statement()

    windows = {}

    def rec(name, triple):
        med, spread, runs = triple
        windows[name] = {"median": round(med, 2), "spread": round(spread, 3),
                         "runs": runs}
        return med

    if is_tpu:
        ips = rec("pi_pulse_mega", iters_per_sec_mega())
        xla_ips = rec("pi_pulse_xla_tree", iters_per_sec(primary, "auto"))
        wall, wall_spread, loss, iters, wall_decomp = wall_clock_to_fidelity(
            primary, "mega")
    else:
        ips = rec("pi_pulse_scan", iters_per_sec(primary, "scan"))
        xla_ips = ips
        wall, wall_spread, loss, iters, wall_decomp = wall_clock_to_fidelity(
            primary, "scan")
    bips = rec("batched_1024seed",
               batched_iters_per_sec_mega() if is_tpu
               else batched_iters_per_sec(primary))

    d64 = rec("dim64_unitary", dim64_iters_per_sec(primary))
    # S >= 128 fills the 128-lane MXU output tiles and is the HEADLINE
    # dim-200 configuration (PERF.md seed scaling; VERDICT r3 weak #4);
    # the 64-seed window is kept for cross-round comparability (its
    # columns are internally zero-padded to 128 lanes since round 4)
    d200_128 = (rec("dim200_cavity_128seed",
                    dim200_sweep_iters_per_sec(n_seeds=128))
                if is_tpu else 0.0)
    d200 = (rec("dim200_cavity_64seed", dim200_sweep_iters_per_sec())
            if is_tpu else 0.0)
    # round 5: the time-optimal (speed_up) cost now runs IN the column
    # path (in-carry target overlap) — previously it fell back to the
    # vmapped generic backend, 4.6x slower (VERDICT r4 missing #2)
    d200_su = (rec("dim200_speedup_64seed", dim200_sweep_iters_per_sec(
        reg_coeffs={"speed_up": 0.001})) if is_tpu else 0.0)
    d200_1 = (rec("dim200_single", dim200_single_iters_per_sec(primary))
              if is_tpu else 0.0)
    cav = rec("cavity_costs_dim24", cavity_costs_iters_per_sec(primary))
    cav60 = (rec("cavity_costs_dim60", cavity_dim60_iters_per_sec(primary))
             if is_tpu else 0.0)
    cnot_reg = (rec("cnot_reg_batched_128seed", cnot_reg_batched_seediters())
                if is_tpu else 0.0)
    grid4096 = (rec("dim200_4096seed_grid", dim200_grid_4096_seediters())
                if is_tpu else 0.0)
    if is_tpu:
        leak = rec("leakage_fused", leakage_iters_per_sec(primary,
                                                          fused=True))
        leak_xla = rec("leakage_xla", leakage_iters_per_sec(
            primary, n_iters=300, fused=False))
    else:
        leak = rec("leakage_xla", leakage_iters_per_sec(
            primary, n_iters=300, fused=False))
        leak_xla = leak
    if is_tpu:
        cpu = jax.devices("cpu")[0]
        cpu_ips = rec("cpu_baseline_pi_pulse",
                      iters_per_sec(cpu, "scan", n_iters=3000))
        vs_baseline = ips / cpu_ips
        cpu_d64 = rec("cpu_baseline_dim64", dim64_iters_per_sec(cpu,
                                                                n_iters=5))
        d64_vs_cpu = d64 / cpu_d64
    else:
        cpu_ips = ips
        vs_baseline = 1.0
        d64_vs_cpu = 1.0

    print(json.dumps({
        "metric": "GRAPE iterations/sec/chip (qubit pi pulse, 1000 steps)",
        "value": round(ips, 2),
        "unit": "iters/sec",
        "vs_baseline": round(vs_baseline, 2),
        "device": str(primary),
        "cpu_iters_per_sec": round(cpu_ips, 2),
        "xla_tree_iters_per_sec": round(xla_ips, 2),
        "batched_1024seed_iters_per_sec": round(bips, 2),
        "dim64_unitary_iters_per_sec": round(d64, 2),
        "dim64_vs_cpu": round(d64_vs_cpu, 2),
        "dim200_cavity_128seed_iters_per_sec": round(d200_128, 2),
        "dim200_cavity_64seed_iters_per_sec": round(d200, 2),
        "dim200_speedup_64seed_iters_per_sec": round(d200_su, 2),
        "dim200_single_iters_per_sec": round(d200_1, 2),
        "dim200_4096seed_grid_seediters_per_sec": round(grid4096, 2),
        "cavity_costs_dim60_iters_per_sec": round(cav60, 2),
        "cavity_costs_dim24_iters_per_sec": round(cav, 2),
        "cnot_reg_batched_seediters_per_sec": round(cnot_reg, 2),
        "leakage_transmon_iters_per_sec": round(leak, 2),
        "leakage_transmon_xla_iters_per_sec": round(leak_xla, 2),
        "wall_clock_to_1e-4_s": round(wall, 3),
        "wall_clock_spread": round(wall_spread, 3),
        **(wall_decomp or {}),
        "final_loss": loss,
        "iterations_to_target": iters,
        "repeats": REPEATS,
        "load": load,
        "windows": windows,
    }))


if __name__ == "__main__":
    main()
