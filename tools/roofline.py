"""MFU / roofline accounting for the benchmark configs (PERF.md section).

For each config: count matmul FLOPs from first principles (the exact op
sequence the engine ladder emits), measure the achieved iteration rate on
the device, and report achieved FLOP/s against BOTH ceilings of a TPU
v5lite chip:

  * compute ceiling at HIGHEST precision: bf16 MXU peak / 6 passes
    (~197/6 = 32.8 TFLOP/s) — every propagator matmul runs 6-pass f32
    (PERF.md: HIGH drifts unitarity past the 1e-4 budget);
  * HBM roofline: arithmetic intensity x 819 GB/s — batched [M,M]@[M,M]
    matmuls at M=128 carry only ~21 flops/byte, so the bandwidth ceiling
    sits BELOW the compute ceiling until M ~ 256.

Optionally captures a jax.profiler trace and reports the top device ops
by self time (``--trace``).

Usage:  python tools/roofline.py [--trace /tmp/qoc_trace]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5lite (v5e) single-chip ceilings
BF16_PEAK = 197e12            # FLOP/s
F32_HIGHEST_PEAK = BF16_PEAK / 6.0   # 6-pass f32
HBM_BW = 819e9                # bytes/s


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


# ---------------------------------------------------------------------------
# analytic FLOP counts (2 flops per MAC)
# ---------------------------------------------------------------------------


def flops_dim64_iter(T=200, M=128, K=5, order=8, scaling=2, V=4):
    """Unitary-mode lean iteration at dim 64 (bench.dim64_iters_per_sec).

    Since round 5 the auto ladder routes this through the unitary pscan
    chain (evolve_unitary_pscan): Q-series ((order-1) batched [T,M,M]
    matmuls, NO squarings — the squaring branch expands into reps
    repeated serial matvecs), serial state sweep over T*reps sub-steps
    with V+1 columns (the +1 is the ones-column unitary_scale trick),
    matvec-adjoint backward (reverse sweep + 2(q-1) power-ladder passes
    + the series pairing).  The product tree / full-U computation is
    stop-gradient and DCE'd in the optimization loop.  The M^3 backward
    of the pre-round-5 engine (3x forward, 25.25 G/iter trace-verified
    in round 3) is gone; the governing ceiling is HBM + serial latency.
    """
    q = order
    reps = 1 << scaling
    Vp = V + 1
    wh = 2 * T * K * M * M
    expm = 2 * (order - 1) * T * M ** 3
    sweeps = 2 * 2 * T * reps * M * M * Vp
    ladders = 2 * 2 * (q - 1) * T * reps * M * M * Vp
    pairing = 2 * T * M * M * (reps * q * Vp)
    return wh + expm + sweeps + ladders + pairing


def hbm_bytes_dim64_iter(T=200, M=128, order=8, scaling=2):
    """HBM traffic of the round-5 pscan path: 3 passes per Q-series
    matmul, one A pass per ladder level (x2 ladders), Q read in both
    serial sweeps, pairing/wbar reads."""
    a = 4 * T * M * M
    return (order - 1) * 3 * a + 2 * (order - 1) * a + 2 * a + 3 * a


def flops_dim200_iter(T=200, M=400, S=64, Kp=4, order=None):
    """Column-batched state-transfer iteration (bench.dim200_sweep...).
    Per Taylor term per step: ONE [M, Kp*M] @ [Kp*M, S] stacked
    contraction (xla_batch.py).  Checkpointed-scan backward = original
    forward + in-backward recompute + a single same-size reverse matmul
    per term (the generator stack is constant, so only the stacked
    operand cotangent needs a dot) = 3x forward — cross-checked against
    the profiler trace's executed model_flops: 426.2 G/iter measured vs
    3 x 147.5 G analytic at order 10.  The measured value sits ~4% BELOW
    the analytic bound because the 3x model slightly overcounts the
    reverse sweep (the first Taylor term's cotangent needs no stacked
    dot, and the trace's model_flops counts matmul flops only — the
    elementwise loss/Adam work appears in neither number)."""
    if order is None:
        order = _dim200_order()
    fwd = 2 * T * (order - 1) * Kp * M * M * S
    return 3 * fwd


def flops_dim60_iter(T=1000, M=120, K=5, order=15, V=1):
    """BASELINE config-4 iteration (bench.cavity_dim60_iters_per_sec):
    dim-60 transmon-cavity state transfer, dressed, dwdt + bandpass +
    speed_up, 1000 steps.  Since round 5 the auto ladder routes this to
    the *pscan* engine (ops/propagation.py::pscan_chain): batched Taylor
    propagators (order-2 batched [T,M,M] matmuls) + serial state sweep
    forward; matvec-adjoint backward (reverse sweep + two batched power
    LADDERS of [T,M,V] matvecs + the series-pairing matmuls) — the M^3
    Taylor re-differentiation of plain autodiff is gone, so the flop
    count is ~fwd + small, NOT 3x fwd.  The governing ceiling is HBM
    bandwidth (see hbm_bytes_dim60_iter), not the MXU."""
    q = order - 1
    wh = 2 * T * K * M * M
    expm = 2 * (order - 2) * T * M ** 3
    sweeps = 2 * 2 * T * M * M * V            # fwd + adjoint matvecs
    ladders = 2 * 2 * (q - 1) * T * M * M * V  # f and b power ladders
    pairing = 2 * T * q * M * M * V + 2 * T * q * M * V * q  # B^T(CF), CF
    wbar = 2 * 2 * K * T * M * M               # wbar + matsbar einsums
    return wh + expm + sweeps + ladders + pairing + wbar


def hbm_bytes_dim60_iter(T=1000, M=120, order=15):
    """HBM traffic model for the pscan iteration: each batched Taylor
    matmul reads A + the running power and writes the next power
    (3 x 4TM^2); each power-ladder step reads A once; the serial sweeps
    read P forward and backward; pairing/wbar read Abar-sized arrays."""
    a = 4 * T * M * M                 # one [T,M,M] f32 array
    taylor = (order - 2) * 3 * a
    ladders = 2 * (order - 2) * a
    sweeps = 2 * a                    # P read in both sweeps
    pairing = 3 * a                   # Abar write + wbar/matsbar reads
    return taylor + ladders + sweeps + pairing


def _dim200_order():
    from qoc_tpu.models.system import ControlProblem

    Nc = 100
    a = np.kron(np.eye(2), np.diag(np.sqrt(np.arange(1, Nc)), 1))
    sm = np.kron(np.array([[0, 1], [0, 0]]), np.eye(Nc))
    H0 = (2 * np.pi * 0.1 * (a.conj().T @ a)
          + 2 * np.pi * 0.05 * (a.conj().T @ sm + a @ sm.conj().T))
    Hops = [sm + sm.conj().T, 1j * (sm - sm.conj().T), a + a.conj().T]
    psi0 = np.zeros(200, complex)
    psi0[0] = 1
    tgt = np.zeros(200, complex)
    tgt[100] = 1
    p = ControlProblem.build(
        H0, Hops, ["x", "y", "c"], [tgt], 4.0, 200, [psi0],
        state_transfer=True, maxA=[2 * np.pi * 0.3] * 3, seed=0)
    return p.taylor_terms


def flops_pi_pulse_iter(T=1000, M=4, K=3, order=3):
    """Fused mega-kernel iteration (M=4 real iso): the whole chain is
    lane-axis FMAs, not MXU matmuls — VPU work.  Counted for completeness;
    the regime is latency-bound, MFU is not the governing metric."""
    # forward tree: ~2*Tp levels of [M,M,Tp] FMA products + Taylor terms
    Tp = 1024
    taylor = 2 * order * K * M * M * Tp
    tree = 2 * 2 * M * M * M * Tp  # rolling products over levels ~2x
    return 3 * (taylor + tree)


# ---------------------------------------------------------------------------
# measurements (reuse bench.py windows)
# ---------------------------------------------------------------------------


DIM200_SEEDS = 128  # headline config: S >= 128 fills the 128-lane tiles
# (PERF.md seed scaling; the 64-seed bench window is a compat metric)


def measure():
    import jax
    import bench

    dev = jax.devices()[0]
    out = {}
    d64, d64_spread, _ = bench.dim64_iters_per_sec(dev)
    out["dim64"] = {"iters_per_sec": d64, "spread": d64_spread}
    d200, d200_spread, _ = bench.dim200_sweep_iters_per_sec(
        n_seeds=DIM200_SEEDS)
    out["dim200"] = {"seed_iters_per_sec": d200, "spread": d200_spread,
                     "seeds": DIM200_SEEDS}
    d60, d60_spread, _ = bench.cavity_dim60_iters_per_sec(dev)
    out["dim60"] = {"iters_per_sec": d60, "spread": d60_spread}
    pi, pi_spread, _ = bench.iters_per_sec_mega()
    out["pi_pulse"] = {"iters_per_sec": pi, "spread": pi_spread}
    return out


def trace_dim64(log_dir: str, n_iters: int = 30):
    """Capture a profiler trace of the dim-64 iteration loop."""
    import jax
    import jax.numpy as jnp
    import bench
    from qoc_tpu.utils.profiling import trace

    # rebuild exactly bench.dim64's problem/runner, trace the hot window
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
        maxA=[1.0] * 4, seed=0, Taylor_terms=[8, 2])
    conv = bench._conv()
    _, loss_fn = make_forward(problem, lean=True, engine="auto")
    optimizer = make_adam_optimizer(conv)
    run_n = make_throughput_runner(loss_fn, conv, optimizer)
    u = jnp.asarray(problem.u0_base)
    os0 = optimizer.init(u)
    _sync(run_n(u, os0, 3)[0])  # compile
    with trace(log_dir):
        _sync(run_n(u, os0, n_iters)[0])
    return summarize_trace(log_dir)


def trace_dim200(log_dir: str, n_iters: int = 20, n_seeds=None):
    """Trace the dim-200 column-batched loop and report the
    data-formatting share (copy/reshape/transpose/pad ops) — the r3 trace
    showed 12% at S=64 from half-filled lane tiles; with S >= 128 (or the
    round-4 internal padding) it should sit under 5%."""
    import jax.numpy as jnp
    import optax
    import bench
    import jax
    from qoc_tpu.optim.adam import make_adam_optimizer
    from qoc_tpu.parallel.batch import init_seeds
    from qoc_tpu.parallel.xla_batch import make_xla_batched_loss
    from qoc_tpu.utils.profiling import trace

    if n_seeds is None:
        n_seeds = DIM200_SEEDS
    # same problem as bench.dim200_sweep_iters_per_sec
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
    from qoc_tpu.models.system import ControlProblem

    problem = ControlProblem.build(
        H0, Hops, ["x", "y", "c"], [tgt], 4.0, 200, [psi0],
        state_transfer=True, maxA=[2 * np.pi * 0.3] * 3, seed=0)
    conv = bench._conv()
    batched_loss = make_xla_batched_loss(problem)
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

    u = jnp.asarray(init_seeds(problem, n_seeds, jax.random.PRNGKey(0)))
    os0 = jax.vmap(opt.init)(u)
    _sync(run_n(u, os0, 2)[0])
    with trace(log_dir):
        _sync(run_n(u, os0, n_iters)[0])
    summ = summarize_trace(log_dir, top=16)
    if summ:
        fmt = sum(r["us"] for r in summ["top"]
                  if any(k in r["name"].lower()
                         for k in ("copy", "reshape", "transpose", "pad",
                                   "concatenate", "fusion.slice", "bitcast")))
        # conservative: formatting share computed over the whole device
        # total, counting every formatting-named op in the top rows
        summ["formatting_pct_of_device_total"] = round(
            100 * fmt / summ["total_us"], 1) if summ["total_us"] else None
        summ["seeds"] = n_seeds
    return summ


def trace_dim60(log_dir: str, n_iters: int = 20):
    """Trace the BASELINE config-4 at-spec loop (dim-60 transmon-cavity
    state transfer with dwdt + bandpass + speed_up, 1000 steps) — the
    VERDICT r4 ask: a trace decomposition explaining the single-problem
    throughput between the dim-64 unitary and the fused-chain regimes."""
    import jax
    import jax.numpy as jnp
    import bench
    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.models.system import ControlProblem
    from qoc_tpu.optim.adam import make_adam_optimizer, make_throughput_runner
    from qoc_tpu.utils.profiling import trace

    import qoc_tpu as q

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "jobs"))
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
        maxA=[MAXA] * 4, seed=0)
    rc = {"dwdt": 0.0001, "bandpass": 0.1, "band": [0.1, 10.0],
          "speed_up": 0.0001}
    conv = bench._conv()
    _, loss_fn = make_forward(problem, lean=True, engine="auto",
                              reg_coeffs=rc)
    optimizer = make_adam_optimizer(conv)
    run_n = make_throughput_runner(loss_fn, conv, optimizer)
    u = jnp.asarray(problem.u0_base)
    os0 = optimizer.init(u)
    _sync(run_n(u, os0, 2)[0])
    with trace(log_dir):
        _sync(run_n(u, os0, n_iters)[0])
    summ = summarize_trace(log_dir, top=20)
    if summ:
        summ["taylor_terms"] = problem.taylor_terms
        summ["n_iters"] = n_iters
    return summ


def summarize_trace(log_dir: str, top: int = 12):
    """Aggregate device-op self time from the profiler's trace.json.gz."""
    paths = glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # keep device-track complete events (phase X with dur)
    by_name = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "?")
        by_name.setdefault(name, [0.0, 0])
        by_name[name][0] += e["dur"]
        by_name[name][1] += 1
    total = sum(v[0] for v in by_name.values())
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])[:top]
    return {"total_us": total,
            "top": [{"name": k[:80], "us": round(v[0], 1), "count": v[1],
                     "pct": round(100 * v[0] / total, 1)}
                    for k, v in rows]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None,
                    help="directory for a dim-64 profiler trace")
    args = ap.parse_args()

    m = measure()
    f64 = flops_dim64_iter()
    f200 = flops_dim200_iter(S=DIM200_SEEDS)
    f60 = flops_dim60_iter()
    fpi = flops_pi_pulse_iter()

    d60_rate = m["dim60"]["iters_per_sec"] * f60
    d64_rate = m["dim64"]["iters_per_sec"] * f64
    # dim200 measure is seed-iters/s; flops_dim200_iter covers ALL seeds
    d200_rate = m["dim200"]["seed_iters_per_sec"] / DIM200_SEEDS * f200
    pi_rate = m["pi_pulse"]["iters_per_sec"] * fpi

    ai64 = f64 / hbm_bytes_dim64_iter()
    hbm_ceiling_64 = ai64 * HBM_BW

    report = {
        "ceilings": {"f32_highest_tflops": round(F32_HIGHEST_PEAK / 1e12, 1),
                     "hbm_gb_s": round(HBM_BW / 1e9), },
        "dim64": {
            **{k: round(v, 2) for k, v in m["dim64"].items()},
            "flops_per_iter_g": round(f64 / 1e9, 2),
            "achieved_tflops": round(d64_rate / 1e12, 2),
            "mfu_vs_f32_ceiling_pct": round(100 * d64_rate / F32_HIGHEST_PEAK, 1),
            "arithmetic_intensity_flops_per_byte": round(ai64, 1),
            "hbm_roofline_tflops": round(hbm_ceiling_64 / 1e12, 2),
            "pct_of_hbm_roofline": round(100 * d64_rate / hbm_ceiling_64, 1),
        },
        "dim200": {
            **{k: round(v, 2) for k, v in m["dim200"].items()},
            "flops_per_batch_iter_g": round(f200 / 1e9, 2),
            "achieved_tflops": round(d200_rate / 1e12, 2),
            "mfu_vs_f32_ceiling_pct": round(100 * d200_rate / F32_HIGHEST_PEAK, 1),
        },
        "dim60_config4": {
            **{k: round(v, 2) for k, v in m["dim60"].items()},
            "flops_per_iter_g": round(f60 / 1e9, 2),
            "achieved_tflops": round(d60_rate / 1e12, 2),
            "mfu_vs_f32_ceiling_pct": round(100 * d60_rate / F32_HIGHEST_PEAK, 1),
            "hbm_bytes_per_iter_gb": round(hbm_bytes_dim60_iter() / 1e9, 2),
            "hbm_bound_ms_per_iter": round(
                1e3 * hbm_bytes_dim60_iter() / HBM_BW, 2),
            "pct_of_hbm_roofline": round(
                100 * (hbm_bytes_dim60_iter() / HBM_BW)
                * m["dim60"]["iters_per_sec"], 1),
            "note": "pscan engine + 128-lane tile padding (round 5): "
                    "HBM-bound batched Taylor + power ladders + ~0.8ms "
                    "serial matvec latency; the pre-round-5 associative "
                    "engine spent 12ms/iter in host-spilled (S(1)) scan "
                    "combines and unpadded M=120 paid per-matmul layout "
                    "copies — see dim60_trace and PERF.md",
        },
        "pi_pulse": {
            **{k: round(v, 2) for k, v in m["pi_pulse"].items()},
            "flops_per_iter_m": round(fpi / 1e6, 2),
            "achieved_gflops": round(pi_rate / 1e9, 2),
            "note": "M=4: VPU/latency-bound fused kernel, not an MXU regime",
        },
    }
    if args.trace:
        report["dim64_trace"] = trace_dim64(args.trace + "_d64")
        report["dim200_trace"] = trace_dim200(args.trace + "_d200")
        report["dim60_trace"] = trace_dim60(args.trace + "_d60")
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
