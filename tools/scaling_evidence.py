"""Scaling-efficiency evidence for the pod metric (PERF.md section).

BASELINE.md demands ">= 80% efficiency at N >= 2 hosts" for the pod-scale
seed x Hamiltonian sweep.  Real multi-chip hardware is not reachable from
this environment, so the argument is assembled from what IS measurable:

1. **Zero collectives in the hot loop, compiler-verified.**  The sharded
   batched-optimizer segment (shard_map over the seed axis) is lowered and
   its optimized HLO searched for collective ops (all-reduce, all-gather,
   collective-permute, reduce-scatter, all-to-all).  Seeds are independent;
   every tensor in the hot loop is seed-sharded; the expected count is 0.

2. **Per-device work is identical by construction** (same kernel, same
   T/order/n_iters for every seed block), so there is no load imbalance.

3. **The only serial cost is host dispatch**: one kernel launch + one [S]
   stats fetch per segment.  Efficiency at N devices is therefore
   t_compute / (t_compute + t_dispatch), with t_dispatch measured on the
   real chip and independent of N (each host dispatches its own shard).

4. **Virtual-mesh weak scaling** on N in {1,2,4,8} CPU devices: per-seed
   results must be IDENTICAL to the single-device run (asserted), and the
   sharded program must compile + execute at every size.  (Wall-clock on
   virtual devices shares one CPU's cores, so it measures correctness and
   program structure, not speed.)

Usage:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python tools/scaling_evidence.py
        python tools/scaling_evidence.py --dispatch   # on the TPU
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLLECTIVE_RE = re.compile(
    r"all-reduce|all-gather|collective-permute|reduce-scatter|all-to-all",
    re.IGNORECASE)


def _problem(steps=64):
    import qoc_tpu as q
    from qoc_tpu.models.system import ControlProblem

    return ControlProblem.build(
        np.zeros((2, 2), dtype=complex), [q.SIGMA_X, q.SIGMA_Y], ["x", "y"],
        [np.array([0, 1], dtype=complex)], 2.0, steps,
        [np.array([1, 0], dtype=complex)],
        state_transfer=True, maxA=[0.7, 0.7], seed=0)


def _conv():
    from qoc_tpu.optim.convergence import ConvergenceSettings

    return ConvergenceSettings.from_dict(
        {"rate": 0.01, "update_step": 10, "max_iterations": 10 ** 6,
         "conv_target": -1.0})


def collective_count_in_sharded_segment(n_devices: int) -> dict:
    """Lower the shard_map'd batched segment and count collective HLO ops."""
    import jax
    from jax.sharding import Mesh
    from qoc_tpu.parallel.pallas_mega_batch import (
        _build_call, _pick_column_block)

    problem = _problem()
    conv = _conv()
    M, N, T, Kc = 4, 2, problem.steps, 2
    S = 128 * n_devices
    CB = min(_pick_column_block(M, T, Kc), S // n_devices)
    call = _build_call(M, N, 1, Kc, 0, T, problem.taylor_terms, 0, 5, CB,
                       (S // n_devices) // CB, 0.9, 0.999, 1e-8,
                       conv.rate,
                       float(np.exp(-1.0 / conv.learning_rate_decay)),
                       -1.0, -1.0, float(2 ** 30))

    devs = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devs), ("seed",))
    from jax.sharding import PartitionSpec as P

    rep, col2, col3 = P(), P(None, "seed"), P(None, None, "seed")
    fn = jax.jit(jax.shard_map(
        call, mesh=mesh,
        in_specs=(rep, rep, rep, col2, col2, col2,
                  rep, rep, rep, rep, rep,
                  col3, col3, col3, col2, col2),
        out_specs=(col3, col3, col3, col2, col2, col2),
        check_vma=False))

    import jax.numpy as jnp

    mats = jnp.zeros((3, M, M), jnp.float32)
    maxamp = jnp.ones((Kc, 1), jnp.float32)
    psi0 = jnp.zeros((M, S), jnp.float32)
    ew = jnp.zeros((1, S), jnp.float32)
    u = jnp.zeros((T, Kc, S), jnp.float32)
    row = jnp.zeros((1, S), jnp.float32)
    env2 = jnp.zeros((1, 8, 128), jnp.float32)   # inactive-cost dummies
    dft = jnp.zeros((8, 128), jnp.float32)
    lowered = fn.lower(mats, jnp.swapaxes(mats, -1, -2), maxamp, psi0,
                       psi0, ew, env2, dft, dft, dft, dft, u, u, u, row, row)
    hlo = lowered.compile().as_text()
    hits = COLLECTIVE_RE.findall(hlo)
    return {"n_devices": n_devices, "hlo_collective_ops": len(hits),
            "kinds": sorted(set(h.lower() for h in hits))}


def _dim200_problem(steps=200):
    """The multimode-cavity flagship (qubit x 100-level cavity, dim 200):
    the exact problem class BASELINE config 5 runs through xla-cols."""
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
    return ControlProblem.build(
        H0, Hops, ["x", "y", "c"], [tgt], 4.0, steps, [psi0],
        state_transfer=True, maxA=[2 * np.pi * 0.3] * 3, seed=0)


def collective_count_in_xla_cols_segment(n_devices: int,
                                         steps: int = 200) -> dict:
    """Lower the shard_map'd xla-cols segment — the EXACT backend the
    dim-200 pod sweep (BASELINE config 5) uses — on the real multimode
    cavity problem and count collective HLO ops.  Expected 0: the
    fixed-count runner never crosses the seed shards (the in-scan sums
    are local, the grad of the local sum is a broadcast)."""
    import jax
    from jax.sharding import Mesh
    from qoc_tpu.optim.convergence import ConvergenceSettings
    from qoc_tpu.parallel.batch import init_seeds
    from qoc_tpu.parallel.xla_batch import make_xla_cols_sharded_runner

    problem = _dim200_problem(steps)
    conv = ConvergenceSettings.from_dict(
        {"rate": 0.01, "update_step": 100, "max_iterations": 10 ** 6,
         "conv_target": -1.0})
    mesh = Mesh(np.array(jax.devices()[:n_devices]), ("seed",))
    run = make_xla_cols_sharded_runner(problem, conv, mesh)
    S = 2 * n_devices
    u0 = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(0)))
    hlo = run.lower_segment(u0, 3).compile().as_text()
    hits = COLLECTIVE_RE.findall(hlo)
    return {"n_devices": n_devices, "backend": "xla-cols", "dim": 200,
            "hlo_collective_ops": len(hits),
            "kinds": sorted(set(h.lower() for h in hits))}


def weak_scaling_identity(max_devices: int = 8) -> dict:
    """Per-seed results at N devices == single-device results, N in
    {1,2,4,8} (virtual CPU mesh)."""
    import jax
    from jax.sharding import Mesh
    from qoc_tpu.parallel.batch import init_seeds
    from qoc_tpu.parallel.pallas_mega_batch import make_mega_batched_runner

    problem = _problem()
    conv = _conv()
    S = 128 * max_devices
    u0 = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(0)))

    ref_losses = None
    out = {"sizes": []}
    for D in (1, 2, 4, 8):
        if D > max_devices or D > len(jax.devices()):
            break
        mesh = Mesh(np.array(jax.devices()[:D]), ("seed",))
        init_state, run_n, _ = make_mega_batched_runner(
            problem, conv, mesh=mesh, throughput=True)
        t0 = time.perf_counter()
        st = run_n(init_state(u0), 5)
        losses = np.asarray(st.losses)
        wall = time.perf_counter() - t0
        if ref_losses is None:
            ref_losses = losses
        identical = bool(np.array_equal(losses, ref_losses)) or bool(
            np.allclose(losses, ref_losses, atol=0))
        out["sizes"].append({"devices": D, "wall_s": round(wall, 2),
                             "losses_identical_to_1dev": identical})
    return out


def dispatch_overhead_on_tpu() -> dict:
    """Measured serial (host) cost per segment launch: the efficiency model
    is eff = t_compute / (t_compute + t_dispatch), with per-host dispatch
    independent of the device count (each host launches its own shard).

    Dispatch latency is a property of the host->tunnel->device round trip,
    not of the kernel's inner workload, so it is separated with a SMALL
    program (steps=64; full-scale segments take minutes to compile through
    the tunnel): two segment lengths n1 < n2 of the same shape give
    dispatch = t(n1) - n1 * (t(n2)-t(n1))/(n2-n1).  The full-scale
    per-iteration compute time comes from bench.py's 1024-seed steps=1000
    window (BENCH_r*.json batched_seed_iters_per_sec)."""
    import jax
    from qoc_tpu.parallel.batch import init_seeds
    from qoc_tpu.parallel.pallas_mega_batch import make_mega_batched_runner

    problem = _problem(steps=64)
    conv = _conv()
    S = 1024
    u0 = np.asarray(init_seeds(problem, S, jax.random.PRNGKey(0)))
    init_state, run_n, _ = make_mega_batched_runner(
        problem, conv, throughput=True)
    st0 = init_state(u0)
    # tunnel jitter is ~ms on a ~90ms round trip; n2's compute
    # (~2000 iters x ~60us ~ 120ms) must rise well above it
    n1, n2 = 1, 2001
    for n in (n1, n2):
        print(f"compiling n={n} segment ...", flush=True)
        np.asarray(run_n(st0, n).losses)  # compile both sizes
    print("compiled; timing", flush=True)

    def timed(n, reps=5):
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run_n(st0, n).losses)
            walls.append(time.perf_counter() - t0)
        return min(walls)

    t1, t2 = timed(n1), timed(n2)
    per_iter_small = (t2 - t1) / (n2 - n1)
    dispatch = max(t1 - per_iter_small, 0.0)
    return {"segment_dispatch_s": round(dispatch, 4),
            "per_iteration_s_steps64": round(per_iter_small, 6),
            "seeds": S, "note":
            "eff(update_step=100, steps=1000) = 100*t_iter /"
            " (100*t_iter + dispatch) with t_iter from bench.py"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dispatch", action="store_true",
                    help="measure dispatch overhead (run on the TPU)")
    args = ap.parse_args()
    report = {}
    if args.dispatch:
        report["dispatch"] = dispatch_overhead_on_tpu()
    else:
        # The axon PJRT plugin ignores the JAX_PLATFORMS env var; pin the
        # platform through jax.config (what tests/conftest.py does) so the
        # virtual 8-device CPU mesh is actually used.
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
        nd = len(jax.devices())
        report["collectives"] = [collective_count_in_sharded_segment(d)
                                 for d in (2, max(2, min(8, nd)))]
        report["collectives_xla_cols_dim200"] = [
            collective_count_in_xla_cols_segment(d)
            for d in (2, max(2, min(8, nd)))]
        report["weak_scaling"] = weak_scaling_identity(min(8, nd))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
