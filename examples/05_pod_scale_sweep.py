"""Pod-scale seed x Hamiltonian sweep (BASELINE config 5).

Thousands of parallel GRAPE optimizations — random pulse seeds crossed with
a detuning grid — batched through the fused Pallas chain kernel and sharded
over a jax.sharding.Mesh.  On a multi-host pod slice, initialize with
``qoc_tpu.parallel.mesh.init_distributed()`` first; the seed axis shards
across hosts over DCN automatically.

Run (single host):  python examples/05_pod_scale_sweep.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import qoc_tpu as q
from qoc_tpu.models.system import ControlProblem
from qoc_tpu.ops.isomorphism import c_to_r_mat
from qoc_tpu.parallel.batch import batched_grape_adam, init_seeds
from qoc_tpu.parallel.mesh import make_mesh
from qoc_tpu.parallel.pallas_batch import make_pallas_batched_loss


def main():
    n_seeds = 512
    problem = ControlProblem.build(
        np.zeros((2, 2), dtype=complex), [q.SIGMA_X, q.SIGMA_Y], ["x", "y"],
        [np.array([0, 1], dtype=complex)], 10.0, 1000,
        [np.array([1, 0], dtype=complex)],
        state_transfer=True, maxA=[0.7, 0.7], seed=0,
    )

    # --- seeds-only batch, sharded over all local devices ----------------
    mesh = make_mesh()
    out = batched_grape_adam(
        problem, n_seeds=n_seeds,
        convergence={"rate": 0.01, "update_step": 100,
                     "max_iterations": 2000, "conv_target": 1e-6},
        seed=0, mesh=mesh,
    )
    print(f"{n_seeds} seeds: best loss {out['best_loss']:.2e}, "
          f"{int(np.sum(out['converged']))} converged")

    # --- detuning sweep OPTIMIZED through the fused batched-optimizer
    # kernel: every (seed, detuning) cell runs its whole Adam segment
    # inside one kernel launch per device -------------------------------
    from qoc_tpu.optim.convergence import ConvergenceSettings
    from qoc_tpu.parallel.pallas_mega_batch import make_mega_batched_runner

    NUM = np.diag([0.0, 1.0]).astype(complex)
    extra = np.stack(
        [c_to_r_mat(-1j * problem.dt * NUM)]).astype(np.float32)
    conv = ConvergenceSettings.from_dict(
        {"rate": 0.01, "update_step": 100, "max_iterations": 2000,
         "conv_target": 1e-6})
    deltas = np.linspace(0.0, 0.2, n_seeds)[:, None].astype(np.float32)
    u = np.asarray(init_seeds(problem, n_seeds, jax.random.PRNGKey(1)))
    init_state, run_n, read_u = make_mega_batched_runner(
        problem, conv, extra_channel_mats=extra, mesh=mesh)
    state = run_n(init_state(u), 500, extra_weights=deltas)
    losses = np.asarray(state.losses)
    print(f"sweep after 500 iters: best {losses.min():.2e} "
          f"worst {losses.max():.2e} (detuning 0..0.2)")


if __name__ == "__main__":
    main()
