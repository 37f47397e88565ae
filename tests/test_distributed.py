"""Multi-host semantics without a cluster: two OS processes under
jax.distributed, each owning half the virtual devices, running the sharded
batched step and psum-reducing global stats (SURVEY.md section 4d)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest


WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=pid,
        local_device_ids=[0, 1],
    )
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    import numpy as np
    import jax.numpy as jnp
    import qoc_tpu as q
    from qoc_tpu.models.system import ControlProblem
    from qoc_tpu.optim.convergence import ConvergenceSettings
    from qoc_tpu.parallel.mesh import make_mesh
    from qoc_tpu.parallel.shard import make_shard_map_step

    p = ControlProblem.build(
        np.zeros((2, 2), dtype=complex), [q.SIGMA_X, q.SIGMA_Y], ["x", "y"],
        [np.array([0, 1], dtype=complex)], 8.0, 20,
        [np.array([1, 0], dtype=complex)],
        state_transfer=True, maxA=[0.8, 0.8], seed=0,
    )
    conv = ConvergenceSettings.from_dict({"rate": 0.05, "conv_target": 1e-2})
    mesh = make_mesh()
    init, step = make_shard_map_step(p, conv, mesh, steps_per_call=40)

    # every process materializes the same global seed batch; device_put with
    # the sharded layout keeps only the local shard on local devices
    from qoc_tpu.parallel.batch import init_seeds
    u = init_seeds(p, 8, jax.random.PRNGKey(0))
    u, opt_state = init(u)
    u, opt_state, stats = step(u, opt_state)
    u, opt_state, stats = step(u, opt_state)
    best = float(stats.best_loss)
    print(f"RESULT pid={pid} best={best:.6f} nconv={float(stats.n_converged)}")
    assert best < 0.5, best
""")


def test_two_process_distributed(tmp_path):
    # find a free port
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=210)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed smoke timed out in this environment")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        assert "RESULT" in out
