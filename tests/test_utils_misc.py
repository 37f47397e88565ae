"""Profiling utilities and misc coverage."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_time_fn_reports_compile_and_steady():
    from qoc_tpu.utils.profiling import time_fn

    f = jax.jit(lambda x: jnp.sum(x * x))
    out = time_fn(f, jnp.ones(1000), iters=5)
    assert out["compile_s"] >= out["mean_s"] * 0  # sane fields
    assert out["iters_per_sec"] > 0


@pytest.mark.slow
def test_trace_writes_profile(tmp_path):
    from qoc_tpu.utils.profiling import trace

    f = jax.jit(lambda x: x + 1)
    with trace(str(tmp_path)):
        jax.block_until_ready(f(jnp.ones(8)))
    import os

    found = []
    for root, _, files in os.walk(tmp_path):
        found.extend(files)
    assert found  # a trace file was produced


def test_memory_stats_shape():
    from qoc_tpu.utils.profiling import memory_stats

    stats = memory_stats()
    assert stats is None or isinstance(stats, dict)
