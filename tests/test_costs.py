"""Each regularizer vs a straightforward numpy oracle
(regularization_functions.py:7-97 semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qoc_tpu.models.costs import CostContext, REGISTRY, total_reg_cost
from qoc_tpu.ops.inner_products import inner_product_2d, inner_product_3d


def l2(x):
    return 0.5 * np.sum(np.square(x))


def make_ctx(rng, K=2, T=16, N=3, V=2, with_inter=True):
    ops_weight = rng.standard_normal((K, T)).astype(np.float32)
    inter_vecs = (
        rng.standard_normal((T + 1, 2 * N, V)).astype(np.float32)
        if with_inter else None
    )
    target_vecs = rng.standard_normal((2 * N, V)).astype(np.float32)
    env = rng.uniform(0.1, 1.0, (K, T)).astype(np.float32)
    dt = 0.25
    return CostContext(
        ops_weight=jnp.asarray(ops_weight),
        inter_vecs=jnp.asarray(inter_vecs) if with_inter else None,
        target_vecs=jnp.asarray(target_vecs),
        state_num=N, steps=T, dt=dt, total_time=dt * T,
        one_minus_gauss=jnp.asarray(env), v_sorted_iso=None,
    ), ops_weight, inter_vecs, target_vecs, env, dt


def test_amplitude(rng):
    ctx, w, *_ = make_ctx(rng)
    got = float(REGISTRY["amplitude"](ctx, {"amplitude": 3.0}))
    assert np.isclose(got, 3.0 / 16 * l2(w), rtol=1e-5)


def test_envelope(rng):
    ctx, w, _, _, env, _ = make_ctx(rng)
    got = float(REGISTRY["envelope"](ctx, {"envelope": 2.0}))
    assert np.isclose(got, 2.0 / 16 * l2(env * w), rtol=1e-5)


def test_dwdt(rng):
    ctx, w, _, _, _, dt = make_ctx(rng)
    K, T = w.shape
    padded = np.concatenate([np.zeros((K, 2)), w, np.zeros((K, 2))], axis=1)
    diff = (padded[:, 1:] - padded[:, : T + 3]) / dt
    got = float(REGISTRY["dwdt"](ctx, {"dwdt": 1.5}))
    assert np.isclose(got, 1.5 / T * l2(diff), rtol=1e-5)


def test_d2wdt2(rng):
    ctx, w, _, _, _, dt = make_ctx(rng)
    K, T = w.shape
    padded = np.concatenate([np.zeros((K, 2)), w, np.zeros((K, 2))], axis=1)
    d2 = (padded[:, 2:] - 2 * padded[:, 1 : T + 3] + padded[:, : T + 2]) / dt**2
    got = float(REGISTRY["d2wdt2"](ctx, {"d2wdt2": 0.7}))
    assert np.isclose(got, 0.7 / T * l2(d2), rtol=1e-5)


def test_bandpass(rng):
    ctx, w, _, _, _, dt = make_ctx(rng)
    T = w.shape[1]
    fft = np.abs(np.fft.fft(w, axis=1))
    band = np.array([0.1, 0.5])
    band_id = (band * dt * T).astype(int)
    half = T // 2
    want = 1.0 / T * (
        np.sum(fft[:, 0 : band_id[0]]) + np.sum(fft[:, band_id[1] : half])
    )
    got = float(REGISTRY["bandpass"](ctx, {"bandpass": 1.0, "band": band}))
    assert np.isclose(got, want, rtol=1e-4)


def test_forbidden(rng):
    ctx, w, iv, _, _, _ = make_ctx(rng)
    N, T = 3, 16
    coeffs, states = [2.0, 1.0], [1, 2]
    want = 0.0
    for c, s in zip(coeffs, states):
        pop = iv[:, s, :] ** 2 + iv[:, N + s, :] ** 2
        want += c / T * l2(pop)
    got = float(
        REGISTRY["forbidden_coeff_list"](
            ctx,
            {"forbidden_coeff_list": coeffs, "states_forbidden_list": states},
        )
    )
    assert np.isclose(got, want, rtol=1e-5)


def test_forbidden_requires_inter_vecs(rng):
    ctx, *_ = make_ctx(rng, with_inter=False)
    with pytest.raises(ValueError):
        REGISTRY["forbidden_coeff_list"](
            ctx, {"forbidden_coeff_list": [1.0], "states_forbidden_list": [1]}
        )


def test_speed_up(rng):
    ctx, w, iv, tv, _, _ = make_ctx(rng)
    N, T = 3, 16
    tiled = np.broadcast_to(tv[None], (T + 1,) + tv.shape)
    ip3 = float(inner_product_3d(jnp.asarray(iv), jnp.asarray(tiled), N))
    want = 0.5 / T * 0.5 * (T + 1 - ip3) ** 2 * 2  # alpha=coeff/T; l2 of scalar
    got = float(REGISTRY["speed_up"](ctx, {"speed_up": 1.0}))
    assert np.isclose(got, 1.0 / T * 0.5 * (T + 1 - ip3) ** 2, rtol=1e-4)
    assert np.isclose(got, want, rtol=1e-4)


def test_total_and_forbidden_alias(rng):
    ctx, *_ = make_ctx(rng)
    a = float(
        total_reg_cost(
            ctx,
            {"amplitude": 1.0, "forbidden": [1.0], "states_forbidden_list": [1]},
        )
    )
    b = float(
        total_reg_cost(
            ctx,
            {
                "amplitude": 1.0,
                "forbidden_coeff_list": [1.0],
                "states_forbidden_list": [1],
            },
        )
    )
    assert np.isclose(a, b)


def test_unknown_key_raises(rng):
    ctx, *_ = make_ctx(rng)
    with pytest.raises(KeyError):
        total_reg_cost(ctx, {"no_such_cost": 1.0})


def test_inner_product_2d_is_fidelity(rng):
    """ip2d on iso vectors == |<a|b>|^2 coherently summed / V^2."""
    N, V = 4, 3
    a = rng.standard_normal((N, V)) + 1j * rng.standard_normal((N, V))
    b = rng.standard_normal((N, V)) + 1j * rng.standard_normal((N, V))
    iso = lambda x: np.concatenate([x.real, x.imag], axis=0).astype(np.float32)
    got = float(inner_product_2d(jnp.asarray(iso(a)), jnp.asarray(iso(b)), N))
    want = np.abs(np.sum(np.conj(a) * b)) ** 2 / V**2
    assert np.isclose(got, want, rtol=1e-4)


def test_inner_product_1d(rng):
    from qoc_tpu.ops.inner_products import inner_product_1d

    N = 5
    a = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    b = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    iso = lambda x: np.concatenate([x.real, x.imag]).astype(np.float32)
    got = float(inner_product_1d(jnp.asarray(iso(a)), jnp.asarray(iso(b)), N))
    want = np.abs(np.vdot(a, b)) ** 2
    assert np.isclose(got, want, rtol=1e-4)
