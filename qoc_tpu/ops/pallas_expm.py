"""Fused batched Taylor matrix exponential for MXU-scale dimensions.

``ops/expm.py::taylor_expm`` is the XLA path: every Taylor power ``A^n``
is a [T, M, M] array materialized in HBM — at M = 128, order 8 that is
>200 MB of HBM traffic per evaluation, and the backward pass reads it all
again.  This kernel computes the whole series (and the squarings) with
the per-timestep working set resident in VMEM: the grid tiles the time
axis, each program computes ``exp(A_t)`` for a block of timesteps with
[M, M] MXU dots, and only A (in) and E (out) ever touch HBM.

The custom VJP rematerializes the powers per block in the backward kernel
(scratch [order-1, TB, M, M]) and runs the exact reverse-mode sweep of
the Taylor recurrence + squarings — same math as
ops/pallas_tree.py::tree_backward_vals, expressed with MXU dots per
timestep instead of lane-axis FMAs.

Used by the unitary-mode propagation path at dims where matrices are
real MXU tiles (M >= 32); small dims keep the lane-layout tree kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_chain import _interpret

_F32 = jnp.float32


def fused_expm_supported(M: int, order: int, scaling: int) -> bool:
    """MXU-tile dims with a VMEM-sized per-block working set."""
    if M < 32 or M > 512 or M % 8 != 0:
        return False
    TB = _time_block(M)
    work = 4 * TB * M * M * (max(order - 1, 1) + scaling + 4)
    return work < 40 * (1 << 20)


def _time_block(M: int) -> int:
    """Timesteps per grid program: bigger blocks amortize grid overhead,
    bounded by the backward kernel's power scratch."""
    per_mat = M * M * 4
    budget = 24 * (1 << 20)
    tb = max(1, budget // (per_mat * 16))
    return int(min(tb, 16))


HI = lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.dot(a, b, precision=HI, preferred_element_type=_F32)


def _mm_nt(a, b):
    """a @ b.T without an explicit transpose (MXU dimension numbers)."""
    return lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                           precision=HI, preferred_element_type=_F32)


def _mm_tn(a, b):
    """a.T @ b without an explicit transpose."""
    return lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                           precision=HI, preferred_element_type=_F32)


def _fwd_kernel(M, TB, order, scaling, a_ref, e_ref):
    eye = jnp.eye(M, dtype=_F32)
    inv = 1.0 / (2.0 ** scaling) if scaling else 1.0
    for t in range(TB):
        A = a_ref[t] * inv
        E = eye + A
        An = A
        factorial = 1.0
        for n in range(2, order + 1):
            factorial *= n
            An = _mm(A, An)
            E = E + An * (1.0 / factorial)
        for _ in range(scaling):
            E = _mm(E, E)
        e_ref[t] = E


def _bwd_kernel(M, TB, order, scaling, a_ref, g_ref, abar_ref):
    inv = 1.0 / (2.0 ** scaling) if scaling else 1.0
    for t in range(TB):
        A = a_ref[t] * inv
        # recompute powers A^1..A^{order-1} and pre-squaring E's
        an = [A]
        E = jnp.eye(M, dtype=_F32) + A
        An = A
        factorial = 1.0
        for n in range(2, order + 1):
            factorial *= n
            An = _mm(A, An)
            if n < order:
                an.append(An)
            E = E + An * (1.0 / factorial)
        sq = []
        for _ in range(scaling):
            sq.append(E)
            E = _mm(E, E)

        Ebar = g_ref[t]
        # squarings reverse: E' = E^2 -> Ebar = Ebar E^T + E^T Ebar
        for s in range(scaling - 1, -1, -1):
            Es = sq[s]
            Ebar = _mm_nt(Ebar, Es) + _mm_tn(Es, Ebar)

        # Taylor reverse (tree_backward_vals math, MXU form)
        anbar = Ebar * (1.0 / factorial)
        Abar = jnp.zeros((M, M), dtype=_F32)
        fac_n = factorial
        for n in range(order, 1, -1):
            Abar = Abar + _mm_nt(anbar, an[n - 2])
            fac_n = fac_n / n
            anbar = _mm_tn(A, anbar) + Ebar * (1.0 / fac_n)
        Abar = Abar + anbar
        abar_ref[t] = Abar * inv


def _pad_T(x, TB):
    T = x.shape[0]
    Tp = -(-T // TB) * TB
    if Tp == T:
        return x, T
    return jnp.pad(x, ((0, Tp - T), (0, 0), (0, 0))), T


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_taylor_expm(A, order: int, scaling: int):
    """exp(A_t) for a batch of [T, M, M] generators, fused per time block.

    Matches ``ops/expm.py::taylor_expm`` exactly (same truncation, same
    association order, same squarings); differentiable in ``A``.
    """
    out, _ = _fte_fwd(A, order, scaling)
    return out


def _call(kernel_body, M, TB, order, scaling, n_in, x):
    G = x[0].shape[0] // TB
    return pl.pallas_call(
        functools.partial(kernel_body, M, TB, order, scaling),
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct(x[0].shape, _F32),
        in_specs=[
            pl.BlockSpec((TB, M, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_in)
        ],
        out_specs=pl.BlockSpec((TB, M, M), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(*x)


def _fte_fwd(A, order, scaling):
    M = A.shape[-1]
    TB = _time_block(M)
    Ap, T = _pad_T(A, TB)
    E = _call(_fwd_kernel, M, TB, order, scaling, 1, (Ap,))
    return E[:T], (A,)


def _fte_bwd(order, scaling, res, gbar):
    (A,) = res
    M = A.shape[-1]
    TB = _time_block(M)
    Ap, T = _pad_T(A, TB)
    Gp, _ = _pad_T(gbar, TB)
    Abar = _call(_bwd_kernel, M, TB, order, scaling, 2, (Ap, Gp))
    return (Abar[:T],)


fused_taylor_expm.defvjp(_fte_fwd, _fte_bwd)
