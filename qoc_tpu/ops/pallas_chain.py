"""Fused Pallas TPU kernel for the state-transfer propagation chain.

The XLA paths (ops/propagation.py) dispatch one batched op per Taylor term
per tree level; for small Hilbert dimensions the whole GRAPE iteration is
op-dispatch-bound.  This kernel runs the ENTIRE time loop inside one Pallas
program: generators, weights, and the state block live in VMEM, each
timestep is a handful of MXU dots + VPU FMAs, and no per-step XLA op
boundaries exist.  It is our analog of the reference's vestigial
custom_kernels CUDA matexp path (SURVEY.md section 2: ".gitignore:106-108"),
redesigned for the TPU memory hierarchy.

Layout (chosen for TPU tiling):
  * state block   psi  [M, C]  — M (Hilbert, real iso) on sublanes,
    C = columns on lanes.  Columns are seeds x initial-vectors: the batch
    layer packs thousands of independent problems on the lane axis, which
    is what finally feeds the MXU/VPU at full width.
  * generators    mats [K, M, M] — constants, VMEM-resident.
  * weights       w    [T, K, C] — per-timestep, per-column coefficients
    (row 0 is the constant drift weight).
  * trajectory    traj [T+1, M, C] — saved by the forward kernel as the
    residual for the exact backward sweep.

Per step (Taylor order N, matvec convention: powers 0..N-1, no
scaling/squaring — tensorflow_state.py:77-97):
    p_0 = psi;  p_n = (sum_k w[t,k] * (mats[k] @ p_{n-1})) / n;
    psi' = sum_n p_n.

The backward kernel replays each step from the stored psi_t and runs the
exact reverse-mode sweep of that recurrence (cotangents for both the
weights and the state), so gradient semantics match autodiff through the
XLA scan path to float32 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # tests run on CPU; the interpreter executes the same kernel logic
    return jax.default_backend() == "cpu"


def _dot(a, b):
    # precision=HIGHEST is load-bearing: preferred_element_type only sets
    # the ACCUMULATOR type; without it the MXU rounds inputs to bf16 and
    # the propagated states drift ~1e-4 per chain (measured vs float64)
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(order: int, scaling: int, mats_ref, w_ref, psi0_ref,
                out_ref, traj_ref):
    K = mats_ref.shape[0]
    T = w_ref.shape[0]
    # taylor_scaling s > 0 (unitary mode): exp(A) = Taylor(A/2^s)^(2^s)
    # (tensorflow_state.py:31,43-44) — each squaring is one more Taylor
    # application of the pre-scaled generator to the column block
    reps = 1 << scaling
    csc = 1.0 / reps

    traj_ref[0] = psi0_ref[:]

    def apply_A(w_t, x):
        # A x = sum_k w[t,k,:] * (mats[k] @ x);  w broadcast over sublanes
        y = w_t[0, 0, :][None, :] * _dot(mats_ref[0], x)
        for k in range(1, K):
            y = y + w_t[0, k, :][None, :] * _dot(mats_ref[k], x)
        return y

    def step(t, psi):
        w_t = w_ref[pl.ds(t, 1)]  # [1, K, C]
        acc = psi
        for _ in range(reps):
            pn = acc
            y = acc
            for n in range(1, order):
                pn = apply_A(w_t, pn) * (csc / n)
                y = y + pn
            acc = y
        traj_ref[pl.ds(t + 1, 1)] = acc[None]
        return acc

    out_ref[:] = lax.fori_loop(0, T, step, psi0_ref[:])


COLUMN_BLOCK = 128  # columns per grid program; with grid double-buffering
# the backward kernel holds ~2x(traj+weights+wbar) blocks, so 128 lanes
# keeps scoped VMEM under the 16 MB limit


def _grid_and_block(C: int):
    """Split the column axis into grid programs of <= COLUMN_BLOCK lanes."""
    if C <= COLUMN_BLOCK:
        return 1, C
    if C % COLUMN_BLOCK != 0:
        raise ValueError(
            f"column count {C} must be a multiple of {COLUMN_BLOCK} "
            f"(pad the seed axis)"
        )
    return C // COLUMN_BLOCK, COLUMN_BLOCK


def _fwd_call(mats, w, psi0, order: int, scaling: int = 0):
    T, K, C = w.shape
    M = psi0.shape[0]
    G, CB = _grid_and_block(C)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, order, scaling),
        grid=(G,),
        out_shape=(
            jax.ShapeDtypeStruct((M, C), jnp.float32),
            jax.ShapeDtypeStruct((T + 1, M, C), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((mats.shape[0], M, M), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, K, CB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, CB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((M, CB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T + 1, M, CB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(mats, w, psi0)


# ---------------------------------------------------------------------------
# backward (exact reverse-mode of the per-step Taylor recurrence)
# ---------------------------------------------------------------------------


def _bwd_kernel(order: int, scaling: int, mats_ref, matsT_ref, w_ref,
                traj_ref, g_ref,
                wbar_ref, psibar_ref, p_scratch):
    K = mats_ref.shape[0]
    T = w_ref.shape[0]
    reps = 1 << scaling
    csc = 1.0 / reps

    def apply_k(k, x):
        return _dot(mats_ref[k], x)

    def apply_kT(k, x):
        return _dot(matsT_ref[k], x)

    def step(i, gbar):
        t = T - 1 - i
        w_t = w_ref[pl.ds(t, 1)]  # [1, K, C]
        psi = traj_ref[pl.ds(t, 1)][0]  # [M, C]

        def taylor_apply(x):
            pn = x
            y = x
            for n in range(1, order):
                z = w_t[0, 0, :][None, :] * apply_k(0, pn)
                for k in range(1, K):
                    z = z + w_t[0, k, :][None, :] * apply_k(k, pn)
                pn = z * (csc / n)
                y = y + pn
            return y

        # sub-states y_0..y_{reps-1}: inputs of each Taylor application
        subs = [psi]
        for _ in range(reps - 1):
            subs.append(taylor_apply(subs[-1]))

        wk = [jnp.zeros_like(gbar[0])] * K  # per-k [C] accumulators
        pb_step = gbar
        for r in range(reps - 1, -1, -1):
            # --- replay recurrence of application r, stash p_0..p_{order-1}
            p_scratch[0] = subs[r]
            pn = subs[r]
            for n in range(1, order):
                y = w_t[0, 0, :][None, :] * apply_k(0, pn)
                for k in range(1, K):
                    y = y + w_t[0, k, :][None, :] * apply_k(k, pn)
                pn = y * (csc / n)
                p_scratch[n] = pn

            # --- reverse sweep --------------------------------------------
            # out = sum_n p_n;   p_n = csc * (A p_{n-1}) / n
            # pbar_n = gbar + csc * A^T pbar_{n+1} / (n+1)
            # wbar[k] += csc * sum_M(pbar_n * (M_k p_{n-1})) / n
            pbar = pb_step
            for n in range(order - 1, 0, -1):
                pm1 = p_scratch[n - 1]
                cn = csc / n
                for k in range(K):
                    wk[k] = wk[k] + jnp.sum(pbar * apply_k(k, pm1),
                                            axis=0) * cn
                # cotangent into p_{n-1}: via A^T, with per-column weights
                ATpbar = w_t[0, 0, :][None, :] * apply_kT(0, pbar)
                for k in range(1, K):
                    ATpbar = ATpbar + w_t[0, k, :][None, :] * apply_kT(k, pbar)
                pbar = pb_step + ATpbar * cn
            pb_step = pbar

        wbar_ref[pl.ds(t, 1)] = jnp.stack(wk)[None]
        return pb_step

    psibar_ref[:] = lax.fori_loop(0, T, step, g_ref[:])


def _bwd_call(mats, matsT, w, traj, gbar, order: int, scaling: int = 0):
    T, K, C = w.shape
    M = gbar.shape[0]
    G, CB = _grid_and_block(C)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, order, scaling),
        grid=(G,),
        out_shape=(
            jax.ShapeDtypeStruct((T, K, C), jnp.float32),
            jax.ShapeDtypeStruct((M, C), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((K, M, M), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, M, M), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, K, CB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T + 1, M, CB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, CB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, K, CB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, CB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((order, M, CB), jnp.float32),
        ],
        interpret=_interpret(),
    )(mats, matsT, w, traj, gbar)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_state_chain(mats, w, psi0, order: int, scaling: int = 0):
    """Final state of the full propagation chain, fused in one TPU kernel.

    Args:
      mats: [K, M, M] real-iso generators (row 0 = drift).
      w:    [T, K, C] per-timestep per-column coefficients (w[:,0,:] = 1).
      psi0: [M, C] initial state block (columns = seeds x vectors).
      order: Taylor order (matvec convention: powers 0..order-1).
      scaling: squaring count s; each timestep applies the Taylor series of
        the 2^-s-scaled generator 2^s times (exp(A) = Taylor(A/2^s)^(2^s),
        tensorflow_state.py:31,43-44) — the unitary-mode convention on
        propagated columns.

    Returns psi_T [M, C].  Differentiable in ``w`` and ``psi0`` (exact
    reverse-mode); ``mats`` is treated as constant (matching the
    reference's zero H_all gradient, tensorflow_state.py:65,133).
    """
    out, _ = _fwd_call(mats, w, psi0, order, scaling)
    return out


def _fsc_fwd(mats, w, psi0, order, scaling):
    out, traj = _fwd_call(mats, w, psi0, order, scaling)
    return out, (mats, w, traj)


def _fsc_bwd(order, scaling, res, gbar):
    mats, w, traj = res
    matsT = jnp.swapaxes(mats, -1, -2)
    wbar, psibar = _bwd_call(mats, matsT, w, traj, gbar, order, scaling)
    return (jnp.zeros_like(mats), wbar, psibar)


fused_state_chain.defvjp(_fsc_fwd, _fsc_bwd)


def fused_state_chain_with_traj(mats, w, psi0, order: int, scaling: int = 0):
    """Forward-only variant also returning the trajectory [T+1, M, C]
    (for analysis / inter-vec readout; not differentiable)."""
    return _fwd_call(mats, w, psi0, order, scaling)
