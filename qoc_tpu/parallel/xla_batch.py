"""Column-batched XLA loss for LARGE Hilbert dimensions.

The generic batched path (vmap of the per-seed forward) materializes a
per-seed step generator ``A_t [S, M, M]`` at every timestep — at dim 200
that is 41 MB of HBM traffic per Taylor application, and the whole
iteration is bandwidth-bound.  This module batches seeds on the COLUMN
axis instead (the pallas_chain layout, in pure XLA): the state block is
``[M, S]``, and each Taylor term is ONE ``[M, K'M] @ [K'M, S]`` MXU
matmul — the per-seed weights are column scalings, so they commute into
the operand (``sum_k w_k (M_k @ pn) = [M_0|..|M_K'] @ stack_k(pn * w_k)``)
and the K'-channel mix happens inside the MXU contraction instead of as
K' separate dots + adds.  No per-seed matrices ever exist.  Measured at
dim 200 (qubit x 100-level cavity, 200 steps, 64 seeds, TPU v5lite):
4.6x the vmapped path as separate dots, a further 11% with the stacked
contraction (fwd+bwd 42.0 -> 37.9 ms; a seed-major ``[S, K'M] @ [K'M, M]``
transpose variant measured slightly worse, 38.3 ms).

Scope: V = 1, state transfer or unitary mode (any taylor_scaling —
squarings run as repeated pre-scaled Taylor applications to the state
block, so no per-seed matrices exist), pulse-only penalties,
constant-weight extra sweep channels.  Used by make_batched_runner as
the large-dim backend where the fused kernels don't fit in VMEM.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..models.costs import CostContext, total_reg_cost
from ..models.forward import INTER_VEC_COSTS
from ..models.system import ControlProblem

HI = lax.Precision.HIGHEST


def xla_cols_supported(problem: ControlProblem,
                       reg_coeffs: Optional[dict]) -> bool:
    if problem.initial_vectors.shape[1] != 1:
        return False
    return not any(k in (reg_coeffs or {}) for k in INTER_VEC_COSTS)


def make_xla_batched_loss(
    problem: ControlProblem,
    reg_coeffs: Optional[dict] = None,
    extra_channel_mats: Optional[np.ndarray] = None,
    remat: bool = True,
):
    """Build ``u_bases [S, K, T] -> (reg_losses [S], fid_losses [S])``.

    ``extra_channel_mats`` ([E, 2N, 2N] real iso) adds fixed operator
    channels with constant per-seed weights ``extra_weights [S, E]``.
    ``remat`` checkpoints each scan step (recompute-in-backward — the
    trajectory at [T, M, S] would otherwise dominate HBM for large M).
    """
    p = problem
    mats_list = [jnp.asarray(p.mats)]
    if extra_channel_mats is not None:
        mats_list.append(jnp.asarray(extra_channel_mats, dtype=jnp.float32))
    mats = jnp.concatenate(mats_list, axis=0)          # [K', M, M]
    Kp = mats.shape[0]
    M = mats.shape[1]
    # horizontal stack [M, K'M] with mats_h[i, k*M+j] = mats[k, i, j]: one
    # deep-contraction matmul per Taylor term (see module docstring)
    mats_h = jnp.reshape(jnp.transpose(mats, (1, 0, 2)), (M, Kp * M))
    psi0 = jnp.asarray(p.initial_vectors)              # [M, 1]
    if not p.state_transfer:
        psi0 = jnp.matmul(jnp.asarray(p.U0_iso), psi0, precision=HI)
    tgt = jnp.asarray(p.target_vectors)                # [M, 1]
    max_amp = jnp.asarray(p.ops_max_amp)
    one_minus_gauss = jnp.asarray(p.one_minus_gauss)
    N = p.state_num
    T = p.steps
    # matvec truncation (powers 0..order-1) for state transfer; unitary
    # mode keeps powers 0..taylor_terms (pallas_batch convention).  With
    # taylor_scaling s > 0, exp(A) = Taylor(A/2^s)^(2^s)
    # (tensorflow_state.py:31,43-44): on the column layout the step is
    # 2^s repeated Taylor applications of the pre-scaled generator to the
    # state block — the matrix squarings never materialize.
    order = p.taylor_terms if p.state_transfer else p.taylor_terms + 1
    scaling = 0 if p.state_transfer else p.taylor_scaling
    reps = 1 << scaling
    csc = 1.0 / reps

    def batched_loss(u_bases: jnp.ndarray,
                     extra_weights: Optional[jnp.ndarray] = None):
        S = u_bases.shape[0]
        ops_weight = jnp.sin(u_bases)                          # [S, Kc, T]
        amps = max_amp[None, :, None] * ops_weight
        chans = [jnp.ones((S, 1, T), dtype=amps.dtype), amps]
        if extra_weights is not None:
            chans.append(jnp.broadcast_to(
                extra_weights[:, :, None].astype(amps.dtype),
                (S, extra_weights.shape[1], T)))
        w = jnp.concatenate(chans, axis=1)                     # [S, K', T]
        w_t = jnp.transpose(w, (2, 1, 0))                      # [T, K', S]

        def step(psi, wt):                                     # psi [M, S]
            for _ in range(reps):
                acc = psi
                pn = psi
                for n in range(1, order):
                    # stacked[k*M+j, s] = pn[j, s] * wt[k, s]
                    stacked = jnp.reshape(pn[None, :, :] * wt[:, None, :],
                                          (Kp * M, S))
                    pn = jnp.matmul(mats_h, stacked, precision=HI) \
                        * (csc / n)
                    acc = acc + pn
                psi = acc
            return psi, None

        body = jax.checkpoint(step) if remat else step
        final, _ = lax.scan(body, jnp.tile(psi0, (1, S)), w_t)

        a, b = final[:N, :], final[N:, :]
        c, d = tgt[:N, 0:1], tgt[N:, 0:1]
        re = jnp.sum(a * c + b * d, axis=0)
        im = jnp.sum(b * c - a * d, axis=0)
        fid_losses = 1.0 - (re * re + im * im)

        reg_losses = fid_losses
        if reg_coeffs:
            def seed_reg(w_s):
                ctx = CostContext(
                    ops_weight=w_s, inter_vecs=None, target_vecs=tgt,
                    state_num=N, steps=T, dt=p.dt, total_time=p.total_time,
                    one_minus_gauss=one_minus_gauss, v_sorted_iso=None,
                )
                return total_reg_cost(ctx, reg_coeffs)

            reg_losses = fid_losses + jax.vmap(seed_reg)(ops_weight)
        return reg_losses, fid_losses

    return batched_loss
