"""Fused multi-iteration optimizer kernel for the SEED-BATCHED path.

ops/pallas_mega.py fuses whole Adam segments for ONE problem (time on
lanes).  This kernel does the same for THOUSANDS of independent seeds: the
column (lane) axis carries seeds, the grid tiles them into 128-column
blocks, and each grid program runs ``n_iters`` complete GRAPE iterations
for its block — forward propagation chain (ops/pallas_chain.py layout),
coherent fidelity, exact reverse-mode sweep, and the Adam update — with
the controls, Adam moments, and trajectory resident in VMEM the whole
time.  One kernel launch per segment for the entire seed population.

Per-seed-block VMEM at 512 columns, T=1000: u/m/v + w_s + wbar + traj
~ 37 MB (in/out aliased; vmem_limit raised past the 16 MB scoped
default).  Measured (pi pulse, T=1000, 1024 seeds, TPU v5lite): 830k
seed-iterations/sec vs 218k through the per-iteration XLA+optax batched
path (3.8x) — the pod-scale throughput metric of BASELINE.md.  The
chains use explicit broadcast-FMA matvecs at small M (MXU dot latency
dominates tiny matmuls) and 4-fold time unrolling; the sin/cos of the
pulse parameterization run as one bulk pass per iteration outside the
serial chains.

Hamiltonian sweeps ride the same kernel: extra operator channels with
constant per-seed weights (parallel/pallas_batch.py convention).

Scope: the coherent-fidelity objective plus ALL SEVEN reference
penalties IN-KERNEL — amplitude/envelope/dwdt/d2wdt2 on the normalized
weights, the spectral bandpass cost as per-channel out-of-band DFT
matmuls, and the trajectory-reading forbidden-state and speed_up
penalties on the VMEM-resident trajectory;
up to 8 concerned vectors per seed (V columns per seed group, coherent
inner_product_2D fidelity via in-kernel lane group-sums); state-transfer
problems or unitary problems at ANY taylor_scaling — each squaring runs
as one more pre-scaled Taylor application to the state block (exp(A) =
Taylor(A/2^s)^(2^s), tensorflow_state.py:31,43-44), so multi-seed gate
sweeps with config 2's own smoothness + envelope reg_coeffs
(regularization_functions.py:15-45) stay on the fused path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.system import ControlProblem
from ..ops.pallas_chain import _interpret

_F32 = jnp.float32

_VMEM_BUDGET = 44 * (1 << 20)  # measured fit on TPU v5lite (physical ~64MB)


def _block_vmem_bytes(M: int, T: int, Kc: int, CB: int,
                      pulse: bool = False, env: bool = False,
                      Fp: int = 0, spd: bool = False) -> int:
    """Resident bytes per seed block: u/m/v (aliased in/out), wbar + w_s
    scratch, trajectory, and working vectors; with in-kernel pulse costs
    add the sn/gw/difference temporaries, the padded envelope mask, the
    bandpass DFT matrices + spectra, and the speed_up overlap buffers."""
    M = max(8, M)
    b = 4 * CB * (5 * T * Kc + (T + 1) * M + 8 * M)
    if pulse:
        # The compiler keeps far more than the 3 nominal [T, Kc, CB]
        # temporaries live through the fused fwd+bwd pulse-cost chain
        # (shifted dwdt/d2wdt2 copies, their cotangents, and the fused
        # backward's double-buffering).  Calibrated against a real v5lite
        # compile report: CNOT-class (M=8, T=1000, Kc=3) at CB=256 needed
        # 161.38M against a 128M capacity where this model said 37M; at
        # CB=128 it compiles and runs.  The 9x coefficient makes the
        # block picker's decisions match those measurements.
        b += 4 * CB * 9 * T * Kc
    if env:
        b += 4 * T * 8 * 128                # [T, Kc, 1] mask tile-padded
    if Fp:
        b += 4 * (4 * T * Fp + 4 * Fp * CB)  # DFT mats (+T) and spectra
    if spd:
        b += 4 * CB * 2 * (T + 1)           # per-tau overlap re/im
    return b


def _pick_column_block(M: int, T: int, Kc: int, pulse: bool = False,
                       env: bool = False, Fp: int = 0,
                       spd: bool = False) -> int:
    for cb in (512, 256, 128):
        if _block_vmem_bytes(M, T, Kc, cb, pulse, env, Fp, spd) \
                < _VMEM_BUDGET:
            return cb
    return 0


_BATCH_FORB_KEYS = ("forbidden_coeff_list", "forbidden",
                    "states_forbidden_list", "forbid_dressed")
_BATCH_PULSE_KEYS = ("amplitude", "envelope", "dwdt", "d2wdt2",
                     "bandpass", "band")


def _bandpass_bins(problem: ControlProblem, reg_coeffs) -> np.ndarray:
    """Penalized FFT bin indices (regularization_functions.py:59-65): bins
    [0, band_id0) and [band_id1, steps/2) of the steps-point FFT."""
    band = np.asarray(reg_coeffs["band"], dtype=float)
    band_id = (band * float(problem.total_time)).astype(int)
    return np.concatenate([
        np.arange(0, max(int(band_id[0]), 0)),
        np.arange(int(band_id[1]), int(problem.steps / 2)),
    ])


def _pulse_statics(problem: ControlProblem, reg_coeffs):
    """Static in-kernel parameters for the pulse-shape/spectral penalties
    (same host-side prep as ops/pallas_mega.py:496-561, column layout)."""
    rc = reg_coeffs or {}
    p = problem
    st = {
        "a_amp": float(rc.get("amplitude", 0.0)) / p.steps,
        "a_env": float(rc.get("envelope", 0.0)) / p.steps,
        "a_dwdt": float(rc.get("dwdt", 0.0)) / p.steps,
        "a_d2": float(rc.get("d2wdt2", 0.0)) / p.steps,
        "a_bp": float(rc.get("bandpass", 0.0)) / p.steps,
        "inv_dt": 1.0 / float(p.dt),
        "Fp": 0,
        "bins": None,
    }
    if st["a_bp"]:
        bins = _bandpass_bins(p, rc)
        if bins.size == 0:
            st["a_bp"] = 0.0
        else:
            st["bins"] = bins
            st["Fp"] = max(128, -(-bins.size // 128) * 128)
    st["pulse"] = bool(st["a_amp"] or st["a_env"] or st["a_dwdt"]
                       or st["a_d2"] or st["a_bp"])
    return st


def batched_mega_supported(problem: ControlProblem,
                           reg_coeffs: Optional[dict] = None) -> bool:
    """The fused batched-optimizer kernel covers the coherent fidelity
    objective plus ALL SEVEN reference penalties
    (regularization_functions.py:7-97) IN-KERNEL: the pulse-shape costs
    (amplitude/envelope/dwdt/d2wdt2), the spectral bandpass cost as
    per-channel DFT matmuls on the column layout, and the
    trajectory-reading costs — forbidden-state occupation and speed_up —
    on the VMEM-resident trajectory the backward sweep already stores."""
    rc = reg_coeffs or {}
    if rc:
        if (set(rc) - set(_BATCH_FORB_KEYS) - set(_BATCH_PULSE_KEYS)
                - {"speed_up"}):
            return False
        if "bandpass" in rc and "band" not in rc:
            return False
        traj_keys = tuple(_BATCH_FORB_KEYS) + ("speed_up",)
        if any(k in rc for k in traj_keys) and not problem.use_inter_vecs:
            return False
        if (rc.get("dwdt") or rc.get("d2wdt2")) and problem.steps < 4:
            return False
    if problem.initial_vectors.shape[1] > 8:
        return False
    st = _pulse_statics(problem, rc)
    return _pick_column_block(
        2 * problem.state_num, problem.steps, problem.ops_len,
        st["pulse"], bool(st["a_env"]), st["Fp"],
        bool(rc.get("speed_up"))) > 0


def _roll(x, shift):
    if _interpret():
        return jnp.roll(x, shift, axis=-1)
    if x.ndim == 1:
        # Mosaic's rotate has no 1D lowering ("Unsupported 1D shape");
        # rotate on a [1, C] lane view instead
        return pltpu.roll(x[None, :], shift=shift % x.shape[-1], axis=1)[0]
    return pltpu.roll(x, shift=shift % x.shape[-1], axis=x.ndim - 1)


def _group_sum(x, V):
    """Sum lanes within aligned groups of V columns (V | CB, groups never
    straddle blocks): every column receives its group's total.  Circular
    rolls are safe — the lane%V masks kill cross-group contributions."""
    if V == 1:
        return x
    lane = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) % V
    out = x
    for j in range(1, V):
        out = out + jnp.where(lane < V - j, _roll(x, -j), 0.0)
        out = out + jnp.where(lane >= j, _roll(x, j), 0.0)
    return out


def _matvec(A, x):
    """A [M, M] @ x [M, CB].  For small M an explicit broadcast-FMA chain
    beats the MXU dot (measured 1.4x at M=4, CB=512: the dependent-chain
    latency of tiny matmuls dominates); larger M uses the MXU."""
    M = A.shape[0]
    if M > 16:
        return jnp.dot(A, x, precision=lax.Precision.HIGHEST,
                       preferred_element_type=_F32)
    out = None
    for m_ in range(M):
        term = A[:, m_][:, None] * x[m_][None, :]
        out = term if out is None else out + term
    return out


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _kernel(M, N, V, Kc, E, T, order, scaling, n_iters, unroll, b1, b2,
            eps, rate,
            factor, conv_target, min_grad, max_iterations, forb, forb_c0,
            a_amp, a_env, a_dwdt, a_d2, inv_dt, a_bp, a_spd, spd_c0,
            mats_ref, matsT_ref, maxamp_ref, psi0_ref, tgt_ref, ew_ref,
            env2_ref, dftc_ref, dftcT_ref, dfts_ref, dftsT_ref,
            u_in, m_in, v_in, it_in, done_in,
            u_out, m_out, v_out, it_out, done_out, stats_ref,
            traj, wbar, w_s, spd_ri):
    """One grid program = one seed block, n_iters complete iterations,
    PER-SEED convergence semantics (parallel/batch.py body parity):
    metrics are evaluated at each seed's current iterate, the predicates
    ``loss < conv_target | grad^2 < min_grad | it >= max_iterations``
    freeze that seed (controls, moments, per-seed iteration count and
    decayed LR all stop), and the rest of the block keeps stepping.

    u/m/v layout [T, Kc, CB] (time-major — matches the wbar the backward
    sweep produces, so Adam is pure elementwise).  mats rows: 0 = drift,
    1..Kc = controls, Kc+1..Kc+E = extra sweep channels with constant
    per-seed weights ew [E, CB].  The physical weights sin(u)*maxA are
    precomputed for ALL timesteps into w_s once per iteration (bulk VPU
    work) so the serial chains carry no transcendentals; time steps are
    unrolled ``unroll``-fold to amortize loop/slice overhead.
    """
    u_out[:] = u_in[:]
    m_out[:] = m_in[:]
    v_out[:] = v_in[:]
    it_out[:] = it_in[:]
    done_out[:] = done_in[:]

    maxamp = maxamp_ref[:]                       # [Kc, 1]
    psi0 = psi0_ref[:]                           # [M, CB]
    ta, tb = tgt_ref[:N, :], tgt_ref[N:, :]      # [N, CB]
    ln_b1, ln_b2, ln_f = np.log(b1), np.log(b2), np.log(factor)
    # taylor_scaling s > 0 (unitary mode): exp(A) = Taylor(A/2^s)^(2^s)
    # (tensorflow_state.py:31,43-44) — on the column layout each squaring
    # is one more Taylor application of the pre-scaled generator to the
    # state block; no [M, M] step matrix ever exists.
    reps = 1 << scaling
    csc = 1.0 / reps

    def apply_A(k_weights, x, mref):
        # A x with A = mats[0] + sum_k wk[k]*mats[1+k] + sum_e ew[e]*mats[..]
        y = _matvec(mref[0], x)
        for k in range(Kc):
            y = y + k_weights[k][None, :] * _matvec(mref[1 + k], x)
        for e in range(E):
            y = y + ew_ref[e][None, :] * _matvec(mref[1 + Kc + e], x)
        return y

    def forb_rows(psi):
        """Per forbidden term: (alpha, phi_s, phi_ns) projections of a state
        block [M, CB] onto the (optionally dressed) level rows."""
        out = []
        for alpha, rs, rns in forb:
            phi_s = psi[0] * 0.0
            phi_ns = psi[0] * 0.0
            for j in range(M):
                if rs[j]:
                    phi_s = phi_s + rs[j] * psi[j]
                if rns[j]:
                    phi_ns = phi_ns + rns[j] * psi[j]
            out.append((alpha, phi_s, phi_ns))
        return out

    def forb_penalty(psi, pen):
        for alpha, phi_s, phi_ns in forb_rows(psi):
            pop = phi_s * phi_s + phi_ns * phi_ns        # [CB]
            pen = pen + alpha * 0.5 * pop * pop
        return pen

    def forb_cotangent(psi, pbar):
        """pbar += dPenalty/dpsi for one stored trajectory block."""
        rows = [None] * M
        for (alpha, rs, rns), (_, phi_s, phi_ns) in zip(forb, forb_rows(psi)):
            pop = phi_s * phi_s + phi_ns * phi_ns
            pb_s = (2.0 * alpha) * pop * phi_s
            pb_ns = (2.0 * alpha) * pop * phi_ns
            for j in range(M):
                add = None
                if rs[j]:
                    add = rs[j] * pb_s
                if rns[j]:
                    t2 = rns[j] * pb_ns
                    add = t2 if add is None else add + t2
                if add is not None:
                    rows[j] = add if rows[j] is None else rows[j] + add
        return pbar + jnp.stack(
            [rows[j] if rows[j] is not None else psi[0] * 0.0
             for j in range(M)], axis=0)

    has_pulse = bool(a_amp or a_env or a_dwdt or a_d2 or a_bp)
    HI = lax.Precision.HIGHEST
    T1f = float(T + 1)
    inv_v2 = 1.0 / (V * V)

    def spd_overlap(psi):
        """Group-coherent overlap of a state block with the target
        (inner_product_3D per-tau term, tensorflow_state.py:302-321):
        re/im [CB], every column holding its seed group's total."""
        fa, fb = psi[:N, :], psi[N:, :]
        re = _group_sum(jnp.sum(fa * ta + fb * tb, axis=0), V)
        im = _group_sum(jnp.sum(fb * ta - fa * tb, axis=0), V)
        return re, im

    def tshift(x, s):
        """Shift along the (leading) time axis, zero-filled: tshift(x, 1)
        = x_{t-1} with x_{-1} = 0 (the reference's 2-zero padding of the
        pulse, regularization_functions.py:29-31, on the column layout)."""
        z = x[: abs(s)] * 0.0
        if s > 0:
            return jnp.concatenate([z, x[:-s]], axis=0)
        return jnp.concatenate([x[-s:], z], axis=0)

    def pulse_penalties(u):
        """(pen [CB], gw [T, Kc, CB]): the reference's pulse-shape and
        spectral penalties (regularization_functions.py:15-67) on the
        normalized weights sin(base), with analytic gradients — the same
        in-kernel math as ops/pallas_mega.py:139-178 restated time-major.
        Columns within a seed group replicate the controls, so every
        column computes its seed's full penalty value and gradient."""
        sn = jnp.sin(u)                                   # [T, Kc, CB]
        pen = jnp.zeros_like(u[0, 0, :])                  # [CB]
        gw = jnp.zeros_like(sn)
        if a_amp:
            pen = pen + a_amp * 0.5 * jnp.sum(sn * sn, axis=(0, 1))
            gw = gw + a_amp * sn
        if a_env:
            e2 = env2_ref[:]                              # [T, Kc, 1]
            pen = pen + a_env * 0.5 * jnp.sum(e2 * sn * sn, axis=(0, 1))
            gw = gw + a_env * e2 * sn
        if a_dwdt:
            d = (sn - tshift(sn, 1)) * inv_dt
            # boundary difference d_T = -w_{T-1}/dt (the trailing zero pad)
            tail = sn[T - 1] * inv_dt                     # [Kc, CB]
            pen = pen + a_dwdt * 0.5 * (
                jnp.sum(d * d, axis=(0, 1)) + jnp.sum(tail * tail, axis=0))
            gw = gw + (a_dwdt * inv_dt * inv_dt) * (
                2.0 * sn - tshift(sn, 1) - tshift(sn, -1))
        if a_d2:
            idt2 = inv_dt * inv_dt
            s2 = (sn - 2.0 * tshift(sn, 1) + tshift(sn, 2)) * idt2
            # boundary rows at t = T, T+1 from the trailing zero pad
            s2_t = (sn[T - 2] - 2.0 * sn[T - 1]) * idt2   # [Kc, CB]
            s2_t1 = sn[T - 1] * idt2
            s2e = jnp.concatenate(
                [s2, s2_t[None], s2_t1[None]], axis=0)    # [T+2, Kc, CB]
            pen = pen + a_d2 * 0.5 * jnp.sum(s2e * s2e, axis=(0, 1))
            gw = gw + (a_d2 * idt2) * (
                s2e[0:T] - 2.0 * s2e[1:T + 1] + s2e[2:T + 2])
        if a_bp:
            # per-channel DFT matmuls over the penalized out-of-band bins
            # (ops/pallas_mega.py:163-178 semantics, time on the
            # contraction axis): spectrum [Fp, CB] per control channel
            gcols = []
            for k in range(Kc):
                snk = sn[:, k, :]                         # [T, CB]
                re_f = jnp.dot(dftcT_ref[:], snk, precision=HI)
                im_f = -jnp.dot(dftsT_ref[:], snk, precision=HI)
                mag = jnp.sqrt(re_f * re_f + im_f * im_f)
                pen = pen + a_bp * jnp.sum(mag, axis=0)
                inv = jnp.where(mag > 0.0,
                                1.0 / jnp.maximum(mag, 1e-30), 0.0)
                gcols.append(
                    jnp.dot(dftc_ref[:], re_f * inv, precision=HI)
                    - jnp.dot(dfts_ref[:], im_f * inv, precision=HI))
            gw = gw + a_bp * jnp.stack(gcols, axis=1)     # [T, Kc, CB]
        return pen, gw

    def iteration(i, _):
        # physical weights for every timestep, one bulk elementwise pass
        w_s[:] = maxamp[None, :, 0:1] * jnp.sin(u_out[:])

        # ---------------- forward chain ----------------
        traj[0] = psi0
        if a_spd:
            # tau=0 is the constant c0 term; zero the row so the backward
            # read at t=0 adds nothing (scratch is uninitialized)
            spd_ri[pl.ds(0, 1)] = jnp.zeros_like(spd_ri[pl.ds(0, 1)])

        def fstep(tt, carry):
            psi, pen, ip3 = carry
            t0 = tt * unroll
            wts = w_s[pl.ds(t0, unroll)]          # [unroll, Kc, CB]
            for s in range(unroll):
                wt = [wts[s, k, :] for k in range(Kc)]
                acc = psi
                for _ in range(reps):
                    pn = acc
                    y = acc
                    for n in range(1, order):
                        pn = apply_A(wt, pn, mats_ref) * (csc / n)
                        y = y + pn
                    acc = y
                traj[pl.ds(t0 + s + 1, 1)] = acc[None]
                if forb:
                    pen = forb_penalty(acc, pen)
                if a_spd:
                    # per-tau coherent target overlap, stored for the
                    # backward cotangent (tau = t0+s+1 in 1..T)
                    sre, sim = spd_overlap(acc)
                    spd_ri[pl.ds(t0 + s + 1, 1)] = jnp.stack(
                        [sre, sim])[None]
                    ip3 = ip3 + (sre * sre + sim * sim) * inv_v2
                psi = acc
            return psi, pen, ip3

        psiT, pen, ip3acc = lax.fori_loop(
            0, T // unroll, fstep,
            (psi0, psi0[0] * 0.0, psi0[0] * 0.0))

        # -------- coherent fidelity per seed group (V columns) --------
        # get_inner_product_2D semantics: the per-column overlaps sum
        # coherently within a seed's V columns, |.|^2 / V^2.
        fa, fb = psiT[:N, :], psiT[N:, :]
        re = _group_sum(jnp.sum(fa * ta + fb * tb, axis=0), V)   # [CB]
        im = _group_sum(jnp.sum(fb * ta - fa * tb, axis=0), V)
        loss = 1.0 - (re * re + im * im) * (1.0 / (V * V))       # [CB]
        gr = (-2.0 / (V * V)) * re[None, :]
        gi = (-2.0 / (V * V)) * im[None, :]
        gbar = jnp.concatenate(
            [gr * ta - gi * tb, gr * tb + gi * ta], axis=0)  # [M, CB]
        if forb:
            # direct penalty cotangent at the final state (tau = T)
            gbar = forb_cotangent(psiT, gbar)
        if a_spd:
            # speed_up (regularization_functions.py:88-95): reward target
            # overlap at EVERY tau; penalty a_spd/2 (T+1 - ip3)^2 with
            # ip3 = c0 + sum_tau |overlap_tau|^2 / V^2
            ip3 = spd_c0 + ip3acc                               # [CB]
            pen_spd = a_spd * 0.5 * (T1f - ip3) * (T1f - ip3)
            s_spd = (-2.0 * a_spd * inv_v2) * (T1f - ip3)       # [CB]
            tgt_full = tgt_ref[:]
            tgt_im = jnp.concatenate([-tb, ta], axis=0)         # [M, CB]
            row_t = spd_ri[pl.ds(T, 1)][0]                      # [2, CB]
            gbar = gbar + s_spd[None, :] * (
                row_t[0][None, :] * tgt_full
                + row_t[1][None, :] * tgt_im)
        else:
            pen_spd = jnp.float32(0.0)

        # ---------------- backward chain ----------------
        def bstep(jj, pbar):
            t0 = T - (jj + 1) * unroll
            wts = w_s[pl.ds(t0, unroll)]
            for s in range(unroll - 1, -1, -1):
                t = t0 + s
                wt = [wts[s, k, :] for k in range(Kc)]
                psi = traj[pl.ds(t, 1)][0]

                # sub-states y_0..y_{reps-1}: inputs of each of the 2^s
                # Taylor applications inside this timestep
                subs = [psi]
                for _ in range(reps - 1):
                    pn = subs[-1]
                    y = subs[-1]
                    for n in range(1, order):
                        pn = apply_A(wt, pn, mats_ref) * (csc / n)
                        y = y + pn
                    subs.append(y)

                # reverse sweep through the reps applications:
                # wbar[t] for control channels only
                wk = [jnp.zeros_like(pbar[0])] * Kc
                pb_step = pbar
                for r in range(reps - 1, -1, -1):
                    # replay p_0..p_{order-1} of application r
                    ps = [subs[r]]
                    pn = subs[r]
                    for n in range(1, order):
                        pn = apply_A(wt, pn, mats_ref) * (csc / n)
                        ps.append(pn)
                    pb = pb_step
                    for n in range(order - 1, 0, -1):
                        pm1 = ps[n - 1]
                        cn = csc / n
                        for k in range(Kc):
                            wk[k] = wk[k] + jnp.sum(
                                pb * _matvec(mats_ref[1 + k], pm1),
                                axis=0) * cn
                        pb = pb_step + apply_A(wt, pb, matsT_ref) * cn
                    pb_step = pb
                wbar[pl.ds(t, 1)] = jnp.stack(wk)[None]
                if forb:
                    # direct penalty cotangent at tau = t (the t=0 term only
                    # feeds the discarded psi0 cotangent — harmless)
                    pb_step = forb_cotangent(psi, pb_step)
                if a_spd:
                    # stored overlap at tau = t (row 0 is zeroed: the t=0
                    # term is constant and its cotangent is discarded)
                    row = spd_ri[pl.ds(t, 1)][0]
                    pb_step = pb_step + s_spd[None, :] * (
                        row[0][None, :] * tgt_full
                        + row[1][None, :] * tgt_im)
                pbar = pb_step
            return pbar

        lax.fori_loop(0, T // unroll, bstep, gbar)

        # -------- per-seed gradient norm + convergence test --------
        # columns within a seed group carry replicated controls; the
        # seed's gradient is the group total, broadcast back to each.
        # Pulse-penalty gradients are per-seed values computed identically
        # in every replica column — added once per column, NOT group-summed
        # (ops/pallas_mega.py:268 g = (wbar*maxamp + gw) * cos(u)).
        u = u_out[:]
        if has_pulse:
            pen_p, gw_p = pulse_penalties(u)
            g = (_group_sum(wbar[:], V) * maxamp[None, :, 0:1] + gw_p) \
                * jnp.cos(u)
        else:
            pen_p = jnp.float32(0.0)
            g = _group_sum(wbar[:], V) * (maxamp[None, :, 0:1] * jnp.cos(u))
        g2 = 0.5 * jnp.sum(jnp.sum(g * g, axis=0), axis=0)   # [CB]
        g2 = g2 * (1.0 / V)  # replicas each counted the full seed norm
        it = it_out[0, :]                                    # [CB]
        converged = jnp.logical_or(
            loss < conv_target,
            jnp.logical_or(g2 < min_grad, it >= max_iterations),
        )
        done = jnp.maximum(done_out[0, :],
                           converged.astype(_F32))           # [CB]
        do = (1.0 - done)[None, None, :]
        stats_ref[0, :] = loss
        stats_ref[1, :] = g2
        # reg_loss per seed: fidelity + forbidden penalty summed over the
        # seed's V vector columns + the constant psi0 (tau=0) term + the
        # pulse-shape/spectral and speed_up penalties (replicated per
        # column — ip3 carries the group total in every replica)
        stats_ref[2, :] = (loss + _group_sum(pen, V) + forb_c0 + pen_p
                           + pen_spd)

        # -------- Adam (optax semantics), frozen seeds masked --------
        mm = b1 * m_out[:] + (1.0 - b1) * g
        vv = b2 * v_out[:] + (1.0 - b2) * (g * g)
        cnt = it + 1.0
        lr = rate * jnp.exp(ln_f * it)                       # [CB]
        bc1 = 1.0 - jnp.exp(cnt * ln_b1)
        bc2 = 1.0 - jnp.exp(cnt * ln_b2)
        upd = (mm / bc1[None, None, :]) / (
            jnp.sqrt(vv / bc2[None, None, :]) + eps)
        u_out[:] = u - do * (lr[None, None, :] * upd)
        m_out[:] = m_out[:] + do * (mm - m_out[:])
        v_out[:] = v_out[:] + do * (vv - v_out[:])
        it_out[0, :] = it + (1.0 - done)
        done_out[0, :] = done
        return 0

    lax.fori_loop(0, n_iters, iteration, 0)


@functools.lru_cache(maxsize=32)
def _build_call(M, N, V, Kc, E, T, order, scaling, n_iters, CB, G,
                b1, b2, eps, rate, factor,
                conv_target, min_grad, max_iterations,
                forb=(), forb_c0=0.0,
                a_amp=0.0, a_env=0.0, a_dwdt=0.0, a_d2=0.0, inv_dt=1.0,
                a_bp=0.0, Fp=0, a_spd=0.0, spd_c0=0.0):
    K = Kc + 1 + E
    unroll = 4 if T % 4 == 0 else (2 if T % 2 == 0 else 1)
    kernel = functools.partial(
        _kernel, M, N, V, Kc, E, T, order, scaling, n_iters, unroll, b1, b2,
        eps,
        rate, factor, conv_target, min_grad, max_iterations, forb, forb_c0,
        a_amp, a_env, a_dwdt, a_d2, inv_dt, a_bp, a_spd, spd_c0)
    C = G * CB

    def cols3(i):
        return (0, 0, i)

    def cols2(i):
        return (0, i)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    # column-independent penalty statics (dummy tiles when inactive)
    env2_shape = (T, Kc, 1) if a_env else (1, 8, 128)
    dft_shape = (T, Fp) if a_bp else (8, 128)
    dftT_shape = (Fp, T) if a_bp else (8, 128)

    big = pl.BlockSpec((T, Kc, CB), cols3, memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, CB), cols2, memory_space=pltpu.VMEM)
    grid_call = pl.pallas_call(
        kernel,
        grid=(G,),
        out_shape=(
            jax.ShapeDtypeStruct((T, Kc, C), _F32),
            jax.ShapeDtypeStruct((T, Kc, C), _F32),
            jax.ShapeDtypeStruct((T, Kc, C), _F32),
            jax.ShapeDtypeStruct((1, C), _F32),
            jax.ShapeDtypeStruct((1, C), _F32),
            jax.ShapeDtypeStruct((3, C), _F32),
        ),
        in_specs=[
            fixed((K, M, M)),
            fixed((K, M, M)),
            fixed((Kc, 1)),
            pl.BlockSpec((M, CB), cols2, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, CB), cols2, memory_space=pltpu.VMEM),
            pl.BlockSpec((max(E, 1), CB), cols2, memory_space=pltpu.VMEM),
            fixed(env2_shape),
            fixed(dft_shape), fixed(dftT_shape),
            fixed(dft_shape), fixed(dftT_shape),
            big, big, big, row, row,
        ],
        out_specs=(
            big, big, big, row, row,
            pl.BlockSpec((3, CB), cols2, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((T + 1, M, CB), _F32),
            pltpu.VMEM((T, Kc, CB), _F32),
            pltpu.VMEM((T, Kc, CB), _F32),
            # per-tau speed_up overlaps (dummy row when inactive)
            pltpu.VMEM((T + 1 if a_spd else 1, 2, CB), _F32),
        ],
        # state tensors are updated in place across the segment — alias
        # inputs to outputs (halves streamed VMEM blocks + HBM footprint)
        input_output_aliases={11: 0, 12: 1, 13: 2, 14: 3, 15: 4},
        compiler_params=pltpu.CompilerParams(
            # default scoped-vmem budget is 16 MB; the resident optimizer
            # state (u/m/v + trajectory + wbar at 512 columns) needs ~37 MB
            # of the chip's physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )
    return grid_call


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------


class MegaBatchState(NamedTuple):
    u_cols: jnp.ndarray   # [T, Kc, C] controls, time-major column layout
    m_cols: jnp.ndarray
    v_cols: jnp.ndarray
    it_cols: jnp.ndarray       # [1, C] per-seed applied-update counts
    done_cols: jnp.ndarray     # [1, C] per-seed frozen flags (0/1)
    iteration: int             # global kernel-iterations driven so far
    losses: Optional[jnp.ndarray]        # [S] after the first segment
    grad_squared: Optional[jnp.ndarray]  # [S]
    reg_losses: Optional[jnp.ndarray] = None  # [S] loss + penalties


def make_mega_batched_runner(
    problem: ControlProblem,
    conv,
    extra_channel_mats: Optional[np.ndarray] = None,
    mesh=None,
    throughput: bool = False,
    reg_coeffs: Optional[dict] = None,
):
    """(init_state, run_n, read_u) — batched Adam segments with PER-SEED
    convergence freezing (parallel/batch.py semantics) in one kernel
    launch per segment.

    ``init_state(u_bases [S, Kc, T])``; ``run_n(state, n, extra_weights
    [S, E])`` drives n kernel iterations (frozen seeds stay frozen);
    ``read_u(state) -> [S, Kc, T]``.  ``throughput=True`` disables the
    convergence predicates (fixed-count benchmarking).

    With ``mesh`` (a 1-D jax.sharding.Mesh over the seed axis), the kernel
    runs under ``shard_map``: every device executes its local seed shard —
    zero collectives in the hot loop (seeds are independent; this is the
    SURVEY section 2.7 pod layer with the fused kernel as the per-device
    engine).  Multi-host pods work the same way after
    ``jax.distributed.initialize``.
    """
    from ..ops.pallas_mega import forbidden_static

    p = problem
    if not batched_mega_supported(p, reg_coeffs):
        raise ValueError("problem outside the fused batched-optimizer scope")
    forb, forb_c0 = forbidden_static(p, reg_coeffs)
    M = 2 * p.state_num
    N = p.state_num
    T = p.steps
    Kc = p.ops_len
    mats_list = [np.asarray(p.mats, dtype=np.float32)]
    E = 0
    if extra_channel_mats is not None:
        mats_list.append(np.asarray(extra_channel_mats, dtype=np.float32))
        E = mats_list[1].shape[0]
    mats = jnp.asarray(np.concatenate(mats_list, axis=0))
    matsT = jnp.asarray(np.swapaxes(np.concatenate(mats_list, axis=0),
                                    -1, -2))
    psi0_1 = np.asarray(p.initial_vectors, dtype=np.float32)  # [M, V]
    if not p.state_transfer:
        psi0_1 = np.asarray(p.U0_iso, dtype=np.float32) @ psi0_1
    tgt_1 = np.asarray(p.target_vectors, dtype=np.float32)
    V = psi0_1.shape[1]
    maxamp = jnp.asarray(
        np.asarray(p.ops_max_amp, dtype=np.float32).reshape(Kc, 1))
    order = p.taylor_terms if p.state_transfer else p.taylor_terms + 1
    scaling = 0 if p.state_transfer else p.taylor_scaling
    factor = float(np.exp(-1.0 / float(conv.learning_rate_decay)))

    # ---- pulse-shape/spectral penalty statics (column layout) ----
    ps = _pulse_statics(p, reg_coeffs)
    if ps["a_env"]:
        env2_h = np.ascontiguousarray(
            (np.asarray(p.one_minus_gauss, dtype=np.float32) ** 2).T
        )[:, :, None]                                      # [T, Kc, 1]
    else:
        env2_h = np.zeros((1, 8, 128), np.float32)
    if ps["a_bp"]:
        bins = ps["bins"]
        ang = (2.0 * np.pi * np.arange(T)[:, None] * bins[None, :]
               / float(T))
        F = bins.size
        Fp = ps["Fp"]
        dftc_h = np.zeros((T, Fp), np.float32)
        dfts_h = np.zeros((T, Fp), np.float32)
        dftc_h[:, :F] = np.cos(ang)
        dfts_h[:, :F] = np.sin(ang)
    else:
        dftc_h = dfts_h = np.zeros((8, 128), np.float32)
    env2 = jnp.asarray(env2_h)
    dftc = jnp.asarray(dftc_h)
    dfts = jnp.asarray(dfts_h)
    dftcT = jnp.asarray(np.ascontiguousarray(dftc_h.T))
    dftsT = jnp.asarray(np.ascontiguousarray(dfts_h.T))

    # speed_up statics: the constant tau=0 (RAW psi0) overlap term
    # (ops/pallas_mega.py:563-577 — inter_vecs[0] is the raw initial
    # vectors in both modes, tensorflow_state.py:230-236)
    a_spd = float((reg_coeffs or {}).get("speed_up", 0.0)) / p.steps
    if a_spd:
        iv0 = np.asarray(p.initial_vectors, dtype=np.float64)
        tv = np.asarray(p.target_vectors, dtype=np.float64)
        Nc_ = p.state_num
        Vv = iv0.shape[1]
        re0 = float(np.sum(iv0[:Nc_] * tv[:Nc_])
                    + np.sum(iv0[Nc_:] * tv[Nc_:]))
        im0 = float(np.sum(iv0[Nc_:] * tv[:Nc_])
                    - np.sum(iv0[:Nc_] * tv[Nc_:]))
        spd_c0 = (re0 * re0 + im0 * im0) / float(Vv * Vv)
    else:
        spd_c0 = 0.0
    if throughput:
        conv_target, min_grad, max_iterations = -1.0, -1.0, float(2 ** 30)
    else:
        conv_target = float(conv.conv_target)
        min_grad = float(conv.min_grad)
        max_iterations = float(conv.max_iterations)

    def init_state(u_bases) -> MegaBatchState:
        u = np.asarray(u_bases, dtype=np.float32)       # [S, Kc, T]
        u_cols = np.transpose(u, (2, 1, 0))             # [T, Kc, S]
        # V columns per seed, seed-major (c = seed*V + v); controls are
        # replicated within each group and evolve identically
        u_cols = np.repeat(u_cols, V, axis=2)           # [T, Kc, S*V]
        C = u_cols.shape[2]
        return MegaBatchState(
            u_cols=u_cols, m_cols=np.zeros_like(u_cols),
            v_cols=np.zeros_like(u_cols),
            it_cols=np.zeros((1, C), dtype=np.float32),
            done_cols=np.zeros((1, C), dtype=np.float32),
            iteration=0, losses=None, grad_squared=None,
        )

    _seg_cache: dict = {}

    def _sharded_seg(n: int, C: int):
        """jit(shard_map(kernel)) — or plain jit — for this segment size.
        ``C`` is the total COLUMN count (seeds x V)."""
        key = (int(n), C)
        if key in _seg_cache:
            return _seg_cache[key]
        D = mesh.size if mesh is not None else 1
        if C % (D * V) != 0:
            raise ValueError(
                f"column count {C} not divisible by mesh size {D} x V={V}")
        C_loc = C // D
        CB = min(_pick_column_block(M, T, Kc, ps["pulse"],
                                    bool(ps["a_env"]), ps["Fp"],
                                    bool(a_spd)), C_loc)
        CB -= CB % V   # seed groups must not straddle block boundaries
        if C_loc % CB != 0:
            raise ValueError(
                f"per-device column count {C_loc} must be a multiple of "
                f"{CB} (pad the seed axis)")
        call = _build_call(M, N, V, Kc, E, T, order, scaling, int(n), CB,
                           C_loc // CB,
                           0.9, 0.999, 1e-8, float(conv.rate), factor,
                           conv_target, min_grad, max_iterations,
                           forb, forb_c0,
                           ps["a_amp"], ps["a_env"], ps["a_dwdt"],
                           ps["a_d2"], ps["inv_dt"], ps["a_bp"], ps["Fp"],
                           a_spd, spd_c0)
        if mesh is None:
            fn = jax.jit(call)
        else:
            from jax.sharding import PartitionSpec as P

            axis = mesh.axis_names[0]
            rep = P()
            col2 = P(None, axis)
            col3 = P(None, None, axis)
            fn = jax.jit(jax.shard_map(
                call, mesh=mesh,
                in_specs=(rep, rep, rep, col2, col2, col2,
                          rep, rep, rep, rep, rep,
                          col3, col3, col3, col2, col2),
                out_specs=(col3, col3, col3, col2, col2, col2),
                check_vma=False,
            ))
        _seg_cache[key] = fn
        return fn

    def run_n(state: MegaBatchState, n: int,
              extra_weights: Optional[np.ndarray] = None) -> MegaBatchState:
        C = state.u_cols.shape[2]
        S = C // V
        seg = _sharded_seg(int(n), C)
        psi0 = jnp.asarray(np.tile(psi0_1, (1, S)))   # [M, S*V] seed-major
        tgt = jnp.asarray(np.tile(tgt_1, (1, S)))
        if E:
            ew = jnp.asarray(np.repeat(
                np.asarray(extra_weights, dtype=np.float32).T, V, axis=1))
        else:
            ew = jnp.zeros((1, C), dtype=_F32)
        u, m, v, it, done, stats = seg(
            mats, matsT, maxamp, psi0, tgt, ew,
            env2, dftc, dftcT, dfts, dftsT,
            jnp.asarray(state.u_cols), jnp.asarray(state.m_cols),
            jnp.asarray(state.v_cols), jnp.asarray(state.it_cols),
            jnp.asarray(state.done_cols),
        )
        return MegaBatchState(
            u_cols=u, m_cols=m, v_cols=v, it_cols=it, done_cols=done,
            iteration=state.iteration + int(n),
            losses=stats[0, ::V], grad_squared=stats[1, ::V],
            reg_losses=stats[2, ::V],
        )

    def read_u(state: MegaBatchState) -> np.ndarray:
        return np.transpose(np.asarray(state.u_cols)[:, :, ::V], (2, 1, 0))

    return init_state, run_n, read_u
