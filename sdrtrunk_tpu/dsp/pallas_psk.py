"""Pallas TPU kernel for decision-directed DQPSK symbol recovery.

The SURVEY's "Pallas tier" for the hard kernel (SURVEY.md §2.1 DQPSK row,
§3.4 hot loops; reference dsp/psk/PSKDemodulator.java:83-109): the
per-sample feedback loop — PLL mix, delay-line shift, polyphase
interpolation, symbol decision, timing/PLL update — runs as a single
Mosaic loop with the whole carried state (delay-line window planes plus
eight per-channel scalars) resident on-chip, instead of an XLA while-loop
whose per-iteration carry round-trips through fusions. Channels ride the
lane dimension ((rows, C) layout, C padded to a lane multiple); the
interpolator-arm lookup is the same exact one-hot (129, C) matmul the XLA
path uses (dsp/psk.py), on the MXU.

The time axis is processed in grid steps of TC samples so Pallas
double-buffers the (TC, C) input/output chunks through VMEM while the
sequential loop runs; carried state lives in scratch across grid steps
(the TPU grid is sequential) and the final state is emitted from the
last step.

Semantics are identical to DQPSKDemodulator._step (same op order, same
clamps); tests/test_pallas_psk.py runs this kernel in Pallas interpret
mode on CPU and asserts dibit/valid/state agreement with the XLA scan,
including carried-state handoff across calls and grid steps.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .interpolator import CENTER, NSTEPS

__all__ = ["dqpsk_pallas_batched"]

_SQRT_HALF = math.sqrt(0.5)
TWO_PI = 2.0 * math.pi

# scalar-state row layout in the (8, C) state plane
_SP, _DSPS, _PH, _FR, _PPRE, _PPIM, _PCRE, _PCIM = range(8)


def _dqpsk_kernel(x_re, x_im, bank, iw_re, iw_im, iscal,
                  out, fw_re, fw_im, fscal,
                  sw_re, sw_im, sscal, *,
                  w: int, tc: int, cfg: dict):
    """One time-chunk of the sequential DQPSK loop (see module docstring).

    cfg: static floats {sps_min, sps_max, g, dsps_gain, alpha, beta,
    max_pll_freq}.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sw_re[:] = iw_re[:]
        sw_im[:] = iw_im[:]
        sscal[:] = iscal[:]

    c = x_re.shape[1]
    bank_t = bank[:]                                   # (8, 129)
    arm_iota = jax.lax.broadcasted_iota(jnp.int32, (NSTEPS + 1, c), 0)

    carry0 = (sw_re[:], sw_im[:],                      # (W, C) window planes
              sscal[0:1], sscal[1:2], sscal[2:3], sscal[3:4],
              sscal[4:5], sscal[5:6], sscal[6:7], sscal[7:8])

    def body(t, carry):
        (win_re, win_im, sp, dsps, ph, fr,
         pp_re, pp_im, pc_re, pc_im) = carry
        xr = x_re[pl.ds(t, 1), :]
        xi = x_im[pl.ds(t, 1), :]

        # --- PLL increment + mix (PSKDemodulator.java:101-110) ---
        phase = ph + fr
        phase = jnp.where(phase > TWO_PI, phase - TWO_PI, phase)
        phase = jnp.where(phase < -TWO_PI, phase + TWO_PI, phase)
        cos_p = jnp.cos(phase)
        sin_p = jnp.sin(phase)
        mr = xr * cos_p - xi * sin_p
        mi = xr * sin_p + xi * cos_p

        win_re = jnp.concatenate([win_re[1:], mr])
        win_im = jnp.concatenate([win_im[1:], mi])
        sp = sp - 1.0
        has = sp < 1.0

        # --- interpolate at mu (one-hot arm select on the MXU) ---
        mu = jnp.clip(sp, 0.0, 1.0)
        idx = jnp.clip((NSTEPS * mu).astype(jnp.int32), 0, NSTEPS)
        onehot = (arm_iota == idx).astype(jnp.float32)        # (129, C)
        taps = jnp.dot(bank_t, onehot,
                       preferred_element_type=jnp.float32)    # (8, C)
        cur_re = jnp.sum(taps * win_re[:8], axis=0, keepdims=True)
        cur_im = jnp.sum(taps * win_im[:8], axis=0, keepdims=True)
        prec_re = win_re[CENTER:CENTER + 1]
        prec_im = win_im[CENTER:CENTER + 1]

        # --- differential decode + normalize ---
        pr = prec_re * pp_re + prec_im * pp_im
        pi_ = prec_im * pp_re - prec_re * pp_im
        cr = cur_re * pc_re + cur_im * pc_im
        ci_ = cur_im * pc_re - cur_re * pc_im
        pm2 = pr * pr + pi_ * pi_
        cm2 = cr * cr + ci_ * ci_
        pqn = jnp.where(pm2 > 1e-24,
                        pi_ * jax.lax.rsqrt(jnp.maximum(pm2, 1e-30)), 0.0)
        inv_c = jax.lax.rsqrt(jnp.maximum(cm2, 1e-30))
        cin = jnp.where(cm2 > 1e-24, cr * inv_c, 0.0)
        cqn = jnp.where(cm2 > 1e-24, ci_ * inv_c, 0.0)

        # --- quadrant decision + errors (DQPSKDecisionDirectedSymbolEvaluator)
        i_pos = cin > 0.0
        q_pos = cqn > 0.0
        dibit = jnp.where(q_pos, jnp.where(i_pos, 0, 1),
                          jnp.where(i_pos, 2, 3)).astype(jnp.int32)
        polarity = jnp.where(i_pos, jnp.where(pqn > cqn, 1.0, -1.0),
                             jnp.where(pqn < cqn, 1.0, -1.0))
        sgn_i = jnp.where(i_pos, 1.0, -1.0)
        sgn_q = jnp.where(q_pos, 1.0, -1.0)
        err = jnp.clip(_SQRT_HALF * (cqn * sgn_i - cin * sgn_q), -0.3, 0.3)
        err = jnp.where(jnp.isnan(err), 0.0, err)
        timing_error = err * polarity

        # --- timing + PLL updates (resetAndAdjust / CostasLoop.adjust) ---
        detected = jnp.clip(dsps + timing_error * cfg["dsps_gain"],
                            cfg["sps_min"], cfg["sps_max"])
        sp_new = sp + detected + timing_error * cfg["g"]
        perr = jnp.clip(-err, -0.5, 0.5)
        freq = fr + cfg["beta"] * perr
        phase2 = phase + freq + cfg["alpha"] * perr
        phase2 = jnp.where(phase2 > TWO_PI, phase2 - TWO_PI, phase2)
        phase2 = jnp.where(phase2 < -TWO_PI, phase2 + TWO_PI, phase2)
        freq = jnp.clip(freq, -cfg["max_pll_freq"], cfg["max_pll_freq"])

        out[pl.ds(t, 1), :] = dibit | (has.astype(jnp.int32) << 2)

        return (win_re, win_im,
                jnp.where(has, sp_new, sp),
                jnp.where(has, detected, dsps),
                jnp.where(has, phase2, phase),
                jnp.where(has, freq, fr),
                jnp.where(has, prec_re, pp_re),
                jnp.where(has, prec_im, pp_im),
                jnp.where(has, cur_re, pc_re),
                jnp.where(has, cur_im, pc_im))

    carry = jax.lax.fori_loop(0, tc, body, carry0)

    (win_re, win_im, sp, dsps, ph, fr, pp_re, pp_im, pc_re, pc_im) = carry
    sw_re[:] = win_re
    sw_im[:] = win_im
    sscal[:] = jnp.concatenate([sp, dsps, ph, fr, pp_re, pp_im,
                                pc_re, pc_im])

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        fw_re[:] = win_re
        fw_im[:] = win_im
        fscal[:] = jnp.concatenate([sp, dsps, ph, fr, pp_re, pp_im,
                                    pc_re, pc_im])


def _pick_chunk(t: int, target: int = 512) -> int:
    """Largest divisor of t that is a multiple of 8 (Mosaic sublane tile)
    and <= target. Grid chunks must tile T exactly — padding would advance
    the carried state on fake samples. Returns 0 when no usable divisor
    exists (caller falls back to the XLA scan)."""
    best = 0
    for d in range(1, int(math.isqrt(t)) + 1):
        if t % d == 0:
            for cand in (d, t // d):
                if cand <= target and cand % 8 == 0 and cand > best:
                    best = cand
    return best


def dqpsk_pallas_batched(demod, x: jnp.ndarray, state, *,
                         interpret: bool = False):
    """Run DQPSKDemodulator semantics over (C, T) complex x via the Pallas
    kernel. state: DQPSKState with leading-C leaves (window (C, W)).
    Returns (dibits (C,T) int32, valid (C,T) bool, new state) exactly like
    DQPSKDemodulator.batched. Returns None if the shape doesn't fit the
    kernel (caller falls back to the XLA scan). interpret=True runs the
    kernel in the Pallas interpreter (CPU agreement tests).
    """
    c, t = x.shape
    tc = _pick_chunk(t)
    if tc < 64:
        return None                 # e.g. T not divisible by 8, or tiny
    w = demod.window_len
    cp = -(-c // 128) * 128                       # pad channels to lanes

    cfg = dict(
        sps_min=demod.samples_per_symbol * (1.0 - demod.max_deviation),
        sps_max=demod.samples_per_symbol * (1.0 + demod.max_deviation),
        g=demod.sample_counter_gain,
        dsps_gain=demod.dsps_gain,
        alpha=demod.alpha, beta=demod.beta,
        max_pll_freq=demod.max_pll_freq,
    )

    pad_c = [(0, cp - c)]
    x_re = jnp.pad(x.real.T.astype(jnp.float32), [(0, 0)] + pad_c)  # (T, Cp)
    x_im = jnp.pad(x.imag.T.astype(jnp.float32), [(0, 0)] + pad_c)
    iw_re = jnp.pad(state.window.real.T.astype(jnp.float32),
                    [(0, 0)] + pad_c)                               # (W, Cp)
    iw_im = jnp.pad(state.window.imag.T.astype(jnp.float32),
                    [(0, 0)] + pad_c)
    # pad lanes carry a real-looking timing state (sps) so their loop
    # arithmetic stays finite; outputs/state for them are sliced away
    scal = jnp.stack([
        state.sampling_point.astype(jnp.float32),
        state.detected_sps.astype(jnp.float32),
        state.pll_phase.astype(jnp.float32),
        state.pll_freq.astype(jnp.float32),
        state.prev_preceding.real.astype(jnp.float32),
        state.prev_preceding.imag.astype(jnp.float32),
        state.prev_current.real.astype(jnp.float32),
        state.prev_current.imag.astype(jnp.float32),
    ])                                                              # (8, C)
    fill = jnp.zeros((8, cp - c), jnp.float32) + jnp.array(
        [[demod.samples_per_symbol], [demod.samples_per_symbol],
         [0.0], [0.0], [0.0], [0.0], [0.0], [0.0]], jnp.float32)
    iscal = jnp.concatenate([scal, fill], axis=1)                   # (8, Cp)
    bank_t = jnp.asarray(np.asarray(demod.bank).T, jnp.float32)     # (8, 129)

    grid = t // tc
    kernel = partial(_dqpsk_kernel, w=w, tc=tc, cfg=cfg)
    full = lambda i: (0, 0)                     # noqa: E731 — constant block
    packed, fw_re, fw_im, fscal = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tc, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NSTEPS + 1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, cp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, cp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cp), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, cp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, cp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cp), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, cp), jnp.int32),
            jax.ShapeDtypeStruct((w, cp), jnp.float32),
            jax.ShapeDtypeStruct((w, cp), jnp.float32),
            jax.ShapeDtypeStruct((8, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((w, cp), jnp.float32),
            pltpu.VMEM((w, cp), jnp.float32),
            pltpu.VMEM((8, cp), jnp.float32),
        ],
    )(x_re, x_im, bank_t, iw_re, iw_im, iscal)

    dibits = (packed[:, :c] & 3).T                                  # (C, T)
    valid = ((packed[:, :c] >> 2) > 0).T
    window = jax.lax.complex(fw_re[:, :c], fw_im[:, :c]).T          # (C, W)
    fs = fscal[:, :c]
    new_state = type(state)(
        window=window.astype(jnp.complex64),
        sampling_point=fs[_SP], detected_sps=fs[_DSPS],
        pll_phase=fs[_PH], pll_freq=fs[_FR],
        prev_preceding=jax.lax.complex(fs[_PPRE], fs[_PPIM]
                                       ).astype(jnp.complex64),
        prev_current=jax.lax.complex(fs[_PCRE], fs[_PCIM]
                                     ).astype(jnp.complex64),
    )
    return dibits, valid, new_state
