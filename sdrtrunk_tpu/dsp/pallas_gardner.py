"""Pallas TPU kernel for Gardner-timed DQPSK symbol recovery (LSM /
P25 Phase 2 HDQPSK).

Companion to dsp/pallas_psk.py (decision-directed): same Mosaic
structure — channels on lanes, (W, C) window planes + per-channel scalar
rows carried in scratch across sequential grid steps — with the Gardner
demodulator's semantics (dsp/psk.py GardnerDQPSKDemodulator, mirroring
DQPSKGardnerDemodulator.java:30-88 / DQPSKGardnerSymbolEvaluator.java:
63-106):

  * TWO interpolation points per symbol: the Gardner mid-point at mu and
    the symbol point half a detected symbol period into the window;
  * the symbol point's integer base slides per channel, so the 8-tap
    window fetch is a one-hot select over the statically-feasible base
    shifts (no per-lane dynamic slice on TPU; the feasible set is 2-3
    shifts, see GardnerDQPSKDemodulator.mid_bases/cur_bases), exactly
    like the XLA scan's _interp;
  * Gardner TED drives timing, the quadrant decision + de-rotated
    quadrature of the symbol sample drives the PLL.

tests/test_pallas_gardner.py runs this kernel in interpret mode on CPU
and asserts dibit/valid/state agreement with the XLA scan, including
state handoff across calls and grid steps.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .interpolator import NSTEPS
from .pallas_psk import _pick_chunk

__all__ = ["gardner_pallas_batched"]

_SQRT_HALF = math.sqrt(0.5)
TWO_PI = 2.0 * math.pi

# scalar-state row layout in the (10, C) state plane
(_SP, _DSPS, _PH, _FR, _PMRE, _PMIM, _PCRE, _PCIM, _PSRE,
 _PSIM) = range(10)


def _gardner_kernel(x_re, x_im, bank, iw_re, iw_im, iscal,
                    out, fw_re, fw_im, fscal,
                    sw_re, sw_im, sscal, *,
                    w: int, tc: int, cfg: dict):
    """One time-chunk of the sequential Gardner loop."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sw_re[:] = iw_re[:]
        sw_im[:] = iw_im[:]
        sscal[:] = iscal[:]

    c = x_re.shape[1]
    bank_t = bank[:]                                   # (8, 129)
    arm_iota = jax.lax.broadcasted_iota(jnp.int32, (NSTEPS + 1, c), 0)

    def interp(win_re, win_im, offset, bases):
        """8-tap interpolate at fractional `offset` into the window:
        integer part one-hot selects the base shift, fractional part
        one-hot selects the polyphase arm (both exact selections).
        `bases` is the static tuple of feasible integer offsets (see
        GardnerDQPSKDemodulator.__post_init__) — at P25P2's 16-sample
        window it cuts the select loop from 9 shifts to 2-3."""
        k = jnp.floor(offset).astype(jnp.int32)
        mu = offset - k.astype(jnp.float32)
        base = jnp.clip(k, 0, w - 8)                   # (1, C)
        onehot = (arm_iota == jnp.clip(
            (NSTEPS * mu).astype(jnp.int32), 0, NSTEPS)
        ).astype(jnp.float32)                          # (129, C)
        taps = jnp.dot(bank_t, onehot,
                       preferred_element_type=jnp.float32)  # (8, C)
        acc_re = jnp.zeros((1, c), jnp.float32)
        acc_im = jnp.zeros((1, c), jnp.float32)
        for b in bases:
            sel = (base == b).astype(jnp.float32)      # (1, C)
            acc_re += sel * jnp.sum(taps * win_re[b:b + 8], axis=0,
                                    keepdims=True)
            acc_im += sel * jnp.sum(taps * win_im[b:b + 8], axis=0,
                                    keepdims=True)
        return acc_re, acc_im

    carry0 = (sw_re[:], sw_im[:],
              sscal[0:1], sscal[1:2], sscal[2:3], sscal[3:4],
              sscal[4:5], sscal[5:6], sscal[6:7], sscal[7:8],
              sscal[8:9], sscal[9:10])

    def body(t, carry):
        (win_re, win_im, sp, dsps, ph, fr,
         pm_re, pm_im, pc_re, pc_im, ps_re, ps_im) = carry
        xr = x_re[pl.ds(t, 1), :]
        xi = x_im[pl.ds(t, 1), :]

        # --- PLL increment + mix ---
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

        mu = jnp.clip(sp, 0.0, 1.0)
        mid_re, mid_im = interp(win_re, win_im, mu, cfg["mid_bases"])
        cur_re, cur_im = interp(win_re, win_im, dsps * 0.5,
                                cfg["cur_bases"])

        # --- differential decode + normalize (both points) ---
        def diff_norm(s_re, s_im, p_re, p_im):
            dr = s_re * p_re + s_im * p_im
            di = s_im * p_re - s_re * p_im
            m2 = dr * dr + di * di
            inv = jax.lax.rsqrt(jnp.maximum(m2, 1e-30))
            good = m2 > 1e-24
            return (jnp.where(good, dr * inv, 0.0),
                    jnp.where(good, di * inv, 0.0))

        ms_re, ms_im = diff_norm(mid_re, mid_im, pm_re, pm_im)
        cs_re, cs_im = diff_norm(cur_re, cur_im, pc_re, pc_im)

        # --- Gardner TED (DQPSKGardnerSymbolEvaluator.setSymbols) ---
        terr = (ps_re - cs_re) * ms_re + (ps_im - cs_im) * ms_im
        terr = jnp.clip(jnp.where(jnp.isnan(terr), 0.0, terr), -0.3, 0.3)

        # --- quadrant decision + phase error ---
        i_pos = cs_re > 0.0
        q_pos = cs_im > 0.0
        dibit = jnp.where(q_pos, jnp.where(i_pos, 0, 1),
                          jnp.where(i_pos, 2, 3)).astype(jnp.int32)
        sgn_i = jnp.where(i_pos, 1.0, -1.0)
        sgn_q = jnp.where(q_pos, 1.0, -1.0)
        perr_raw = -_SQRT_HALF * (cs_im * sgn_i - cs_re * sgn_q)
        perr_raw = jnp.clip(jnp.where(jnp.isnan(perr_raw), 0.0, perr_raw),
                            -0.3, 0.3)

        # --- timing + PLL updates ---
        detected = jnp.clip(dsps + terr * cfg["dsps_gain"],
                            cfg["sps_min"], cfg["sps_max"])
        sp_new = sp + detected + terr * cfg["g"]
        perr = jnp.clip(perr_raw, -0.5, 0.5)
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
                jnp.where(has, mid_re, pm_re),
                jnp.where(has, mid_im, pm_im),
                jnp.where(has, cur_re, pc_re),
                jnp.where(has, cur_im, pc_im),
                jnp.where(has, cs_re, ps_re),
                jnp.where(has, cs_im, ps_im))

    carry = jax.lax.fori_loop(0, tc, body, carry0)

    (win_re, win_im, sp, dsps, ph, fr, pm_re, pm_im, pc_re, pc_im,
     ps_re, ps_im) = carry
    sw_re[:] = win_re
    sw_im[:] = win_im
    sscal[:] = jnp.concatenate([sp, dsps, ph, fr, pm_re, pm_im,
                                pc_re, pc_im, ps_re, ps_im])

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        fw_re[:] = win_re
        fw_im[:] = win_im
        fscal[:] = jnp.concatenate([sp, dsps, ph, fr, pm_re, pm_im,
                                    pc_re, pc_im, ps_re, ps_im])


def gardner_pallas_batched(demod, x: jnp.ndarray, state, *,
                           interpret: bool = False):
    """Run GardnerDQPSKDemodulator semantics over (C, T) complex x via
    the Pallas kernel. Same contract as dqpsk_pallas_batched: returns
    (dibits (C,T), valid (C,T), new state) or None when the shape does
    not fit (caller falls back to the XLA scan)."""
    c, t = x.shape
    tc = _pick_chunk(t)
    if tc < 64:
        return None
    w = demod.window_len
    cp = -(-c // 128) * 128

    cfg = dict(
        sps_min=demod.samples_per_symbol * (1.0 - demod.max_deviation),
        sps_max=demod.samples_per_symbol * (1.0 + demod.max_deviation),
        g=demod.sample_counter_gain,
        dsps_gain=demod.dsps_gain,
        alpha=demod.alpha, beta=demod.beta,
        max_pll_freq=demod.max_pll_freq,
        mid_bases=demod.mid_bases, cur_bases=demod.cur_bases,
    )

    pad_c = [(0, cp - c)]
    x_re = jnp.pad(x.real.T.astype(jnp.float32), [(0, 0)] + pad_c)
    x_im = jnp.pad(x.imag.T.astype(jnp.float32), [(0, 0)] + pad_c)
    iw_re = jnp.pad(state.window.real.T.astype(jnp.float32),
                    [(0, 0)] + pad_c)
    iw_im = jnp.pad(state.window.imag.T.astype(jnp.float32),
                    [(0, 0)] + pad_c)
    scal = jnp.stack([
        state.sampling_point.astype(jnp.float32),
        state.detected_sps.astype(jnp.float32),
        state.pll_phase.astype(jnp.float32),
        state.pll_freq.astype(jnp.float32),
        state.prev_mid_sample.real.astype(jnp.float32),
        state.prev_mid_sample.imag.astype(jnp.float32),
        state.prev_cur_sample.real.astype(jnp.float32),
        state.prev_cur_sample.imag.astype(jnp.float32),
        state.prev_cur_symbol.real.astype(jnp.float32),
        state.prev_cur_symbol.imag.astype(jnp.float32),
    ])                                                 # (10, C)
    fill = jnp.zeros((10, cp - c), jnp.float32) + jnp.array(
        [[demod.samples_per_symbol], [demod.samples_per_symbol],
         [0.0], [0.0], [0.0], [0.0], [0.0], [0.0], [0.0], [0.0]],
        jnp.float32)
    iscal = jnp.concatenate([scal, fill], axis=1)      # (10, Cp)
    bank_t = jnp.asarray(np.asarray(demod.bank).T, jnp.float32)

    grid = t // tc
    kernel = partial(_gardner_kernel, w=w, tc=tc, cfg=cfg)
    full = lambda i: (0, 0)                 # noqa: E731 — constant block
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
            pl.BlockSpec((10, cp), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, cp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, cp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((10, cp), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, cp), jnp.int32),
            jax.ShapeDtypeStruct((w, cp), jnp.float32),
            jax.ShapeDtypeStruct((w, cp), jnp.float32),
            jax.ShapeDtypeStruct((10, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((w, cp), jnp.float32),
            pltpu.VMEM((w, cp), jnp.float32),
            pltpu.VMEM((10, cp), jnp.float32),
        ],
    )(x_re, x_im, bank_t, iw_re, iw_im, iscal)

    dibits = (packed[:, :c] & 3).T
    valid = ((packed[:, :c] >> 2) > 0).T
    window = jax.lax.complex(fw_re[:, :c], fw_im[:, :c]).T
    fs = fscal[:, :c]
    new_state = type(state)(
        window=window.astype(jnp.complex64),
        sampling_point=fs[_SP], detected_sps=fs[_DSPS],
        pll_phase=fs[_PH], pll_freq=fs[_FR],
        prev_mid_sample=jax.lax.complex(fs[_PMRE], fs[_PMIM]
                                        ).astype(jnp.complex64),
        prev_cur_sample=jax.lax.complex(fs[_PCRE], fs[_PCIM]
                                        ).astype(jnp.complex64),
        prev_cur_symbol=jax.lax.complex(fs[_PSRE], fs[_PSIM]
                                        ).astype(jnp.complex64),
    )
    return dibits, valid, new_state
