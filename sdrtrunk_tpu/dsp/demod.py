"""Demodulators and squelch (JAX, device-side, fully vectorized).

FM: conjugate-product phase discriminator, the reference's per-sample loop
(dsp/fm/FMDemodulator.java:63-97) becomes one fused elementwise expression.
AM: envelope detector (dsp/am/AMDemodulator.java:26).
Squelch: one-pole power monitor + threshold gating
(dsp/squelch/PowerSquelch.java, dsp/squelch/PowerMonitor.java).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import iir

__all__ = ["fm_demodulate", "fm_gain", "am_demodulate", "power_db",
           "power_squelch", "SquelchResult"]


def fm_gain(sample_rate: float, deviation_hz: float) -> float:
    """Gain that maps +/-deviation_hz instantaneous frequency to +/-1.0."""
    import math
    return sample_rate / (2.0 * math.pi * deviation_hz)


def fm_demodulate(x: jnp.ndarray, prev: jnp.ndarray | None = None,
                  gain: float = 1.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quadrature FM discriminator: angle(x[n] * conj(x[n-1])) * gain.

    Uses atan2 (full-quadrant) rather than the reference's atan(q/i)
    (FMDemodulator.java:63) — identical in-band, and well-defined when the
    phase step exceeds +/-pi/2. Returns (demodulated, last_sample).
    """
    if prev is None:
        prev = x[:1]
    else:
        prev = prev[None] if prev.ndim == 0 else prev
    xm1 = jnp.concatenate([prev.astype(x.dtype), x[:-1]])
    prod = x * jnp.conj(xm1)
    y = jnp.arctan2(prod.imag, prod.real) * gain
    return y.astype(jnp.float32), x[-1]


def am_demodulate(x: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
    """Envelope detector (AMDemodulator.java:26)."""
    return (jnp.abs(x) * gain).astype(jnp.float32)


def power_db(x: jnp.ndarray, alpha: float = 0.0004, state=0.0
             ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Smoothed channel power in dB: one-pole IIR over |x|^2.

    alpha default matches the reference NBFM squelch alpha decay
    (nbfm/NBFMDecoder.java:56).
    """
    p = (x.real * x.real + x.imag * x.imag).astype(jnp.float32)
    smoothed, new_state = iir.single_pole_apply(p, alpha, jnp.asarray(state, jnp.float32))
    return 10.0 * jnp.log10(jnp.maximum(smoothed, 1e-20)), new_state


class SquelchResult(dict):
    """Lightweight result record: keys gate (bool per sample), power_db, state."""


def power_squelch(x: jnp.ndarray, threshold_db: float = -78.0,
                  alpha: float = 0.0004, state=0.0
                  ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Power squelch: per-sample open/closed gate from smoothed power.

    Defaults mirror the reference NBFM squelch (threshold -78 dB, alpha
    0.0004; nbfm/NBFMDecoder.java:56-58). The reference ramps over a few
    samples (PowerSquelch.java ATTACK/DECAY states); we gate directly — the
    audio path applies its own short fade to avoid clicks.

    Returns (gate_bool, power_db_trace, new_power_state).
    """
    pdb, new_state = power_db(x, alpha, state)
    gate = pdb > threshold_db
    return gate, pdb, new_state
