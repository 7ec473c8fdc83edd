"""Oscillators / mixers (JAX, device-side).

The reference's recursive complex oscillator (dsp/mixer/Oscillator.java:21)
becomes direct vector synthesis exp(2*pi*i*f*t) with a carried phase so
chunked streaming is phase-continuous; precision never degrades because the
phase is reduced mod 2*pi each block instead of accumulating rotation error.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["oscillate", "mix_down", "mix_up", "fs4_down_convert"]

TWO_PI = 2.0 * jnp.pi


def oscillate(frequency: float, sample_rate: float, num_samples: int,
              phase: jnp.ndarray | float = 0.0
              ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Complex tone e^{i(2 pi f/fs n + phase)}; returns (samples, next_phase)."""
    step = TWO_PI * frequency / sample_rate
    n = jnp.arange(num_samples, dtype=jnp.float32)
    angles = phase + step * n
    samples = jnp.exp(1j * angles).astype(jnp.complex64)
    next_phase = jnp.mod(phase + step * num_samples, TWO_PI)
    return samples, next_phase


def mix_down(x: jnp.ndarray, frequency: float, sample_rate: float,
             phase: jnp.ndarray | float = 0.0
             ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Translate `frequency` to DC: x * e^{-i 2 pi f/fs n}."""
    osc, next_phase = oscillate(frequency, sample_rate, x.shape[0], phase)
    return x * jnp.conj(osc), next_phase


def mix_up(x: jnp.ndarray, frequency: float, sample_rate: float,
           phase: jnp.ndarray | float = 0.0
           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    osc, next_phase = oscillate(frequency, sample_rate, x.shape[0], phase)
    return x * osc, next_phase


def fs4_down_convert(x: jnp.ndarray) -> jnp.ndarray:
    """Multiply by e^{-i pi n / 2} = cycle (1, -i, -1, i): fs/4 down-shift
    without any multiplies (dsp/mixer/FS4DownConverter.java)."""
    n = x.shape[0]
    pattern = jnp.array([1, -1j, -1, 1j], dtype=jnp.complex64)
    reps = (n + 3) // 4
    rot = jnp.tile(pattern, reps)[:n]
    return x * rot
