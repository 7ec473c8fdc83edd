"""Gain control (JAX, device-side).

Feed-forward complex AGC: normalizes by the max envelope over a trailing
window — the reference's per-sample circular-buffer loop
(dsp/gain/ComplexFeedForwardGainControl.java:27, window=32 for P25/DMR)
becomes a sliding-window max (lax.reduce_window).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["feed_forward_agc", "feed_forward_agc_init"]

OBJECTIVE_ENVELOPE = 1.0
MINIMUM_ENVELOPE = 0.0001


def feed_forward_agc_init(window: int = 32) -> jnp.ndarray:
    """Initial envelope history (zeros) for streaming AGC."""
    return jnp.zeros((window - 1,), dtype=jnp.float32)


def feed_forward_agc(x: jnp.ndarray, state: jnp.ndarray | None = None,
                     window: int = 32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """y[n] = x[n] / max(envelope(x[n-window+1 .. n]), MINIMUM_ENVELOPE).

    Returns (normalized samples, new envelope history of window-1 values).
    """
    if state is None:
        state = feed_forward_agc_init(window)
    env = jnp.abs(x).astype(jnp.float32)
    padded = jnp.concatenate([state, env])
    max_env = jax.lax.reduce_window(
        padded, -jnp.inf, jax.lax.max,
        window_dimensions=(window,), window_strides=(1,), padding="VALID")
    gain = OBJECTIVE_ENVELOPE / jnp.maximum(max_env, MINIMUM_ENVELOPE)
    y = x * gain.astype(x.real.dtype)
    return y, padded[-(window - 1):]
