"""First-order IIR filters as parallel scans (JAX, device-side).

The reference's per-sample IIRs (dsp/filter/iir/SinglePoleIirFilter.java,
dsp/filter/dc/DCRemovalFilter.java:25, dsp/filter/iir/DeemphasisFilter.java:20)
become O(log N) associative scans over the linear recurrence
y[t] = a*y[t-1] + b[t], so long blocks parallelize on the VPU instead of
looping per sample.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["single_pole", "single_pole_apply", "dc_removal", "deemphasis_alpha",
           "deemphasis"]


def _linrec(a: jnp.ndarray, b: jnp.ndarray, y0) -> jnp.ndarray:
    """Solve y[t] = a[t]*y[t-1] + b[t] with y[-1]=y0.

    Implemented as a lax.scan (one tiny While-loop body) rather than an
    associative scan: the log-depth slice/concat ladder the associative
    form unrolls into made whole-chain XLA TPU compiles pathologically
    slow (hours for the NBFM chain on the tunneled backend), while the
    scan compiles in seconds. Throughput is unaffected in practice —
    these IIRs run vmapped across >=hundreds of channels, so the scan
    body is VPU-wide.
    """

    def step(y, ab):
        at, bt = ab
        y2 = at * y + bt
        return y2, y2

    _, ys = jax.lax.scan(step, jnp.asarray(y0, b.dtype), (a, b))
    return ys


def single_pole(x: jnp.ndarray, alpha: float, y0=0.0) -> jnp.ndarray:
    """y[t] = y[t-1] + alpha*(x[t]-y[t-1])  (SinglePoleIirFilter semantics)."""
    a = jnp.full(x.shape, 1.0 - alpha, dtype=x.dtype)
    b = alpha * x
    return _linrec(a, b, jnp.asarray(y0, x.dtype))


def single_pole_apply(x: jnp.ndarray, alpha: float, state: jnp.ndarray
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming single-pole IIR; `state` is the previous output sample."""
    y = single_pole(x, alpha, state)
    return y, y[-1]


def dc_removal(x: jnp.ndarray, ratio: float = 0.95,
               state: tuple | None = None) -> tuple[jnp.ndarray, tuple]:
    """DC-blocking filter y[t] = x[t] - x[t-1] + ratio*y[t-1].

    Same topology as the reference DCRemovalFilter (dsp/filter/dc/), default
    pole matching its usage for FM audio cleanup.
    """
    if state is None:
        state = (jnp.asarray(0.0, x.dtype), jnp.asarray(0.0, x.dtype))
    x_prev, y_prev = state
    diffs = x - jnp.concatenate([x_prev[None], x[:-1]])
    a = jnp.full(x.shape, ratio, dtype=x.dtype)
    y = _linrec(a, diffs, y_prev)
    return y, (x[-1], y[-1])


def deemphasis_alpha(sample_rate: float, tau: float = 750e-6) -> float:
    """One-pole de-emphasis coefficient for time constant tau (750 us default,
    the land-mobile standard the reference's DeemphasisFilter targets)."""
    import math
    return 1.0 - math.exp(-1.0 / (sample_rate * tau))


def deemphasis_makeup_gain(sample_rate: float, tau: float = 750e-6,
                           reference_hz: float = 1000.0) -> float:
    """Gain restoring unity response at `reference_hz` after de-emphasis."""
    import math
    alpha = deemphasis_alpha(sample_rate, tau)
    w = 2.0 * math.pi * reference_hz / sample_rate
    # |H| of y[t] = (1-alpha) y[t-1] + alpha x[t]
    re = 1.0 - (1.0 - alpha) * math.cos(w)
    im = (1.0 - alpha) * math.sin(w)
    return math.hypot(re, im) / alpha


def deemphasis(x: jnp.ndarray, sample_rate: float, tau: float = 750e-6,
               state=0.0, gain: float | None = None
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FM de-emphasis: single-pole low-pass + makeup gain + clip.

    Mirrors the reference's DeemphasisFilter (single-pole + external gain +
    declip at +/-0.95, dsp/filter/iir/DeemphasisFilter.java). Default gain
    restores unity response at 1 kHz. Returns (audio, new filter state);
    the carried state is the pre-gain filter output.
    """
    alpha = deemphasis_alpha(sample_rate, tau)
    y = single_pole(x, alpha, state)
    if gain is None:
        gain = deemphasis_makeup_gain(sample_rate, tau)
    return jnp.clip(y * gain, -0.95, 0.95), y[-1]
