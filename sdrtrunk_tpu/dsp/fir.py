"""FIR filtering primitives (JAX, device-side).

The reference filters per-sample through circular buffers
(dsp/filter/fir/complex/ComplexFIRFilter2.java:59,
dsp/filter/halfband/real/HalfBandFilter2.java:33). Here every filter is a
batched convolution over whole blocks with explicit carried history so blocks
can be streamed (or sharded over time with a halo of taps-1 samples).

Conventions:
  * signals are 1-D jnp arrays (real float32 or complex64); batched variants
    take (channels, time) and are implemented with vmap
  * every streaming op is `y, new_state = op(x, state)` with `state` the last
    (taps-1) input samples, so chunked processing is bit-identical to
    one-shot processing
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fir_init", "fir_apply", "fir_filter", "fir_decimate",
    "half_band_decimate", "decimation_cascade_taps", "decimate_by_power2",
    "polyphase_resample", "resample_taps",
]


def fir_init(taps_len: int, dtype=jnp.complex64) -> jnp.ndarray:
    """Zero history for a streaming FIR (taps_len - 1 samples)."""
    return jnp.zeros((taps_len - 1,), dtype=dtype)


def _conv_valid(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """'valid' correlation-style FIR: y[n] = sum_k taps[k] * x[n + K-1 - k].

    Supports complex x with real taps by filtering re/im planes; uses XLA's
    conv so it lowers to the TPU's convolution path.
    """
    k = taps.shape[0]
    if jnp.iscomplexobj(x):
        yr = _conv_valid(x.real, taps)
        yi = _conv_valid(x.imag, taps)
        return jax.lax.complex(yr, yi)
    # conv_general_dilated computes correlation when we flip the kernel:
    # standard FIR y[n] = sum_k h[k] x[n-k]  -> kernel reversed.
    # Precision policy: DEFAULT (bf16 multiplies) — ~1e-3 absolute per
    # filter pass, far inside every decode chain's margin, and the
    # HIGH/HIGHEST variants measured -15%/-35% end-to-end throughput.
    lhs = x[None, None, :]
    rhs = taps[::-1][None, None, :].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID")
    del k
    return out[0, 0]


def fir_apply(x: jnp.ndarray, taps: jnp.ndarray, state: jnp.ndarray
              ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming FIR: prepend history, emit len(x) outputs, return new history.

    y[n] = sum_k taps[k] * x[n - k] with x[-j] drawn from `state`.
    """
    taps = jnp.asarray(taps)
    xp = jnp.concatenate([state.astype(x.dtype), x])
    y = _conv_valid(xp, taps)
    new_state = xp[-(taps.shape[0] - 1):]
    return y, new_state


def fir_filter(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """One-shot FIR with zero initial state (same semantics as streaming)."""
    state = jnp.zeros((len(taps) - 1,), dtype=x.dtype)
    y, _ = fir_apply(x, taps, state)
    return y


def fir_decimate(x: jnp.ndarray, taps: jnp.ndarray, factor: int,
                 state: jnp.ndarray | None = None
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FIR + decimate by `factor` (len(x) must be a multiple of factor).

    Equivalent to fir_apply followed by [::factor], but computed with a
    strided conv so only kept outputs are evaluated.
    """
    taps = jnp.asarray(taps)
    if state is None:
        state = jnp.zeros((taps.shape[0] - 1,), dtype=x.dtype)
    xp = jnp.concatenate([state.astype(x.dtype), x])

    def strided(v):
        lhs = v[None, None, :]
        rhs = taps[::-1][None, None, :].astype(v.dtype)
        return jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(factor,), padding="VALID")[0, 0]

    if jnp.iscomplexobj(x):
        y = jax.lax.complex(strided(xp.real), strided(xp.imag))
    else:
        y = strided(xp)
    new_state = xp[-(taps.shape[0] - 1):]
    return y, new_state


def half_band_decimate(x: jnp.ndarray, taps: jnp.ndarray,
                       state: jnp.ndarray | None = None
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x2 half-band decimator (role of HalfBandFilter2.java:70)."""
    return fir_decimate(x, taps, 2, state)


def decimation_cascade_taps(factor: int, order: int = 22) -> list[np.ndarray]:
    """Half-band tap sets for a x2..x1024 dyadic decimation cascade.

    Mirrors the structure of the reference's DecimationFilterFactory
    (dsp/filter/decimate/): a chain of log2(factor) half-band stages.
    """
    from . import design
    if factor & (factor - 1) or factor < 2:
        raise ValueError("decimation factor must be a power of two >= 2")
    stages = int(np.log2(factor))
    return [design.half_band(order) for _ in range(stages)]


def decimate_by_power2(x: jnp.ndarray, stage_taps: list, states: list | None = None
                       ) -> tuple[jnp.ndarray, list]:
    """Run a dyadic half-band cascade; returns (y, new_states)."""
    if states is None:
        states = [None] * len(stage_taps)
    new_states = []
    y = x
    for taps, st in zip(stage_taps, states):
        y, ns = half_band_decimate(y, jnp.asarray(taps, jnp.float32), st)
        new_states.append(ns)
    return y, new_states


def resample_taps(up: int, down: int, taps_per_phase: int = 12,
                  attenuation_db: float = 80.0) -> np.ndarray:
    """Design a polyphase resampler prototype (windowed sinc).

    Role of the reference's RealResampler/libresample4j
    (dsp/filter/resample/RealResampler.java:29).
    """
    from . import design
    length = up * taps_per_phase
    if length % 2 == 0:
        length += 1
    cutoff = 0.5 / max(up, down)
    taps = design.kaiser_sinc(length, cutoff, attenuation_db) * up
    # pad to an exact multiple of `up` for clean polyphase reshape
    pad = (-len(taps)) % up
    return np.concatenate([taps, np.zeros(pad)])


def resample_init(taps_len: int, up: int, dtype=jnp.float32) -> jnp.ndarray:
    """Zero history for streaming polyphase_resample (taps_len // up samples)."""
    return jnp.zeros((taps_len // up,), dtype=dtype)


@partial(jax.jit, static_argnames=("up", "down"))
def polyphase_resample(x: jnp.ndarray, taps: jnp.ndarray, up: int, down: int,
                       state: jnp.ndarray | None = None) -> jnp.ndarray:
    """Rational-rate resampling by up/down (upfirdn semantics).

    y[m] = sum_j poly[(m*down) % up, j] * x[(m*down)//up - j] with
    poly[p, j] = taps[j*up + p] — insert up-1 zeros, filter, keep every
    down-th output.

    Computed as zero-stuff + ONE strided convolution rather than a
    (n_out, taps//up) constant-index window gather: XLA:TPU scalarizes
    that gather into thousands of slice ops and compile time explodes
    (round-2 measured: the 1023-way vmapped NBFM graph took 972 s to
    compile, and this gather alone exceeded 300 s; the strided-conv form
    compiles in seconds and batches over vmapped channels as a single
    grouped conv). The zero-stuffed intermediate is (n+tpp)*up samples —
    cheap — and the conv evaluates only the kept outputs via its stride.

    Streaming: pass `state` (last taps//up input samples, from
    resample_init / the tail of the previous block) and keep len(x) a
    multiple of `down` so the polyphase phase pattern is block-periodic;
    then chunked output concatenates to the one-shot result. New state is
    x[-taps//up:] (caller-maintained; see callers).
    """
    taps = jnp.asarray(taps, jnp.float32)
    tpp = taps.shape[0] // up            # taps per phase
    n_out = (x.shape[0] * up) // down
    if state is None:
        state = jnp.zeros((tpp,), dtype=x.dtype)
    xp = jnp.concatenate([state.astype(x.dtype), x])         # (n + tpp,)

    def _one_plane(v):
        # zero-stuff: xu[i*up] = v[i]
        xu = jnp.pad(v[:, None], ((0, 0), (0, up - 1))).reshape(-1)
        # y[m] = sum_k taps[k] * xu[m*down + up*tpp - k]
        #      = corr(xu, taps)[m*down + 1] with kernel length up*tpp,
        # so a stride-`down` conv over xu[1:] emits exactly the kept taps
        lhs = xu[1:][None, None, :]
        rhs = taps[::-1][None, None, :].astype(v.dtype)
        z = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(down,), padding="VALID")[0, 0]
        return z[:n_out]

    if jnp.iscomplexobj(x):
        return jax.lax.complex(_one_plane(xp.real), _one_plane(xp.imag))
    return _one_plane(xp)
