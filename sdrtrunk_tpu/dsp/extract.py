"""Channel extraction from channelizer output (the "output processor" layer).

Role of the reference's ChannelOutputProcessor family
(dsp/filter/channelizer/output/OneChannelOutputProcessor.java:29,
TwoChannelOutputProcessor.java:26): take the (blocks, M) channelizer result,
select the bin(s) serving a requested channel, frequency-shift the residual
offset, and apply gain. Here it is a batched slice + rotate over all requested
channels at once (the per-channel queue-drain threads disappear).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .channelizer import Channelizer

__all__ = ["ChannelPlan", "plan_channels", "extract_channels"]

TWO_PI = 2.0 * np.pi


@dataclass(frozen=True)
class ChannelPlan:
    """Static plan mapping requested channels onto channelizer bins.

    bins:    (C,) bin index per requested channel
    offsets: (C,) residual frequency offset (Hz) to mix OUT of each stream
             (requested_center - bin_center)
    rate:    per-channel output sample rate (2x bin spacing)
    """
    bins: np.ndarray
    offsets: np.ndarray
    rate: float

    @property
    def count(self) -> int:
        return len(self.bins)


def plan_channels(channelizer: Channelizer, center_offsets_hz) -> ChannelPlan:
    """Plan bin assignment for channels at given baseband offsets (Hz).

    Equivalent of ChannelCalculator.getChannelIndexes
    (dsp/filter/channelizer/ChannelCalculator.java:223) for single-bin
    channels: nearest bin, residual offset mixed out at the channel rate.
    """
    offsets = np.atleast_1d(np.asarray(center_offsets_hz, dtype=np.float64))
    spacing = channelizer.channel_spacing
    bins = np.array([channelizer.channel_for_frequency(f) for f in offsets])
    residual = np.array([
        f - channelizer.center_frequency(int(b)) for f, b in zip(offsets, bins)])
    if np.any(np.abs(residual) > spacing / 2 + 1e-6):
        raise ValueError("requested offset outside channelizer coverage")
    return ChannelPlan(bins=bins, offsets=residual,
                       rate=channelizer.channel_sample_rate)


def extract_channels(y: jnp.ndarray, plan: ChannelPlan,
                     phase: jnp.ndarray | None = None, gain: float = 1.0
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Extract per-channel streams from channelizer output.

    y: (K, M) channelizer output blocks.
    Returns (streams (C, K) complex64 mixed to true baseband, next mixer
    phases (C,)). `phase` carries the per-channel oscillator phase across
    chunks for phase-continuous streaming.
    """
    c = plan.count
    if phase is None:
        phase = jnp.zeros((c,), dtype=jnp.float32)
    k = y.shape[0]
    streams = y[:, jnp.asarray(plan.bins)].T           # (C, K)
    step = (TWO_PI * plan.offsets / plan.rate).astype(np.float32)  # (C,)
    n = jnp.arange(k, dtype=jnp.float32)[None, :]
    angles = phase[:, None] + jnp.asarray(step)[:, None] * n
    mixer = jnp.exp(-1j * angles).astype(jnp.complex64)
    out = streams * mixer * gain
    next_phase = jnp.mod(phase + jnp.asarray(step) * k, TWO_PI)
    return out.astype(jnp.complex64), next_phase
