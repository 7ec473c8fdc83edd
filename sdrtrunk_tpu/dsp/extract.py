"""Channel extraction from channelizer output (the "output processor" layer).

Role of the reference's ChannelOutputProcessor family
(dsp/filter/channelizer/output/OneChannelOutputProcessor.java:29,
TwoChannelOutputProcessor.java:26): take the (blocks, M) channelizer result,
select the bin(s) serving a requested channel, frequency-shift the residual
offset, and apply gain. Here it is a batched slice + rotate over all requested
channels at once (the per-channel queue-drain threads disappear).

Channels wider than one bin (e.g. 25 kHz NBFM on a 12.5 kHz grid,
ChannelCalculator.java:223 multi-bin indexes) use TWO adjacent bins joined
by the filterless perfect-reconstruction synthesizer (dsp/synthesizer.py);
the plan stores a bin PAIR per channel and wide channels are simply the
rows whose pair differs — one gather + one select covers both kinds in the
same batched expression, so a mixed single/two-bin channel population costs
one fused kernel, not two code paths.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .channelizer import Channelizer
from .synthesizer import _ROT4

__all__ = ["ChannelPlan", "plan_channels", "extract_channels"]

TWO_PI = 2.0 * np.pi


@dataclass(frozen=True)
class ChannelPlan:
    """Static plan mapping requested channels onto channelizer bins.

    bins:     (C, 2) [lower, upper] bin pair per channel; single-bin
              channels repeat the same index twice (wide == lo != hi)
    offsets:  (C,) residual frequency offset (Hz) to mix OUT of each
              stream (requested_center - served_center)
    rate:     per-channel output sample rate (2x bin spacing; the
              two-bin synthesizer output runs at the same rate)
    """
    bins: np.ndarray
    offsets: np.ndarray
    rate: float

    @property
    def count(self) -> int:
        return len(self.bins)

    @property
    def wide(self) -> np.ndarray:
        return self.bins[:, 0] != self.bins[:, 1]


def plan_channels(channelizer: Channelizer, center_offsets_hz,
                  bandwidths_hz=None) -> ChannelPlan:
    """Plan bin assignment for channels at given baseband offsets (Hz).

    Equivalent of ChannelCalculator.getChannelIndexes
    (dsp/filter/channelizer/ChannelCalculator.java:223): a channel whose
    bandwidth fits one bin takes the nearest bin; a wider one (up to
    2x spacing) takes the straddling pair, served by the two-channel
    synthesizer centered midway between them. >2-bin channels raise, as
    the reference's processor family only covers one and two
    (PolyphaseChannelManager.java:164-178).

    bandwidths_hz: scalar or (C,) per-channel bandwidth; None = one bin.
    """
    offsets = np.atleast_1d(np.asarray(center_offsets_hz, dtype=np.float64))
    spacing = channelizer.channel_spacing
    if bandwidths_hz is None:
        bw = np.full(len(offsets), spacing)
    else:
        bw = np.broadcast_to(
            np.asarray(bandwidths_hz, np.float64), offsets.shape).copy()
    if np.any(bw > 2.0 * spacing + 1e-6):
        raise ValueError(
            f"channel bandwidth > {2 * spacing:.0f} Hz needs more than two "
            "bins; not supported (reference supports one- and two-channel "
            "output processors only)")

    m_total = channelizer.channels
    bins = np.zeros((len(offsets), 2), np.int64)
    residual = np.zeros(len(offsets))
    for i, (f, w) in enumerate(zip(offsets, bw)):
        if w <= spacing + 1e-6:
            b = channelizer.channel_for_frequency(f)
            bins[i] = (b, b)
            residual[i] = f - channelizer.center_frequency(int(b))
            if abs(residual[i]) > spacing / 2 + 1e-6:
                raise ValueError("requested offset outside channelizer "
                                 "coverage")
        else:
            # straddling pair: served center sits midway between bin m
            # and m+1 (ChannelCalculator.getCenterFrequencyForIndexes:515)
            m = int(round(f / spacing - 0.5))
            lo = m % m_total
            hi = (m + 1) % m_total
            served = channelizer.center_frequency(m) + spacing / 2.0
            bins[i] = (lo, hi)
            residual[i] = f - served
            if abs(residual[i]) > spacing / 2 + 1e-6:
                raise ValueError("requested offset outside channelizer "
                                 "coverage")
    return ChannelPlan(bins=bins, offsets=residual,
                       rate=channelizer.channel_sample_rate)


def extract_channels(y: jnp.ndarray, plan: ChannelPlan,
                     phase=None, gain: float = 1.0
                     ) -> tuple[jnp.ndarray, tuple]:
    """Extract per-channel streams from channelizer output.

    y: (K, M) channelizer output blocks.
    phase: None or (mixer_phase (C,), rot_k scalar int32) carried across
    chunks for phase-continuous streaming (rot_k is the two-bin
    synthesizer's e^{-i pi k/2} rotator index, shared by all channels).
    Returns (streams (C, K) complex64 mixed to true baseband,
    (next_mixer_phase, next_rot_k)).
    """
    c = plan.count
    if phase is None:
        phase = (jnp.zeros((c,), dtype=jnp.float32),
                 jnp.asarray(0, jnp.int32))
    mixer_phase, rot_k = phase
    k = y.shape[0]

    lo = y[:, jnp.asarray(plan.bins[:, 0])]            # (K, C)
    hi = y[:, jnp.asarray(plan.bins[:, 1])]
    rot = jnp.asarray(_ROT4)[(rot_k + jnp.arange(k)) % 4][:, None]
    z = rot * lo - jnp.conj(rot) * hi                  # two-bin synthesis
    wide = jnp.asarray(plan.wide)[None, :]
    streams = jnp.where(wide, z, lo).T                 # (C, K)

    step = (TWO_PI * plan.offsets / plan.rate).astype(np.float32)  # (C,)
    n = jnp.arange(k, dtype=jnp.float32)[None, :]
    angles = mixer_phase[:, None] + jnp.asarray(step)[:, None] * n
    mixer = jnp.exp(-1j * angles).astype(jnp.complex64)
    out = streams * mixer * gain
    next_phase = jnp.mod(mixer_phase + jnp.asarray(step) * k, TWO_PI)
    return out.astype(jnp.complex64), (next_phase, (rot_k + k) % 4)
