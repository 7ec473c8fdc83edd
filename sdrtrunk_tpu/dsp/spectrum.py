"""Spectral analysis: windowed FFT frames + Welch averaging (role of
spectrum/DFTProcessor.java:48,213 — the data behind the spectral /
waterfall display, here exposed as arrays + a JSONL-able summary).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from . import windows

__all__ = ["SpectrumConfig", "power_spectrum", "spectrogram",
           "channel_power_map"]


@dataclass(frozen=True)
class SpectrumConfig:
    fft_size: int = 1024
    window: str = "blackman_harris_7"   # DFTProcessor default family
    overlap: float = 0.5
    average_frames: int = 4


def _window(config: SpectrumConfig) -> np.ndarray:
    return windows.get_window(config.window, config.fft_size)


def spectrogram(x: jnp.ndarray, config: SpectrumConfig = SpectrumConfig()
                ) -> jnp.ndarray:
    """Complex IQ -> (frames, fft_size) power in dB, DC-centered."""
    n = config.fft_size
    hop = max(1, int(n * (1.0 - config.overlap)))
    num = max(0, (x.shape[0] - n) // hop + 1)
    if num == 0:
        return jnp.zeros((0, n), jnp.float32)
    idx = jnp.arange(num)[:, None] * hop + jnp.arange(n)[None, :]
    frames = x[idx] * jnp.asarray(_window(config))[None, :]
    spec = jnp.fft.fftshift(jnp.fft.fft(frames, axis=-1), axes=-1)
    power = (jnp.abs(spec) ** 2) / (n * n)
    return (10.0 * jnp.log10(power + 1e-20)).astype(jnp.float32)


def power_spectrum(x: jnp.ndarray,
                   config: SpectrumConfig = SpectrumConfig()) -> jnp.ndarray:
    """Welch-averaged power spectrum in dB (fft_size bins, DC centered)."""
    frames = spectrogram(x, config)
    if frames.shape[0] == 0:
        return jnp.full((config.fft_size,), -200.0, jnp.float32)
    linear = 10.0 ** (frames / 10.0)
    return (10.0 * jnp.log10(jnp.mean(linear, axis=0) + 1e-20)
            ).astype(jnp.float32)


def channel_power_map(x: jnp.ndarray, sample_rate: float,
                      channel_bandwidth: float = 12500.0,
                      config: SpectrumConfig = SpectrumConfig()):
    """Per-channel average power: the occupancy view of the band.

    Returns (center_frequencies_hz, power_db) with one entry per
    channel_bandwidth-wide slot across the captured span.
    """
    spec = np.asarray(power_spectrum(x, config))
    n = config.fft_size
    bin_hz = sample_rate / n
    bins_per_channel = max(1, int(round(channel_bandwidth / bin_hz)))
    n_channels = n // bins_per_channel
    usable = n_channels * bins_per_channel
    linear = 10.0 ** (spec[:usable] / 10.0)
    per_channel = linear.reshape(n_channels, bins_per_channel).mean(axis=1)
    power_db = 10.0 * np.log10(per_channel + 1e-20)
    centers = (np.arange(n_channels) + 0.5) * bins_per_channel * bin_hz \
        - sample_rate / 2.0
    return centers, power_db
