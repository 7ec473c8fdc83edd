"""Narrowband FM decoder chain (config 1 of BASELINE.json).

Reference chain (module/decode/nbfm/NBFMDecoder.java:52-66):
    IQ -> baseband FIR -> squelching FM demod -> resample 8 kHz -> audio
with squelch defaults alpha=0.0004, threshold=-78 dB (NBFMDecoder.java:56-58)
and channel bandwidths 12.5/25 kHz (DecodeConfigNBFM.java:64,68).

Ours is fully batched: FIR + discriminator + de-emphasis + polyphase
resample are fused under jit; the squelch gate is computed per-sample and
carried to the 8 kHz audio as a mask. All feedback state (filter history,
previous sample, power IIR, mixer phase) is carried explicitly so chunked
streaming is exact.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..dsp import demod, design, fir, iir

AUDIO_RATE = 8000.0  # DecoderFactory.java:109 DEMODULATED_AUDIO_SAMPLE_RATE


@dataclass(frozen=True)
class NBFMConfig:
    sample_rate: float = 25000.0     # per-channel rate from the channelizer
    bandwidth: float = 12500.0       # channel bandwidth (12.5 or 25 kHz)
    squelch_threshold_db: float = -78.0
    squelch_alpha: float = 0.0004
    deemphasis_tau: float = 750e-6
    audio_rate: float = AUDIO_RATE


class NBFMDecoder:
    """Stateless-graph NBFM decoder; state flows through __call__."""

    def __init__(self, config: NBFMConfig = NBFMConfig()):
        self.config = config
        fs = config.sample_rate
        # Baseband low-pass: pass edge at ~0.4*bw, stop at 0.56*bw (mirrors
        # the reference's bandwidth-derived filter, NBFMDecoder.java:305-337).
        pass_hz = config.bandwidth * 0.40
        stop_hz = config.bandwidth * 0.56
        self.baseband_taps = np.asarray(
            design.remez_lowpass(63, pass_hz, stop_hz, fs), jnp.float32)
        self.fm_gain = demod.fm_gain(fs, config.bandwidth / 2.0)
        # audio resampler fs -> 8 kHz
        from fractions import Fraction
        frac = Fraction(int(config.audio_rate), int(fs))
        self.up, self.down = frac.numerator, frac.denominator
        self.resampler_taps = np.asarray(
            fir.resample_taps(self.up, self.down), jnp.float32)
        self._tpp = len(self.resampler_taps) // self.up

    def init_state(self) -> dict:
        return {
            "fir": fir.fir_init(len(self.baseband_taps), jnp.complex64),
            "prev": jnp.zeros((), jnp.complex64),
            "power": jnp.zeros((), jnp.float32),
            "deemph": jnp.zeros((), jnp.float32),
            "resamp": fir.resample_init(len(self.resampler_taps), self.up),
        }

    def __call__(self, x: jnp.ndarray, state: dict) -> tuple[dict, dict]:
        """Decode one block. Returns (outputs, new_state).

        outputs: audio (float32, len*up/down), audio_gate (bool, same len),
                 power_db (per input sample).
        """
        cfg = self.config
        filtered, fir_state = fir.fir_apply(x, self.baseband_taps, state["fir"])
        gate, power_trace, power_state = demod.power_squelch(
            filtered, cfg.squelch_threshold_db, cfg.squelch_alpha,
            state["power"])
        audio_full, prev = demod.fm_demodulate(
            filtered, state["prev"], self.fm_gain)
        audio_full, deemph_state = iir.deemphasis(
            audio_full, cfg.sample_rate, cfg.deemphasis_tau, state["deemph"])
        audio = fir.polyphase_resample(
            audio_full, self.resampler_taps, self.up, self.down,
            state["resamp"])
        # Gate at audio rate: nearest-sample decimation of the boolean mask.
        idx = (jnp.arange(audio.shape[0]) * self.down) // self.up
        audio_gate = gate[jnp.clip(idx, 0, gate.shape[0] - 1)]
        outputs = {
            "audio": audio.astype(jnp.float32),
            "audio_gate": audio_gate,
            "power_db": power_trace,
        }
        new_state = {"fir": fir_state, "prev": prev, "power": power_state,
                     "deemph": deemph_state,
                     "resamp": audio_full[-self._tpp:]}
        return outputs, new_state
