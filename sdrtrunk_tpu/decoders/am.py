"""AM decoder chain (module/decode/am/, DecodeConfigAM.java:54: 3 kHz BW).

IQ -> baseband FIR -> envelope detector -> DC removal -> AGC-ish scale ->
resample 8 kHz, with power squelch like NBFM.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..dsp import demod, design, fir, iir

AUDIO_RATE = 8000.0


@dataclass(frozen=True)
class AMConfig:
    sample_rate: float = 25000.0
    bandwidth: float = 6000.0
    squelch_threshold_db: float = -78.0
    squelch_alpha: float = 0.0004
    audio_rate: float = AUDIO_RATE


class AMDecoder:
    def __init__(self, config: AMConfig = AMConfig()):
        self.config = config
        fs = config.sample_rate
        half_bw = config.bandwidth / 2.0
        self.baseband_taps = np.asarray(
            design.remez_lowpass(63, half_bw, half_bw + 2000.0, fs), jnp.float32)
        from fractions import Fraction
        frac = Fraction(int(config.audio_rate), int(fs))
        self.up, self.down = frac.numerator, frac.denominator
        self.resampler_taps = np.asarray(
            fir.resample_taps(self.up, self.down), jnp.float32)
        self._tpp = len(self.resampler_taps) // self.up

    def init_state(self) -> dict:
        return {
            "fir": fir.fir_init(len(self.baseband_taps), jnp.complex64),
            "power": jnp.zeros((), jnp.float32),
            "dc": (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
            "resamp": fir.resample_init(len(self.resampler_taps), self.up),
        }

    def __call__(self, x: jnp.ndarray, state: dict) -> tuple[dict, dict]:
        cfg = self.config
        filtered, fir_state = fir.fir_apply(x, self.baseband_taps, state["fir"])
        gate, power_trace, power_state = demod.power_squelch(
            filtered, cfg.squelch_threshold_db, cfg.squelch_alpha,
            state["power"])
        envelope = demod.am_demodulate(filtered)
        audio_full, dc_state = iir.dc_removal(envelope, 0.95, state["dc"])
        audio = fir.polyphase_resample(
            audio_full, self.resampler_taps, self.up, self.down,
            state["resamp"])
        idx = (jnp.arange(audio.shape[0]) * self.down) // self.up
        audio_gate = gate[jnp.clip(idx, 0, gate.shape[0] - 1)]
        outputs = {"audio": audio.astype(jnp.float32),
                   "audio_gate": audio_gate, "power_db": power_trace}
        new_state = {"fir": fir_state, "power": power_state, "dc": dc_state,
                     "resamp": audio_full[-self._tpp:]}
        return outputs, new_state
