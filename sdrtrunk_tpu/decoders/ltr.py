"""LTR decoder chain (device side): NBFM-demodulated 8 kHz audio ->
zero-crossing FSK -> sliced bits (host framer consumes).

Reference chain: ltrstandard/LTRStandardDecoder.java wires the NBFM
demodulated audio into dsp/fsk/LTRDecoder.java at 8 kHz / 300 baud.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..dsp.fsk import LTRFSKDemodulator, LTRFSKState


@dataclass(frozen=True)
class LTRConfig:
    audio_rate: float = 8000.0
    symbol_rate: float = 300.0


class LTRDecoder:
    """Operates on demodulated FM audio (use NBFMDecoder upstream)."""

    def __init__(self, config: LTRConfig = LTRConfig()):
        self.config = config
        self.fsk = LTRFSKDemodulator(sample_rate=config.audio_rate,
                                     symbol_rate=config.symbol_rate)

    def init_state(self) -> LTRFSKState:
        return self.fsk.init_state()

    def __call__(self, audio: jnp.ndarray, state: LTRFSKState):
        bits, valid, new_state = self.fsk(audio, state)
        return {"bits": bits, "valid": valid}, new_state
