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


class LTRLiveDecoder:
    """Full live LTR slot chain on device: NBFM demod (audio + squelch
    gate) + zero-crossing FSK slicer in one graph — the module list
    ltrstandard/LTRStandardDecoder.java wires for a running channel
    (decoder + audio module). Outputs both the 8 kHz voice audio and the
    sliced sub-audible bits; the host framer/state layer consumes them
    (runtime/processors.py LTRChannelProcessor).

    Also serves LTR-Net and Passport, which share the FSK physical layer
    (ltrnet/LTRNetDecoder.java, passport/PassportDecoder.java).
    """

    def __init__(self, sample_rate: float = 25000.0,
                 channel_bandwidth: float = 12500.0):
        from .nbfm import NBFMConfig, NBFMDecoder
        self.nbfm = NBFMDecoder(NBFMConfig(sample_rate=sample_rate,
                                           bandwidth=channel_bandwidth))
        self.up, self.down = self.nbfm.up, self.nbfm.down
        self.fsk = LTRFSKDemodulator(sample_rate=8000.0,
                                     symbol_rate=300.0)

    def init_state(self) -> dict:
        return {"nbfm": self.nbfm.init_state(),
                "fsk": self.fsk.init_state()}

    def __call__(self, x: jnp.ndarray, state: dict):
        out, nbfm_state = self.nbfm(x, state["nbfm"])
        bits, valid, fsk_state = self.fsk(out["audio"], state["fsk"])
        return ({"audio": out["audio"], "audio_gate": out["audio_gate"],
                 "bits": bits, "valid": valid},
                {"nbfm": nbfm_state, "fsk": fsk_state})


class MPT1327LiveDecoder:
    """Live MPT1327 control/traffic slot: NBFM demod + 1200-baud AFSK
    correlator in one device graph (mpt1327/MPT1327Decoder.java chain).
    The per-chunk audio block length must be a multiple of the AFSK
    decimation (10 samples/bit at 8 kHz x 1200 baud... 8000/1200 taken
    as the demodulator's internal step)."""

    def __init__(self, sample_rate: float = 25000.0,
                 channel_bandwidth: float = 12500.0):
        from ..dsp.afsk import AFSK1200Demodulator
        from .nbfm import NBFMConfig, NBFMDecoder
        self.nbfm = NBFMDecoder(NBFMConfig(sample_rate=sample_rate,
                                           bandwidth=channel_bandwidth))
        self.up, self.down = self.nbfm.up, self.nbfm.down
        self.afsk = AFSK1200Demodulator()

    def init_state(self) -> dict:
        return {"nbfm": self.nbfm.init_state(),
                "afsk": self.afsk.init_state()}

    def __call__(self, x: jnp.ndarray, state: dict):
        out, nbfm_state = self.nbfm(x, state["nbfm"])
        audio = out["audio"]
        n = (audio.shape[0] // 10) * 10
        bits, valid, afsk_state = self.afsk(audio[:n], state["afsk"])
        return ({"audio": audio, "audio_gate": out["audio_gate"],
                 "bits": bits, "valid": valid},
                {"nbfm": nbfm_state, "afsk": afsk_state})
