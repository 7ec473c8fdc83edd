"""Auxiliary decoder chains: 8 kHz demodulated FM audio -> messages.

The reference attaches these to analog voice channels alongside the
primary decoder (module/decode/DecoderFactory.java:398-425, auxiliary
decoders run on the demodulated audio stream).  Here each chain is the
shared AFSK1200 correlation demodulator (device, jitted scan) plus a
host-side framer/parser — the same device/host split as the trunked
protocols.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..dsp.afsk import AFSK1200Demodulator
from ..protocol.auxdec import (Fleetsync2Framer, LJ1200Framer, MDCFramer,
                               Tait1200Framer)

__all__ = ["AuxDecoder", "AUX_PROTOCOLS"]

AUX_PROTOCOLS = ("fleetsync2", "mdc1200", "lj1200", "tait1200")

_FRAMERS = {
    "fleetsync2": Fleetsync2Framer,
    "mdc1200": MDCFramer,
    "lj1200": LJ1200Framer,
    "tait1200": Tait1200Framer,
}


class AuxDecoder:
    """One auxiliary protocol decoder over 8 kHz audio blocks.

    MDC-1200 uses the inverted slicer output (MDCDecoder.java:44,
    AFSK1200Decoder.Output.INVERTED); its framer NRZ-decodes internally.
    """

    def __init__(self, protocol: str):
        if protocol not in _FRAMERS:
            raise ValueError(
                f"unknown aux protocol {protocol!r}; one of {AUX_PROTOCOLS}")
        self.protocol = protocol
        self.demod = AFSK1200Demodulator(invert=(protocol == "mdc1200"))
        self.framer = _FRAMERS[protocol]()
        self._state = self.demod.init_state()

    def reset(self):
        self.framer.reset()
        self._state = self.demod.init_state()

    def process(self, audio) -> list:
        """audio: float 8 kHz block (length multiple of 10) -> messages."""
        bits, valid, self._state = self.demod(jnp.asarray(audio), self._state)
        symbols = np.asarray(bits)[np.asarray(valid)]
        return self.framer.process(symbols)
