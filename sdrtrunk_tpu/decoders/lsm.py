"""P25 Phase 1 LSM (Linear Simulcast Modulation) decoder chain.

Reference chain (module/decode/p25/phase1/P25P1DecoderLSM.java:52-90):
same baseband filter as C4FM (pass 5100 / stop 6500, ripple 0.01) but the
symbol recovery is a DQPSKGardnerDemodulator with sample counter gain 0.3
— pi/4-DQPSK transmitted by linear simulcast sites has inter-site timing
smear that the decision-directed detector cannot track; the Gardner TED's
amplitude sensitivity is what keeps lock there.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..dsp import design
from ..dsp.psk import GardnerDQPSKDemodulator
from .dqpsk_chain import DQPSKChainDecoder


@dataclass(frozen=True)
class LSMConfig:
    sample_rate: float = 25000.0
    symbol_rate: float = 4800.0
    pass_hz: float = 5100.0
    stop_hz: float = 6500.0
    sample_counter_gain: float = 0.3   # P25P1DecoderLSM.java:52
    pll_bandwidth: float = 300.0
    agc_window: int = 32


class LSMDecoder(DQPSKChainDecoder):
    def __init__(self, config: LSMConfig = LSMConfig()):
        self.config = config
        self.baseband_taps = np.asarray(
            design.remez_lowpass(63, config.pass_hz, config.stop_hz,
                                 config.sample_rate, 0.01, 0.01),
            jnp.float32)
        self.demod = GardnerDQPSKDemodulator(
            sample_rate=config.sample_rate,
            symbol_rate=config.symbol_rate,
            sample_counter_gain=config.sample_counter_gain,
            loop_bandwidth=config.pll_bandwidth)
