"""DMR decoder chain (device side, up to dibits).

Reference chain (module/decode/dmr/DMRDecoder.java:54,183-188): same
DQPSK decision-directed core as P25 C4FM but with baseband filter pass
5100 / stop 6500 and symbol timing gain 0.4 (DMRDecoder.java:58).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..dsp import design
from ..dsp.psk import DQPSKDemodulator
from .dqpsk_chain import DQPSKChainDecoder


@dataclass(frozen=True)
class DMRConfig:
    sample_rate: float = 25000.0
    symbol_rate: float = 4800.0
    pass_hz: float = 5100.0
    stop_hz: float = 6500.0
    sample_counter_gain: float = 0.4   # DMRDecoder.java:58
    pll_bandwidth: float = 300.0
    agc_window: int = 32


class DMRDecoder(DQPSKChainDecoder):
    def __init__(self, config: DMRConfig = DMRConfig()):
        self.config = config
        self.baseband_taps = np.asarray(
            design.remez_lowpass(63, config.pass_hz, config.stop_hz,
                                 config.sample_rate, 0.01, 0.01), jnp.float32)
        self.demod = DQPSKDemodulator(
            sample_rate=config.sample_rate,
            symbol_rate=config.symbol_rate,
            sample_counter_gain=config.sample_counter_gain,
            loop_bandwidth=config.pll_bandwidth)
