"""P25 Phase 2 HDQPSK decoder chain (device side, up to dibits).

Reference chain (module/decode/p25/phase2/P25P2DecoderHDQPSK.java:62-89):
baseband filter pass 6500 / stop 7200, ripple 0.005; DQPSKGardnerDemodulator
at 6000 baud with symbol timing gain 0.1 — Gardner is the reference's
production timing detector for Phase 2 (simulcast-robust). `timing` selects
"gardner" (default, matching the reference) or "decision" (the
decision-directed core, sharper on clean non-simulcast signals).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..dsp import design
from ..dsp.psk import DQPSKDemodulator, GardnerDQPSKDemodulator
from .dqpsk_chain import DQPSKChainDecoder


@dataclass(frozen=True)
class P25P2Config:
    sample_rate: float = 50000.0
    symbol_rate: float = 6000.0
    pass_hz: float = 6500.0
    stop_hz: float = 7200.0
    sample_counter_gain: float = 0.1   # P25P2DecoderHDQPSK.java:62
    pll_bandwidth: float = 300.0
    agc_window: int = 32
    timing: str = "gardner"            # "gardner" | "decision"


class P25P2Decoder(DQPSKChainDecoder):
    def __init__(self, config: P25P2Config = P25P2Config()):
        self.config = config
        # the reference demands a 50 kHz minimum channel rate for
        # Phase 2 (DecodeConfigP25Phase2 ChannelSpecification) — below
        # 40 kHz the 6000-baud timing loop runs out of resolution
        # (measured: sps 4.17 leaves ~0.5% dibit errors, sps 8.33 is
        # clean), so a 25 kHz channelizer stream is zero-stuffed x2
        # and the baseband FIR doubles as the interpolation filter
        self.upsample = 2 if config.sample_rate < 40000.0 else 1
        eff_rate = config.sample_rate * self.upsample
        self.baseband_taps = np.asarray(
            design.remez_lowpass(63, config.pass_hz, config.stop_hz,
                                 eff_rate, 0.005, 0.005),
            jnp.float32)
        demod_cls = (GardnerDQPSKDemodulator if config.timing == "gardner"
                     else DQPSKDemodulator)
        self.demod = demod_cls(
            sample_rate=eff_rate,
            symbol_rate=config.symbol_rate,
            sample_counter_gain=config.sample_counter_gain,
            loop_bandwidth=config.pll_bandwidth)
