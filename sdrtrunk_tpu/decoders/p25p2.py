"""P25 Phase 2 HDQPSK decoder chain (device side, up to dibits).

Reference chain (module/decode/p25/phase2/P25P2DecoderHDQPSK.java:159-163):
baseband filter pass 6500 / stop 7200, ripple 0.005; DQPSK symbol recovery
at 6000 baud. The reference uses the Gardner timing variant for simulcast;
the decision-directed core locks on the same +/-45 / +/-135 differential
constellation and is what we run here (Gardner is a planned alternative).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..dsp import agc, demod, design, fir
from ..dsp.psk import DQPSKDemodulator


@dataclass(frozen=True)
class P25P2Config:
    sample_rate: float = 50000.0
    symbol_rate: float = 6000.0
    pass_hz: float = 6500.0
    stop_hz: float = 7200.0
    sample_counter_gain: float = 0.3
    pll_bandwidth: float = 300.0
    agc_window: int = 32


class P25P2Decoder:
    def __init__(self, config: P25P2Config = P25P2Config()):
        self.config = config
        self.baseband_taps = np.asarray(
            design.remez_lowpass(63, config.pass_hz, config.stop_hz,
                                 config.sample_rate, 0.005, 0.005),
            jnp.float32)
        self.demod = DQPSKDemodulator(
            sample_rate=config.sample_rate,
            symbol_rate=config.symbol_rate,
            sample_counter_gain=config.sample_counter_gain,
            loop_bandwidth=config.pll_bandwidth)

    def init_state(self) -> dict:
        return {
            "fir": fir.fir_init(len(self.baseband_taps), jnp.complex64),
            "agc": agc.feed_forward_agc_init(self.config.agc_window),
            "power": jnp.zeros((), jnp.float32),
            "psk": self.demod.init_state(),
        }

    def __call__(self, x: jnp.ndarray, state: dict) -> tuple[dict, dict]:
        filtered, fir_state = fir.fir_apply(x, self.baseband_taps,
                                            state["fir"])
        power_trace, power_state = demod.power_db(
            filtered, 0.0004, state["power"])
        leveled, agc_state = agc.feed_forward_agc(
            filtered, state["agc"], self.config.agc_window)
        dibits, valid, psk_state = self.demod(leveled, state["psk"])
        outputs = {"dibits": dibits, "valid": valid,
                   "power_db": power_trace, "pll_freq": psk_state.pll_freq}
        new_state = {"fir": fir_state, "agc": agc_state,
                     "power": power_state, "psk": psk_state}
        return outputs, new_state
