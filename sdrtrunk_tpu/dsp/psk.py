"""DQPSK symbol recovery as a carried-state scan (the hard kernel).

TPU-native reformulation of the reference's per-sample feedback chain
(dsp/psk/PSKDemodulator.java:101 receive -> CostasLoop de-rotation ->
InterpolatingSampleBuffer -> DQPSKDecisionDirectedSymbolEvaluator decision ->
timing/PLL feedback). The loop is inherently sequential per channel, so it
becomes ONE lax.scan step per input sample with a small carried state, and
throughput comes from batching the scan across >=hundreds of channels.

The scan body is NATIVELY BATCHED over channels (not vmapped): state
vectors are (C,) and the delay-line window is carried as (W, C) so the
channel axis lands on the TPU lane dimension — the vmapped (C, W) layout
put the tiny W axis on lanes (padded 10->128) and made every window shift
a cross-lane shuffle. Measured on the v5e at C=1023: 101 Mchan-samples/s
vmapped -> 375 with the batched layout (round 3; the bench's
pallas_vs_xla section records the current numbers — round 5: DD core
702 XLA scan vs 882 Pallas, Gardner 528 vs 942 Mchan-samples/s after
the static base-shift restriction). The interpolator arm lookup
bank[idx] is computed as a one-hot (129, C) matmul against the (129, 8)
tap bank instead of a per-lane gather (XLA:TPU serializes minor-dim
gathers; the matmul rides the MXU and is exact — one-hot row selection
introduces no rounding). The public per-channel __call__ wraps the
batched core with a size-1 channel axis.

Semantics mirror the reference exactly (same update order, gains, clamps):
  * 2nd-order Costas loop: alpha/beta from loop BW 2*pi/300, damping
    sqrt(2)/2, freq clamp +/- 2*pi*(baud/2)/fs
    (dsp/psk/pll/CostasLoop.java:44-70,178-218)
  * interpolating buffer: sampling point decremented per sample, symbol when
    < 1.0; detected samples/symbol tracked +/-2% with gain 0.1*g^2; timing
    feedback adds detectedSPS + err*g (InterpolatingSampleBuffer.java:58-124)
  * decision-directed evaluator: quadrant decision, de-rotated quadrature as
    phase/timing error, error clip 0.3, PLL adjust clip 0.5
    (DQPSKDecisionDirectedSymbolEvaluator.java:61-105)

Dibit mapping (dsp/symbol/Dibit.java): 0=+1(+45deg) 1=+3(+135deg)
2=-1(-45deg) 3=-3(-135deg).

Each scan step emits (dibit, valid) — at most one symbol per sample. The
host (or downstream device code) compacts valid dibits.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .interpolator import CENTER, NSTEPS, interpolator_bank

__all__ = ["DQPSKDemodulator", "DQPSKState", "costas_gains",
           "GardnerDQPSKDemodulator", "GardnerState", "scan_unroll"]

TWO_PI = 2.0 * math.pi


def scan_unroll(requested: int | None) -> int:
    """Resolve a platform-aware lax.scan unroll factor.

    Round-2 measured unroll=32 as +12% throughput on the TPU, but XLA:CPU
    compile time explodes super-linearly with the unrolled body (0.5 s at
    unroll=1, 3.6 s at 8, >580 s at 32 for a 4000-sample scan). The single
    constant broke the test suite, CPU CLI decode, and the multichip dryrun
    (VERDICT round 2, items 1-2). Resolution happens at trace time so the
    same demodulator object works on either backend: TPU keeps a moderate
    unroll (8 — batched-layout measured best: 375 Mchan-samples/s vs 288
    at unroll=32), CPU and everything else gets 1.
    """
    if requested is not None:
        return requested
    try:
        backend = jax.default_backend()
    except Exception:
        return 1
    return 8 if backend not in ("cpu",) else 1


def costas_gains(loop_bandwidth: float = 300.0,
                 damping: float = math.sqrt(2.0) / 2.0) -> tuple[float, float]:
    """(alpha, beta) loop gains (CostasLoop.java:109-115)."""
    bw = TWO_PI / loop_bandwidth
    denom = 1.0 + 2.0 * damping * bw + bw * bw
    alpha = 4.0 * damping * bw / denom
    beta = 4.0 * bw * bw / denom
    return alpha, beta


def _wrap(phase: jnp.ndarray) -> jnp.ndarray:
    """CostasLoop phase wrap to +/-2pi (CostasLoop.java:150-160)."""
    phase = jnp.where(phase > TWO_PI, phase - TWO_PI, phase)
    return jnp.where(phase < -TWO_PI, phase + TWO_PI, phase)


def _normalize(z: jnp.ndarray) -> jnp.ndarray:
    """Unit-magnitude normalize with zero-safe guard (z * rsqrt(|z|^2)
    rather than z / sqrt(|z|^2): one fused VPU rsqrt instead of
    sqrt + divide, measurably cheaper inside the per-sample scan)."""
    mag2 = (z.real * z.real + z.imag * z.imag).astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.maximum(mag2, 1e-30))
    return jnp.where(mag2 > 1e-24, z * inv, jnp.zeros_like(z))


_SQRT_HALF = math.sqrt(0.5)


def _derotated_quadrature(ci: jnp.ndarray, cq: jnp.ndarray) -> jnp.ndarray:
    """Imag part of symbol * conj(reference) where reference is the
    nearest ideal DQPSK point (pi/4 + k*pi/2).

    The reference constellation point lies in the symbol's own quadrant,
    so cos(ref) = sqrt(1/2)*sign(ci) and sin(ref) = sqrt(1/2)*sign(cq)
    exactly — the rotate-back collapses to
        imag = sqrt(1/2) * (cq*sign(ci) - ci*sign(cq))
    with no transcendentals (sign selection, not approximation). Signs
    follow the slicer's strict `> 0` convention (x <= 0 -> -1) so the
    boundary cases match the quadrant the dibit decision picked.
    """
    sgn_i = jnp.where(ci > 0.0, 1.0, -1.0)
    sgn_q = jnp.where(cq > 0.0, 1.0, -1.0)
    return _SQRT_HALF * (cq * sgn_i - ci * sgn_q)


def _arm_taps(bank: jnp.ndarray, mu: jnp.ndarray) -> jnp.ndarray:
    """Interpolator taps for fractional mu in [0, 1], batched over lanes.

    Selects arm idx = int(NSTEPS * mu) from the (NSTEPS+1, 8) bank
    (RealInterpolator.java:41 arm selection) as a one-hot matmul so the
    lookup rides the MXU — exact row selection, no per-lane gather.
    mu: (C,) -> taps (8, C).
    """
    idx = jnp.clip((NSTEPS * mu).astype(jnp.int32), 0, NSTEPS)      # (C,)
    onehot = (jnp.arange(NSTEPS + 1)[:, None] == idx[None, :]
              ).astype(jnp.float32)                                  # (129, C)
    return jnp.dot(bank.T, onehot,
                   preferred_element_type=jnp.float32)               # (8, C)


class DQPSKState(NamedTuple):
    window: jnp.ndarray        # (W,) complex64 delay line, newest at [-1]
    sampling_point: jnp.ndarray  # f32
    detected_sps: jnp.ndarray    # f32
    pll_phase: jnp.ndarray       # f32
    pll_freq: jnp.ndarray        # f32
    prev_preceding: jnp.ndarray  # complex64
    prev_current: jnp.ndarray    # complex64


@dataclass
class DQPSKDemodulator:
    """Decision-directed DQPSK demod for constant-envelope 4-FSK (C4FM/DMR).

    sample_counter_gain: 0.3 for P25P1 (P25P1DecoderC4FM.java:48),
    0.4 for DMR (DMRDecoder.java:58).
    """
    sample_rate: float
    symbol_rate: float = 4800.0
    sample_counter_gain: float = 0.3
    loop_bandwidth: float = 300.0
    max_deviation: float = 0.02   # +/-2% samples-per-symbol tracking
    unroll: int | None = None     # lax.scan unroll; None = platform-aware
                                  # (see scan_unroll)
    impl: str = "auto"            # batched() backend: "auto" picks the
                                  # Pallas kernel on TPU (dsp/pallas_psk.py)
                                  # and the XLA scan on CPU; "xla"/"pallas"
                                  # force a path

    def __post_init__(self):
        self.samples_per_symbol = self.sample_rate / self.symbol_rate
        if self.samples_per_symbol < 4.0:
            raise ValueError("need >= 4 samples/symbol for the 8-tap interpolator")
        self.window_len = int(math.floor(2.0 * self.samples_per_symbol))
        self.alpha, self.beta = costas_gains(self.loop_bandwidth)
        self.max_pll_freq = TWO_PI * (self.symbol_rate / 2.0) / self.sample_rate
        self.dsps_gain = 0.1 * self.sample_counter_gain ** 2
        self.bank = np.asarray(interpolator_bank())

    def init_state(self) -> DQPSKState:
        sps = self.samples_per_symbol
        return DQPSKState(
            window=jnp.zeros((self.window_len,), jnp.complex64),
            sampling_point=jnp.asarray(sps, jnp.float32),
            detected_sps=jnp.asarray(sps, jnp.float32),
            pll_phase=jnp.zeros((), jnp.float32),
            pll_freq=jnp.zeros((), jnp.float32),
            prev_preceding=jnp.zeros((), jnp.complex64),
            prev_current=jnp.zeros((), jnp.complex64),
        )

    def _step(self, state: DQPSKState, x_t: jnp.ndarray):
        """One sample across all channels: window (W, C), scalars (C,)."""
        sps_min = self.samples_per_symbol * (1.0 - self.max_deviation)
        sps_max = self.samples_per_symbol * (1.0 + self.max_deviation)
        g = self.sample_counter_gain
        bank = jnp.asarray(self.bank, jnp.float32)

        # --- PLL increment + mix (PSKDemodulator.java:101-110) ---
        phase = _wrap(state.pll_phase + state.pll_freq)
        mixed = x_t * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))

        window = jnp.concatenate([state.window[1:], mixed[None, :]])
        sampling_point = state.sampling_point - 1.0
        has_symbol = sampling_point < 1.0

        # --- interpolate current sample at mu = sampling_point ---
        mu = jnp.clip(sampling_point, 0.0, 1.0)
        taps = _arm_taps(bank, mu)                  # (8, C)
        w8 = window[:8]                             # (8, C)
        current = (jnp.sum(taps * w8.real, axis=0)
                   + 1j * jnp.sum(taps * w8.imag, axis=0)
                   ).astype(jnp.complex64)          # (C,)
        preceding = window[CENTER]

        # --- differential decode + normalize ---
        preceding_symbol = _normalize(preceding * jnp.conj(state.prev_preceding))
        current_symbol = _normalize(current * jnp.conj(state.prev_current))

        # --- quadrant decision (DQPSKDecisionDirectedSymbolEvaluator) ---
        ci, cq = current_symbol.real, current_symbol.imag
        pq = preceding_symbol.imag
        q_pos = cq > 0.0
        i_pos = ci > 0.0
        dibit = jnp.where(q_pos,
                          jnp.where(i_pos, 0, 1),
                          jnp.where(i_pos, 2, 3)).astype(jnp.int32)
        # timing polarity (DQPSKDecisionDirectedSymbolEvaluator.java:61-105):
        # +45/-45 (I>0) -> sign(pq > cq); +135/-135 (I<0) -> sign(pq < cq)
        polarity = jnp.where(i_pos, jnp.where(pq > cq, 1.0, -1.0),
                             jnp.where(pq < cq, 1.0, -1.0))
        # rotate current symbol back to 0 rad (transcendental-free)
        err = jnp.clip(_derotated_quadrature(ci, cq), -0.3, 0.3)
        err = jnp.where(jnp.isnan(err), 0.0, err)
        phase_error = -err
        timing_error = err * polarity

        # --- timing update (InterpolatingSampleBuffer.resetAndAdjust) ---
        detected = jnp.clip(state.detected_sps + timing_error * self.dsps_gain,
                            sps_min, sps_max)
        sp_new = sampling_point + detected + timing_error * g

        # --- PLL adjust (CostasLoop.adjust, error clipped 0.5) ---
        perr = jnp.clip(phase_error, -0.5, 0.5)
        freq = state.pll_freq + self.beta * perr
        phase2 = _wrap(phase + freq + self.alpha * perr)
        freq = jnp.clip(freq, -self.max_pll_freq, self.max_pll_freq)

        new_state = DQPSKState(
            window=window,
            sampling_point=jnp.where(has_symbol, sp_new, sampling_point),
            detected_sps=jnp.where(has_symbol, detected, state.detected_sps),
            pll_phase=jnp.where(has_symbol, phase2, phase),
            pll_freq=jnp.where(has_symbol, freq, state.pll_freq),
            prev_preceding=jnp.where(has_symbol, preceding,
                                     state.prev_preceding),
            prev_current=jnp.where(has_symbol, current, state.prev_current),
        )
        return new_state, (dibit, has_symbol)

    def batched(self, x: jnp.ndarray, state: DQPSKState
                ) -> tuple[jnp.ndarray, jnp.ndarray, DQPSKState]:
        """Demodulate a (C, T) block. Returns (dibits, valid, state),
        dibits/valid (C, T); state leaves carry a leading C axis
        (window (C, W)) — the layout WidebandReceiver broadcasts and
        checkpoints; the scan-internal layout is (W, C).

        Dispatches to the Pallas sequential kernel on TPU (`impl`)."""
        if self.impl != "xla":
            try:
                backend = jax.default_backend()
            except Exception:
                backend = "cpu"
            # auto only on tpu — pltpu memory spaces raise at trace time
            # on gpu/rocm; impl="pallas" still forces the kernel (tests
            # run it in interpret mode on CPU)
            if self.impl == "pallas" or backend == "tpu":
                from .pallas_psk import dqpsk_pallas_batched
                try:
                    out = dqpsk_pallas_batched(
                        self, x, state, interpret=(backend != "tpu"))
                except Exception:
                    if self.impl == "pallas":
                        raise
                    out = None
                if out is not None:
                    return out
        return self._scan_batched(x, state)

    def _scan_batched(self, x: jnp.ndarray, state: DQPSKState
                      ) -> tuple[jnp.ndarray, jnp.ndarray, DQPSKState]:
        """XLA lax.scan implementation of batched() (CPU path / fallback)."""
        state = state._replace(window=state.window.T)      # (W, C)
        state, (dibits, valid) = jax.lax.scan(
            self._step, state, x.T, unroll=scan_unroll(self.unroll))
        state = state._replace(window=state.window.T)      # (C, W)
        return dibits.T, valid.T, state

    def __call__(self, x: jnp.ndarray, state: DQPSKState | None = None
                 ) -> tuple[jnp.ndarray, jnp.ndarray, DQPSKState]:
        """Demodulate a 1-D block. Returns (dibits, valid_mask, state).

        dibits/valid are per input sample; dibits[i] is meaningful where
        valid[i]. Compact with dibits[valid] on host, or feed the (values,
        mask) pair to downstream device framing.
        """
        if state is None:
            state = self.init_state()
        bstate = jax.tree.map(lambda a: a[None], state)
        # per-channel path always uses the XLA scan: it is routinely
        # wrapped in an outer jax.vmap (tests, generic receivers), and
        # pallas_call has no batching rule
        dibits, valid, bstate = self._scan_batched(x[None, :], bstate)
        state = jax.tree.map(lambda a: a[0], bstate)
        return dibits[0], valid[0], state


class GardnerState(NamedTuple):
    window: jnp.ndarray          # (W,) complex64 delay line, newest at [-1]
    sampling_point: jnp.ndarray  # f32
    detected_sps: jnp.ndarray    # f32
    pll_phase: jnp.ndarray       # f32
    pll_freq: jnp.ndarray        # f32
    prev_mid_sample: jnp.ndarray   # complex64 (raw interpolated, mu point)
    prev_cur_sample: jnp.ndarray   # complex64 (raw interpolated, +sps/2)
    prev_cur_symbol: jnp.ndarray   # complex64 (normalized differential)


@dataclass
class GardnerDQPSKDemodulator:
    """DQPSK demod with a Gardner timing error detector — the reference's
    choice for P25 Linear Simulcast Modulation and P25 Phase 2 HDQPSK
    (dsp/psk/DQPSKGardnerDemodulator.java:30-88,
    DQPSKGardnerSymbolEvaluator.java:63-106).

    Differences from the decision-directed core, mirrored exactly:
      * TWO interpolation points per symbol: the Gardner mid-point at the
        sampling point mu, and the symbol sample half a detected symbol
        period later (InterpolatingSampleBuffer.getMiddleSample:171-179
        interpolates at detectedSPS/2 — note it does not add mu).
      * both points are differentially decoded against their own previous
        raw samples and normalized, then the Gardner TED
        err = (prevSym.i - curSym.i)*mid.i + (prevSym.q - curSym.q)*mid.q
        clipped +/-0.3 drives timing; the quadrant decision + de-rotated
        quadrature of the symbol sample drives the PLL (clip 0.3) — same
        resetAndAdjust / CostasLoop.adjust updates as decision-directed.

    The amplitude-sensitive TED handles the intersymbol fading of
    simulcast channels where the decision-directed detector loses lock.

    State-format note: `window_len` (below) feeds the GardnerState window
    shape, so changing the formula invalidates previously saved
    checkpoints — runtime/checkpoint.py fingerprints leaf shapes, making
    a stale checkpoint fail loudly with a StateCheckpointError rather
    than restoring a misaligned delay line.

    Like DQPSKDemodulator, the scan body is natively batched: window
    (W, C), scalars (C,). The integer-base window fetch
    (InterpolatingSampleBuffer.getInphase:186-198: integer part moves the
    8-tap base, fractional part selects the arm) is computed with a
    one-hot base selection over the W-7 possible slide positions einsummed
    against statically-shifted window views — no per-lane dynamic_slice.
    """
    sample_rate: float
    symbol_rate: float = 4800.0
    sample_counter_gain: float = 0.3
    loop_bandwidth: float = 300.0
    max_deviation: float = 0.02
    unroll: int | None = None
    impl: str = "auto"            # like DQPSKDemodulator.impl: "auto"
                                  # takes the Pallas kernel on TPU
                                  # (dsp/pallas_gardner.py), the XLA
                                  # scan elsewhere

    def __post_init__(self):
        self.samples_per_symbol = self.sample_rate / self.symbol_rate
        if self.samples_per_symbol < 4.0:
            raise ValueError("need >= 4 samples/symbol for the 8-tap interpolator")
        # window must cover the symbol-sample offset floor(sps_max/2) + 8
        # interpolator taps; 2*sps covers it for sps >= 4 with 2% deviation
        self.window_len = max(int(math.floor(2.0 * self.samples_per_symbol)),
                              int(self.samples_per_symbol * 1.02 / 2) + 9)
        self.alpha, self.beta = costas_gains(self.loop_bandwidth)
        self.max_pll_freq = TWO_PI * (self.symbol_rate / 2.0) / self.sample_rate
        self.dsps_gain = 0.1 * self.sample_counter_gain ** 2
        self.bank = np.asarray(interpolator_bank())
        # statically-feasible integer offsets for the two interpolation
        # points (exact, not an approximation): the Gardner mid-point's
        # offset is clip(sp, 0, 1) -> floor in {0, 1}; the symbol
        # point's offset is detected_sps/2 with detected_sps clipped to
        # [sps_min, sps_max]. Restricting the base-shift one-hot to
        # these ranges (+-1 f32 edge margin) cuts the per-sample select
        # work ~3-6x at P25P2's 16-sample window (9 shifts -> 5).
        w = self.window_len
        sps_min = self.samples_per_symbol * (1.0 - self.max_deviation)
        sps_max = self.samples_per_symbol * (1.0 + self.max_deviation)
        self.mid_bases = tuple(range(0, min(w - 8, 1) + 1))
        lo = max(0, int(math.floor(sps_min / 2.0)) - 1)
        hi = min(w - 8, int(math.floor(sps_max / 2.0)) + 1)
        self.cur_bases = tuple(range(lo, hi + 1))

    def init_state(self) -> GardnerState:
        sps = self.samples_per_symbol
        return GardnerState(
            window=jnp.zeros((self.window_len,), jnp.complex64),
            sampling_point=jnp.asarray(sps, jnp.float32),
            detected_sps=jnp.asarray(sps, jnp.float32),
            pll_phase=jnp.zeros((), jnp.float32),
            pll_freq=jnp.zeros((), jnp.float32),
            prev_mid_sample=jnp.zeros((), jnp.complex64),
            prev_cur_sample=jnp.zeros((), jnp.complex64),
            prev_cur_symbol=jnp.zeros((), jnp.complex64),
        )

    def _interp(self, window: jnp.ndarray, offset: jnp.ndarray,
                bases: tuple | None = None) -> jnp.ndarray:
        """Interpolate at fractional `offset` samples into the (W, C)
        window, batched over channels: integer part selects the 8-tap
        base position (one-hot einsum over static shifts), fractional
        part selects the polyphase arm (one-hot matmul). `bases`
        statically restricts the feasible integer offsets (see
        __post_init__; None = all)."""
        w = window.shape[0]
        if bases is None:
            bases = tuple(range(w - 7))                 # base in [0, W-8]
        k = jnp.floor(offset).astype(jnp.int32)
        mu = offset - k.astype(jnp.float32)
        base = jnp.clip(k, 0, w - 8)                    # (C,)
        taps = _arm_taps(jnp.asarray(self.bank, jnp.float32), mu)  # (8, C)
        base_oh = (jnp.asarray(bases, jnp.int32)[:, None] == base[None, :]
                   ).astype(jnp.float32)                # (nbase, C)
        # shifted[b, j, :] = window[bases[b] + j, :]
        shifted = jnp.stack([window[b:b + 8] for b in bases])
        w8 = (jnp.einsum("bc,bjc->jc", base_oh, shifted.real)
              + 1j * jnp.einsum("bc,bjc->jc", base_oh, shifted.imag))
        out = (jnp.sum(taps * w8.real, axis=0)
               + 1j * jnp.sum(taps * w8.imag, axis=0))
        return out.astype(jnp.complex64)

    def _step(self, state: GardnerState, x_t: jnp.ndarray):
        """One sample across all channels: window (W, C), scalars (C,)."""
        sps_min = self.samples_per_symbol * (1.0 - self.max_deviation)
        sps_max = self.samples_per_symbol * (1.0 + self.max_deviation)
        g = self.sample_counter_gain

        phase = _wrap(state.pll_phase + state.pll_freq)
        mixed = x_t * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))

        window = jnp.concatenate([state.window[1:], mixed[None, :]])
        sampling_point = state.sampling_point - 1.0
        has_symbol = sampling_point < 1.0

        mu = jnp.clip(sampling_point, 0.0, 1.0)
        mid_sample = self._interp(window, mu, self.mid_bases)
        cur_sample = self._interp(window, state.detected_sps / 2.0,
                                  self.cur_bases)

        mid_symbol = _normalize(mid_sample * jnp.conj(state.prev_mid_sample))
        cur_symbol = _normalize(cur_sample * jnp.conj(state.prev_cur_sample))

        # --- Gardner TED (DQPSKGardnerSymbolEvaluator.setSymbols:63-70) ---
        prev = state.prev_cur_symbol
        terr = ((prev.real - cur_symbol.real) * mid_symbol.real +
                (prev.imag - cur_symbol.imag) * mid_symbol.imag)
        terr = jnp.clip(jnp.where(jnp.isnan(terr), 0.0, terr), -0.3, 0.3)

        # --- quadrant decision + phase error (same slicer as DD) ---
        ci, cq = cur_symbol.real, cur_symbol.imag
        q_pos = cq > 0.0
        i_pos = ci > 0.0
        dibit = jnp.where(q_pos,
                          jnp.where(i_pos, 0, 1),
                          jnp.where(i_pos, 2, 3)).astype(jnp.int32)
        perr_raw = -_derotated_quadrature(ci, cq)
        perr_raw = jnp.clip(jnp.where(jnp.isnan(perr_raw), 0.0, perr_raw),
                            -0.3, 0.3)

        detected = jnp.clip(state.detected_sps + terr * self.dsps_gain,
                            sps_min, sps_max)
        sp_new = sampling_point + detected + terr * g

        perr = jnp.clip(perr_raw, -0.5, 0.5)
        freq = state.pll_freq + self.beta * perr
        phase2 = _wrap(phase + freq + self.alpha * perr)
        freq = jnp.clip(freq, -self.max_pll_freq, self.max_pll_freq)

        new_state = GardnerState(
            window=window,
            sampling_point=jnp.where(has_symbol, sp_new, sampling_point),
            detected_sps=jnp.where(has_symbol, detected, state.detected_sps),
            pll_phase=jnp.where(has_symbol, phase2, phase),
            pll_freq=jnp.where(has_symbol, freq, state.pll_freq),
            prev_mid_sample=jnp.where(has_symbol, mid_sample,
                                      state.prev_mid_sample),
            prev_cur_sample=jnp.where(has_symbol, cur_sample,
                                      state.prev_cur_sample),
            prev_cur_symbol=jnp.where(has_symbol, cur_symbol,
                                      state.prev_cur_symbol),
        )
        return new_state, (dibit, has_symbol)

    def batched(self, x: jnp.ndarray, state: GardnerState
                ) -> tuple[jnp.ndarray, jnp.ndarray, GardnerState]:
        """Demodulate a (C, T) block; see DQPSKDemodulator.batched."""
        if self.impl != "xla":
            try:
                backend = jax.default_backend()
            except Exception:
                backend = "cpu"
            if self.impl == "pallas" or backend == "tpu":
                from .pallas_gardner import gardner_pallas_batched
                try:
                    out = gardner_pallas_batched(
                        self, x, state, interpret=(backend != "tpu"))
                except Exception:
                    if self.impl == "pallas":
                        raise
                    out = None
                if out is not None:
                    return out
        return self._scan_batched(x, state)

    def _scan_batched(self, x: jnp.ndarray, state: GardnerState
                      ) -> tuple[jnp.ndarray, jnp.ndarray, GardnerState]:
        """XLA lax.scan implementation of batched() (CPU / fallback)."""
        state = state._replace(window=state.window.T)
        state, (dibits, valid) = jax.lax.scan(
            self._step, state, x.T, unroll=scan_unroll(self.unroll))
        state = state._replace(window=state.window.T)
        return dibits.T, valid.T, state

    def __call__(self, x: jnp.ndarray, state: GardnerState | None = None
                 ) -> tuple[jnp.ndarray, jnp.ndarray, GardnerState]:
        """Demodulate a 1-D block; see DQPSKDemodulator.__call__.

        Always the XLA scan: the per-channel path is routinely wrapped
        in an outer jax.vmap and pallas_call has no batching rule."""
        if state is None:
            state = self.init_state()
        bstate = jax.tree.map(lambda a: a[None], state)
        dibits, valid, bstate = self._scan_batched(x[None, :], bstate)
        state = jax.tree.map(lambda a: a[0], bstate)
        return dibits[0], valid[0], state
