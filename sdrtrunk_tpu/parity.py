"""Golden-vector parity harness (VERDICT round-1 item 7; BASELINE.md
correctness row: "outputs match reference recordings within SNR/BER
bounds").

The reference community's workflow is record -> replay -> compare by
inspection (SURVEY.md §4.3, record/binary/BinaryRecorder.java:51). This
harness turns that into numbers:

  1. synthesize a known C4FM capture (ground-truth dibits + frames),
  2. decode it with the TPU path (the jitted C4FMDecoder chain),
  3. decode it with an INDEPENDENT host oracle — a scalar float64
     per-sample loop implementing the same published semantics
     (PSKDemodulator.java:101 receive -> CostasLoop -> interpolating
     buffer -> decision-directed evaluator) the way the reference runs
     it: one sample at a time, no vectorization, no float32 scan,
  4. compare: dibit BER of each path against ground truth, dibit
     agreement between paths, frame/event-stream equality, and a .bits
     round-trip through the reference byte format.

The oracle is this repo's own reimplementation from the update equations
(gains, clamps, orders documented in dsp/psk.py) — not a translation of
the Java — so agreement is evidence both derivations implement the spec,
and disagreement localizes to float32-vs-float64 or scan-vs-loop issues.
"""
from __future__ import annotations

import json
import math

import numpy as np

from .dsp.interpolator import CENTER, NSTEPS, interpolator_bank
from .dsp.psk import costas_gains

__all__ = ["host_c4fm_demod", "parity_report"]

TWO_PI = 2.0 * math.pi


def host_c4fm_demod(iq: np.ndarray, sample_rate: float,
                    symbol_rate: float = 4800.0,
                    sample_counter_gain: float = 0.3,
                    loop_bandwidth: float = 300.0,
                    baseband_taps: np.ndarray | None = None,
                    agc_window: int = 32) -> np.ndarray:
    """Scalar float64 reference decode: returns the dibit stream.

    Mirrors the C4FMDecoder chain sample-by-sample: baseband FIR ->
    feed-forward AGC (trailing-window max) -> PLL mix -> interpolating
    buffer -> decision-directed symbol decision with timing/PLL feedback.
    """
    x = np.asarray(iq, np.complex128)
    if baseband_taps is not None:
        taps = np.asarray(baseband_taps, np.float64)
        x = np.convolve(x, taps)[:len(x)]     # causal, zero history
    # feed-forward AGC: per-sample gain from trailing window max envelope
    env = np.abs(x)
    agc_out = np.empty_like(x)
    for i in range(len(x)):
        w = env[max(0, i - agc_window + 1):i + 1]
        m = max(w.max(), 1e-4)
        agc_out[i] = x[i] / m
    x = agc_out

    sps = sample_rate / symbol_rate
    alpha, beta = costas_gains(loop_bandwidth)
    max_pll = TWO_PI * (symbol_rate / 2.0) / sample_rate
    dsps_gain = 0.1 * sample_counter_gain ** 2
    sps_min, sps_max = sps * 0.98, sps * 1.02
    bank = interpolator_bank()

    window = np.zeros(int(math.floor(2.0 * sps)), np.complex128)
    sampling_point = sps
    detected = sps
    pll_phase = 0.0
    pll_freq = 0.0
    prev_preceding = 0.0 + 0.0j
    prev_current = 0.0 + 0.0j
    dibits = []

    for s in x:
        pll_phase += pll_freq
        if pll_phase > TWO_PI:
            pll_phase -= TWO_PI
        elif pll_phase < -TWO_PI:
            pll_phase += TWO_PI
        mixed = s * complex(math.cos(pll_phase), math.sin(pll_phase))
        window[:-1] = window[1:]
        window[-1] = mixed
        sampling_point -= 1.0
        if sampling_point >= 1.0:
            continue

        mu = min(max(sampling_point, 0.0), 1.0)
        taps = bank[min(int(NSTEPS * mu), NSTEPS)]
        current = complex(np.dot(taps, window[:8].real),
                          np.dot(taps, window[:8].imag))
        preceding = window[CENTER]

        def norm(z):
            m = abs(z)
            return z / m if m > 1e-12 else 0.0j

        preceding_symbol = norm(preceding * prev_preceding.conjugate())
        current_symbol = norm(current * prev_current.conjugate())

        ci, cq = current_symbol.real, current_symbol.imag
        pq = preceding_symbol.imag
        if cq > 0.0:
            dibit = 0 if ci > 0.0 else 1
        else:
            dibit = 2 if ci > 0.0 else 3
        polarity = ((1.0 if pq > cq else -1.0) if ci > 0.0
                    else (1.0 if pq < cq else -1.0))
        ref_angle = math.pi / 4.0 + math.pi / 2.0 * {0: 0, 1: 1, 3: 2,
                                                     2: 3}[dibit]
        rot = current_symbol * complex(math.cos(ref_angle),
                                       -math.sin(ref_angle))
        err = min(max(rot.imag, -0.3), 0.3)
        phase_error = -err
        timing_error = err * polarity

        detected = min(max(detected + timing_error * dsps_gain, sps_min),
                       sps_max)
        sampling_point += detected + timing_error * sample_counter_gain

        perr = min(max(phase_error, -0.5), 0.5)
        pll_freq += beta * perr
        pll_phase += pll_freq + alpha * perr
        if pll_phase > TWO_PI:
            pll_phase -= TWO_PI
        elif pll_phase < -TWO_PI:
            pll_phase += TWO_PI
        pll_freq = min(max(pll_freq, -max_pll), max_pll)

        prev_preceding = preceding
        prev_current = current
        dibits.append(dibit)

    return np.asarray(dibits, np.uint8)


def _aligned_ber(rx: np.ndarray, tx: np.ndarray, settle: int = 100,
                 span: int | None = None) -> float:
    """Best-alignment dibit error rate of rx against the known tx stream
    (2 bits per dibit counted as one symbol error)."""
    if span is None:
        span = len(tx) - settle - 50
    span = min(span, len(tx) - settle)
    best = 1.0
    for lag in range(0, max(1, len(rx) - settle - span)):
        seg = rx[lag + settle:lag + settle + span]
        if len(seg) < span:
            break
        best = min(best, float(np.mean(seg != tx[settle:settle + span])))
    return best


def parity_report(seed: int = 0, n_frames: int = 4,
                  sample_rate: float = 25000.0,
                  snr_db: float | None = None,
                  bits_path=None) -> dict:
    """Closed-loop parity numbers for the C4FM P25P1 chain."""
    import jax.numpy as jnp

    from .audio.recorder import BitsReader, BitsRecorder
    from .decoders.c4fm import C4FMConfig, C4FMDecoder
    from .protocol.p25p1.duid import DUID
    from .protocol.p25p1.framer import P25P1FrameAssembler, P25P1Framer
    from .protocol.p25p1.messages import decode_frame
    from .protocol.p25p1.tsbk import tsbk_encode
    from .signal import generators

    rng = np.random.default_rng(seed)
    asm = P25P1FrameAssembler(nac=0x293)
    args = rng.integers(0, 2, 64).astype(np.uint8)
    parts = [rng.integers(0, 4, 150).astype(np.uint8)]
    for _ in range(n_frames):
        parts += [asm.assemble(DUID.TSBK, tsbk_encode(0x3B, args)),
                  rng.integers(0, 4, 20).astype(np.uint8)]
    parts.append(np.zeros(40, np.uint8))
    tx = np.concatenate(parts)

    iq = generators.c4fm_modulate(tx, sample_rate).astype(np.complex64)
    if snr_db is not None:
        iq = generators.awgn(iq, snr_db, rng).astype(np.complex64)

    dec = C4FMDecoder(C4FMConfig(sample_rate=sample_rate))
    out, _ = dec(jnp.asarray(iq), dec.init_state())
    tpu_dibits = np.asarray(out["dibits"])[np.asarray(out["valid"])]

    host_dibits = host_c4fm_demod(
        iq, sample_rate, baseband_taps=np.asarray(dec.baseband_taps))

    def frames_of(dibits):
        out = []
        for f in P25P1Framer().process(dibits):
            m = decode_frame(f)
            if m.valid:
                out.append((m.duid.name, m.nac,
                            int(m.content.opcode)
                            if hasattr(m.content, "opcode") else -1))
        return out

    tpu_events = frames_of(tpu_dibits)
    host_events = frames_of(host_dibits)

    # .bits round trip in the reference byte format
    bits_roundtrip = None
    if bits_path is not None:
        rec = BitsRecorder(bits_path)
        rec.write(tpu_dibits)
        rec.close()
        back = BitsReader.read(bits_path)
        bits_roundtrip = bool(
            np.array_equal(back[:len(tpu_dibits)], tpu_dibits))

    n = min(len(tpu_dibits), len(host_dibits))
    return {
        "config": {"sample_rate": sample_rate, "frames": n_frames,
                   "snr_db": snr_db, "seed": seed},
        "tx_dibits": int(len(tx)),
        "tpu_dibits": int(len(tpu_dibits)),
        "host_dibits": int(len(host_dibits)),
        "tpu_ber_vs_truth": round(_aligned_ber(tpu_dibits, tx), 5),
        "host_ber_vs_truth": round(_aligned_ber(host_dibits, tx), 5),
        "path_agreement": round(
            float(np.mean(tpu_dibits[100:n] == host_dibits[100:n])), 5),
        "tpu_events": tpu_events,
        "host_events": host_events,
        "events_match": tpu_events == host_events,
        "frames_expected": n_frames,
        "frames_tpu": len(tpu_events),
        "frames_host": len(host_events),
        "bits_roundtrip_ok": bits_roundtrip,
    }


def main(argv=None) -> int:
    import argparse
    import tempfile

    p = argparse.ArgumentParser(prog="sdrtrunk_tpu.parity")
    p.add_argument("--snr-db", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--frames", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    with tempfile.NamedTemporaryFile(suffix=".bits") as f:
        rep = parity_report(seed=args.seed, n_frames=args.frames,
                            snr_db=args.snr_db, bits_path=f.name)
    print(json.dumps(rep))
    ok = (rep["events_match"] and rep["frames_tpu"] == args.frames
          and rep["tpu_ber_vs_truth"] < 0.01)
    return 0 if ok else 1


if __name__ == "__main__":
    import sys
    sys.exit(main())
