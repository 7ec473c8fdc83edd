"""CPU coverage for the TPU-only fast paths.

Two production TPU paths are exercised here without TPU hardware:

* the Pallas decision-directed DQPSK kernel (dsp/pallas_psk.py), run in
  Pallas interpret mode and asserted dibit/valid/state-identical to the
  XLA scan (dsp/psk.py _scan_batched) — including carried-state handoff
  across calls and across grid steps;
* the MXU matmul IFFT (dsp/channelizer.py _matmul_ifft), compared
  directly against numpy's FFT and decode-through at the documented
  tolerance.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrtrunk_tpu.dsp.psk import DQPSKDemodulator
from sdrtrunk_tpu.dsp.pallas_psk import dqpsk_pallas_batched, _pick_chunk
from sdrtrunk_tpu.signal.generators import awgn, c4fm_modulate, random_dibits


def _c4fm_block(channels: int, t: int, seed: int = 7,
                rate: float = 25000.0) -> np.ndarray:
    """(C, T) complex64 C4FM test signal, distinct dibits per channel."""
    rows = []
    for c in range(channels):
        dib = random_dibits(t // 5 + 16, seed=seed + c)
        x = c4fm_modulate(dib, sample_rate=rate)[:t]
        x = awgn(x, snr_db=30.0, rng=np.random.default_rng(seed + 100 + c))
        rows.append(x[:t])
    return np.stack(rows).astype(np.complex64)


def test_pick_chunk_divisors():
    assert _pick_chunk(1024) == 512
    assert _pick_chunk(4096) == 512
    assert _pick_chunk(1000) % 8 == 0 or _pick_chunk(1000) == 0
    assert _pick_chunk(7) == 0          # no multiple-of-8 divisor


def test_pallas_interpret_matches_scan():
    """Kernel vs XLA scan: dibit/valid exact, state allclose — multi
    grid-step (T=1024 -> tc=512, grid=2) so carried state crosses grid
    boundaries inside one call."""
    demod = DQPSKDemodulator(sample_rate=25000.0, impl="xla")
    c, t = 3, 1024
    x = jnp.asarray(_c4fm_block(c, t))
    state0 = jax.tree.map(lambda a: jnp.broadcast_to(a, (c,) + a.shape),
                          demod.init_state())

    d_ref, v_ref, s_ref = demod._scan_batched(x, state0)
    out = dqpsk_pallas_batched(demod, x, state0, interpret=True)
    assert out is not None
    d_k, v_k, s_k = out

    np.testing.assert_array_equal(np.asarray(v_k), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d_k)[np.asarray(v_k)],
                                  np.asarray(d_ref)[np.asarray(v_ref)])
    for leaf_k, leaf_ref in zip(jax.tree.leaves(s_k), jax.tree.leaves(s_ref)):
        np.testing.assert_allclose(np.asarray(leaf_k), np.asarray(leaf_ref),
                                   rtol=1e-5, atol=1e-5)


def test_pallas_interpret_state_handoff():
    """Two sequential kernel calls == one call over the concatenation
    (the chunked-streaming contract the live orchestrator relies on)."""
    demod = DQPSKDemodulator(sample_rate=25000.0, impl="xla")
    c, t = 2, 1024
    x = jnp.asarray(_c4fm_block(c, t, seed=21))
    state0 = jax.tree.map(lambda a: jnp.broadcast_to(a, (c,) + a.shape),
                          demod.init_state())

    d_all, v_all, _ = dqpsk_pallas_batched(demod, x, state0, interpret=True)
    half = t // 2
    d1, v1, s1 = dqpsk_pallas_batched(demod, x[:, :half], state0,
                                      interpret=True)
    d2, v2, _ = dqpsk_pallas_batched(demod, x[:, half:], s1, interpret=True)

    np.testing.assert_array_equal(
        np.concatenate([np.asarray(v1), np.asarray(v2)], axis=1),
        np.asarray(v_all))
    d_cat = np.concatenate([np.asarray(d1), np.asarray(d2)], axis=1)
    mask = np.asarray(v_all)
    np.testing.assert_array_equal(d_cat[mask], np.asarray(d_all)[mask])


def test_batched_auto_uses_pallas_when_forced():
    """impl='pallas' exercises the dispatch in DQPSKDemodulator.batched on
    CPU via interpret mode and agrees with impl='xla'."""
    x = jnp.asarray(_c4fm_block(1, 512, seed=3))
    d_p = DQPSKDemodulator(sample_rate=25000.0, impl="pallas")
    d_x = DQPSKDemodulator(sample_rate=25000.0, impl="xla")
    c = x.shape[0]
    st = jax.tree.map(lambda a: jnp.broadcast_to(a, (c,) + a.shape),
                      d_p.init_state())
    dp, vp, _ = d_p.batched(x, st)
    dx, vx, _ = d_x.batched(x, st)
    np.testing.assert_array_equal(np.asarray(vp), np.asarray(vx))
    np.testing.assert_array_equal(np.asarray(dp)[np.asarray(vp)],
                                  np.asarray(dx)[np.asarray(vx)])


# --- matmul IFFT (the TPU channelizer fast path) -----------------------


def test_matmul_ifft_vs_numpy():
    """_matmul_ifft == numpy ifft within the documented 4e-4 at unit
    scale (float32 tables -> deterministic on CPU)."""
    from sdrtrunk_tpu.dsp.channelizer import _matmul_ifft
    rng = np.random.default_rng(0)
    for m in (64, 256, 1024):
        u = (rng.standard_normal((32, m)) +
             1j * rng.standard_normal((32, m))).astype(np.complex64)
        u /= np.max(np.abs(u))                       # unit scale
        got = np.asarray(_matmul_ifft(jnp.asarray(u), m))
        want = np.fft.ifft(u, axis=-1)
        assert np.max(np.abs(got - want)) <= 4e-4


def test_matmul_ifft_decode_through():
    """Full decode through the channelizer with the matmul IFFT forced:
    dibits recovered from a channelized C4FM carrier agree with the
    jnp.fft path (bf16-equivalent tolerance = identical dibits after
    sync settle)."""
    from sdrtrunk_tpu.dsp import channelizer as chmod
    from sdrtrunk_tpu.receiver import WidebandReceiver

    fs = 400_000.0                        # 32 channels @ 12.5 kHz
    dib = random_dibits(400, seed=5)
    carrier = c4fm_modulate(dib, sample_rate=25000.0)
    ch_probe = chmod.Channelizer.design(fs, 12500.0)
    offset = ch_probe.center_frequency(3)
    up_factor = int(fs / 25000.0)
    n = (len(carrier) * up_factor // ch_probe.channels) * ch_probe.channels
    t_ax = np.arange(n) / fs
    up = np.interp(np.arange(n) * 25000.0 / fs, np.arange(len(carrier)),
                   carrier.real) + 1j * np.interp(
        np.arange(n) * 25000.0 / fs, np.arange(len(carrier)), carrier.imag)
    wide = (up * np.exp(2j * np.pi * offset * t_ax)).astype(np.complex64)

    def run():
        rx = WidebandReceiver(fs, [offset], decoder="c4fm")
        step = rx.build()
        out, _ = step(jnp.asarray(wide), rx.init_state())
        d = np.asarray(out["dibits"][0])
        v = np.asarray(out["valid"][0])
        return d[v]

    prev = chmod.set_ifft_impl("fft")
    try:
        chmod._channelize_core.clear_cache()
        ref = run()
        chmod.set_ifft_impl("matmul")
        chmod._channelize_core.clear_cache()
        got = run()
    finally:
        chmod.set_ifft_impl(prev)
        chmod._channelize_core.clear_cache()

    # identical symbol stream once both PLLs settle
    assert len(got) == len(ref)
    settle = 50
    agree = np.mean(got[settle:] == ref[settle:])
    assert agree >= 0.999, f"dibit agreement {agree}"
