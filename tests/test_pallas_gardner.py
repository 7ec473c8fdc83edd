"""Pallas Gardner DQPSK kernel vs the XLA scan (interpret mode on CPU):
dibit/valid exact, state allclose, including multi-grid-step carries and
chunked state handoff — the LSM/P25P2 analog of test_pallas_psk.py."""
import numpy as np
import jax
import jax.numpy as jnp

from sdrtrunk_tpu.dsp.psk import GardnerDQPSKDemodulator
from sdrtrunk_tpu.dsp.pallas_gardner import gardner_pallas_batched
from sdrtrunk_tpu.signal.generators import awgn, lsm_modulate, random_dibits


def _lsm_block(channels: int, t: int, seed: int = 7,
               rate: float = 25000.0, baud: float = 4800.0) -> np.ndarray:
    rows = []
    for c in range(channels):
        dib = random_dibits(int(t * baud / rate) + 16, seed=seed + c)
        x = lsm_modulate(dib, sample_rate=rate, symbol_rate=baud)
        x = awgn(x[:t], snr_db=30.0,
                 rng=np.random.default_rng(seed + 100 + c))
        rows.append(x[:t])
    return np.stack(rows).astype(np.complex64)


def _bstate(demod, c):
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (c,) + a.shape),
                        demod.init_state())


def test_gardner_interpret_matches_scan():
    demod = GardnerDQPSKDemodulator(sample_rate=25000.0, impl="xla")
    c, t = 3, 1024
    x = jnp.asarray(_lsm_block(c, t))
    state0 = _bstate(demod, c)

    d_ref, v_ref, s_ref = demod._scan_batched(x, state0)
    out = gardner_pallas_batched(demod, x, state0, interpret=True)
    assert out is not None
    d_k, v_k, s_k = out

    np.testing.assert_array_equal(np.asarray(v_k), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d_k)[np.asarray(v_k)],
                                  np.asarray(d_ref)[np.asarray(v_ref)])
    for leaf_k, leaf_ref in zip(jax.tree.leaves(s_k),
                                jax.tree.leaves(s_ref)):
        np.testing.assert_allclose(np.asarray(leaf_k),
                                   np.asarray(leaf_ref),
                                   rtol=1e-5, atol=1e-5)


def test_gardner_interpret_p25p2_rate():
    """6000-baud HDQPSK shapes (sps 4.17, window 11, nbase 4 — exercises
    the sliding integer base of the symbol-point fetch)."""
    demod = GardnerDQPSKDemodulator(sample_rate=25000.0,
                                    symbol_rate=6000.0,
                                    sample_counter_gain=0.1, impl="xla")
    c, t = 2, 1024
    x = jnp.asarray(_lsm_block(c, t, seed=31, baud=6000.0))
    state0 = _bstate(demod, c)
    d_ref, v_ref, s_ref = demod._scan_batched(x, state0)
    d_k, v_k, s_k = gardner_pallas_batched(demod, x, state0,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(v_k), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d_k)[np.asarray(v_k)],
                                  np.asarray(d_ref)[np.asarray(v_ref)])


def test_gardner_interpret_state_handoff():
    demod = GardnerDQPSKDemodulator(sample_rate=25000.0, impl="xla")
    c, t = 2, 1024
    x = jnp.asarray(_lsm_block(c, t, seed=21))
    state0 = _bstate(demod, c)
    d_all, v_all, _ = gardner_pallas_batched(demod, x, state0,
                                             interpret=True)
    half = t // 2
    d1, v1, s1 = gardner_pallas_batched(demod, x[:, :half], state0,
                                        interpret=True)
    d2, v2, _ = gardner_pallas_batched(demod, x[:, half:], s1,
                                       interpret=True)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(v1), np.asarray(v2)], axis=1),
        np.asarray(v_all))
    d_cat = np.concatenate([np.asarray(d1), np.asarray(d2)], axis=1)
    mask = np.asarray(v_all)
    np.testing.assert_array_equal(d_cat[mask], np.asarray(d_all)[mask])


def test_gardner_batched_forced_pallas():
    x = jnp.asarray(_lsm_block(1, 512, seed=3))
    d_p = GardnerDQPSKDemodulator(sample_rate=25000.0, impl="pallas")
    d_x = GardnerDQPSKDemodulator(sample_rate=25000.0, impl="xla")
    st = _bstate(d_p, 1)
    dp, vp, _ = d_p.batched(x, st)
    dx, vx, _ = d_x.batched(x, st)
    np.testing.assert_array_equal(np.asarray(vp), np.asarray(vx))
    np.testing.assert_array_equal(np.asarray(dp)[np.asarray(vp)],
                                  np.asarray(dx)[np.asarray(vx)])
