"""Two-bin wide channels through planning + extraction + receiver
(VERDICT round-1 item 6; reference TwoChannelOutputProcessor.java:26,
ChannelCalculator.java:223 multi-bin channels).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from sdrtrunk_tpu.dsp.channelizer import Channelizer
from sdrtrunk_tpu.dsp.extract import extract_channels, plan_channels
from sdrtrunk_tpu.receiver import WidebandReceiver
from sdrtrunk_tpu.signal import generators

FS = 32 * 12500.0


def test_plan_mixed_single_and_two_bin():
    ch = Channelizer.design(FS, 12500.0)
    plan = plan_channels(ch, [25000.0, 31250.0, -50000.0],
                         [12500.0, 25000.0, 25000.0])
    assert plan.bins[0, 0] == plan.bins[0, 1]            # single
    assert not plan.wide[0] and plan.wide[1] and plan.wide[2]
    # 31.25 kHz sits midway between bins 2 (25 kHz) and 3 (37.5 kHz)
    assert tuple(plan.bins[1]) == (2, 3)
    assert plan.offsets[1] == pytest.approx(0.0)
    # -50 kHz requested wide: straddles bins -5/-4 or -4/-3; residual
    # must be within half a bin of the served center
    assert abs(plan.offsets[2]) <= 12500.0 / 2 + 1e-6


def test_plan_rejects_more_than_two_bins():
    ch = Channelizer.design(FS, 12500.0)
    with pytest.raises(ValueError):
        plan_channels(ch, [0.0], [30000.0])


def test_joint_band_flat_through_extraction():
    """Tone sweep across the 25 kHz joint band of a 2-bin channel: unit
    gain through the passband (the PR property), the reference's design
    -6.02 dB exactly at the band edges (FilterFactory.java:808 band-edge
    objective), and exact frequency mapping."""
    ch = Channelizer.design(FS, 12500.0)
    center = 31250.0                       # midway between bins 2 and 3
    plan = plan_channels(ch, [center], [25000.0])
    rate = ch.channel_sample_rate          # 25 kHz
    n = 8192 * 8
    for df in (-9000.0, -6250.0, -1000.0, 0.0, 3000.0, 6250.0, 9000.0):
        tone = generators.tone(center + df, FS, n)
        y, _ = ch(jnp.asarray(tone))
        streams, _ = extract_channels(y, plan)
        z = np.asarray(streams[0])[64:]    # drop filter transient
        amp = np.mean(np.abs(z))
        assert amp == pytest.approx(1.0, abs=0.02), df
        # instantaneous frequency must equal the offset from channel center
        dphi = np.angle(z[1:] * np.conj(z[:-1]))
        f_meas = np.mean(dphi) * rate / (2 * np.pi)
        assert f_meas == pytest.approx(df, abs=30.0), df
    for df in (-12500.0, 12500.0):         # band edge: -6.02 dB
        tone = generators.tone(center + df, FS, n)
        y, _ = ch(jnp.asarray(tone))
        streams, _ = extract_channels(y, plan)
        amp = np.mean(np.abs(np.asarray(streams[0])[64:]))
        assert 20 * np.log10(amp) == pytest.approx(-6.02, abs=0.3), df


def test_two_bin_chunked_matches_oneshot():
    """Streaming rotator/mixer carry across chunks: chunked == one-shot."""
    rng = np.random.default_rng(0)
    ch = Channelizer.design(FS, 12500.0)
    plan = plan_channels(ch, [31250.0 + 1000.0], [25000.0])
    n = 64 * 32
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)

    y, _ = ch(jnp.asarray(x))
    ref, _ = extract_channels(y, plan)

    state = None
    chan_state = None
    outs = []
    for piece in np.split(x, 4):
        y, chan_state = ch(jnp.asarray(piece), chan_state)
        s, state = extract_channels(y, plan, state)
        outs.append(np.asarray(s))
    chunked = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(chunked, np.asarray(ref), atol=2e-5)


def test_25khz_nbfm_on_12p5_grid():
    """A 25 kHz-wide NBFM transmission centered between two 12.5 kHz bins
    decodes through the full receiver via the two-bin path."""
    from sdrtrunk_tpu.decoders.nbfm import NBFMConfig, NBFMDecoder

    center = 31250.0
    audio_hz = 1100.0
    audio = np.sin(2 * np.pi * audio_hz *
                   np.arange(int(0.25 * 8000)) / 8000)
    iq = generators.nbfm_modulate(audio, 8000, FS, deviation_hz=5000.0)
    n = len(iq) // 32 * 32
    t = np.arange(n) / FS
    wide = (iq[:n] * np.exp(2j * np.pi * center * t)).astype(np.complex64)

    ch_rate = 25000.0
    rx = WidebandReceiver(
        FS, [center], channel_bandwidths=[25000.0],
        decoder=NBFMDecoder(NBFMConfig(sample_rate=ch_rate,
                                       bandwidth=25000.0)))
    assert rx.plan.wide[0]
    step = rx.build()
    out, _ = step(jnp.asarray(wide), rx.init_state())
    audio_rx = np.asarray(out["audio"][0])[800:]
    spec = np.abs(np.fft.rfft(audio_rx))
    f = np.fft.rfftfreq(len(audio_rx), 1 / 8000)
    assert f[np.argmax(spec)] == pytest.approx(audio_hz, abs=20.0)


def test_synthesize_bank_round_trip():
    """Full M-channel synthesis bank: analysis(synthesize(u)) == u
    (delayed, unit gain) — tone exactness + C4FM decode-through."""
    import jax.numpy as jnp
    from sdrtrunk_tpu.dsp.channelizer import Channelizer
    from sdrtrunk_tpu.dsp.synthesizer import synthesize_bank
    from sdrtrunk_tpu.receiver import WidebandReceiver
    from sdrtrunk_tpu.signal.generators import c4fm_modulate, random_dibits

    ch = Channelizer.design(32 * 12500.0, 12500.0)
    m = ch.channels
    k = 2048
    u = np.zeros((k, m), np.complex64)
    u[:, 5] = np.exp(1j * 0.3)
    tx = random_dibits(420, seed=3)
    carrier = c4fm_modulate(tx, sample_rate=ch.channel_sample_rate)
    u[:, 9] = carrier[:k]
    x = synthesize_bank(u, np.asarray(ch.hmat))
    n = len(x) // m * m
    y, _ = ch(jnp.asarray(x[:n]))
    y = np.asarray(y)
    settle = 4 * ch.taps_per_channel
    mid = y[settle:k - settle]
    # tone bin: unit round-trip gain, exact phase
    np.testing.assert_allclose(np.abs(mid[:, 5]), 1.0, atol=2e-3)
    np.testing.assert_allclose(np.angle(mid[:, 5]), 0.3, atol=2e-3)
    # C4FM bin decodes with zero BER through the round trip
    rx = WidebandReceiver(32 * 12500.0, [ch.center_frequency(9)],
                          decoder="c4fm")
    step = rx.build()
    out, _ = step(jnp.asarray(x[:n]), rx.init_state())
    dib = np.asarray(out["dibits"][0])[np.asarray(out["valid"][0])]
    # align recovered dibits against tx (skip acquisition)
    s = "".join(map(str, tx))
    r = "".join(map(str, dib[40:300]))
    assert r in s
