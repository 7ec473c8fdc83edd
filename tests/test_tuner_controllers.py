"""Hardware tuner control planes driven against a recording USB
transport: every register sequence and encoding is asserted without
hardware.
"""
import struct

import pytest

from sdrtrunk_tpu.sources.airspy import (AirspyController, Command,
                                         LINEARITY_GAINS)
from sdrtrunk_tpu.sources.hackrf import (HackRFController, Request,
                                         select_baseband_filter)
from sdrtrunk_tpu.sources.rtl2832 import (R820TController,
                                          RTL2832Controller,
                                          SHADOW_INIT, pll_registers)
from sdrtrunk_tpu.sources.usb import (RecordingTransport, TransferProcessor,
                                      TransferState, UsbError)


class TestRTL2832:
    def test_sample_rate_ratio_and_reset(self):
        t = RecordingTransport()
        rtl = RTL2832Controller(t)
        actual = rtl.set_sample_rate(2_400_000)
        assert actual == 2_400_000
        writes = t.writes()
        # ratio high bits to page-1 demod register 0x9F
        assert writes[0].value == (0x9F << 8) | 0x20
        assert writes[0].index == 0x10 | 0x1
        assert writes[0].data == (0x0300).to_bytes(2, "big")
        # low ratio register zeroed, then correction, then demod reset
        assert writes[1].value == (0xA1 << 8) | 0x20
        assert writes[-2].data == b"\x14" and writes[-1].data == b"\x10"

    def test_closest_rate_selection(self):
        t = RecordingTransport()
        assert RTL2832Controller(t).set_sample_rate(2_500_000) == 2_560_000

    def test_ppm_correction_offset(self):
        t = RecordingTransport()
        rtl = RTL2832Controller(t)
        rtl.set_sample_rate_correction(10)
        offset = int(-10 * (1 << 22) / 1_000_000)
        low, high = t.writes()[-2:]
        assert low.data[0] == offset & 0xFF
        assert high.data[0] == (offset >> 8) & 0xFF


class TestR820TPLL:
    def test_pll_math_100mhz(self):
        # 100 MHz tune -> oscillator 103.57 MHz -> divider 4 (0x80),
        # integral 27 of 1.8 MHz units above 54 MHz, fractional SDM
        regs = pll_registers(103_570_000)
        assert regs["divider"] == 0x80
        delta = 103_570_000 - 54_000_000
        integral = delta // 1_800_000
        assert integral == 27
        n = integral + 1
        assert regs["pll"] == ((n & 3) << 6) | ((n >> 2) + 4)
        frac = (delta - integral * 1_800_000) / 1_800_000
        assert regs["sdm"] == int(frac * 0x10000) & 0xFFFF

    def test_vco_fine_tune_shifts_divider(self):
        base = pll_registers(103_570_000, vco_fine_tune=2)
        lower = pll_registers(103_570_000, vco_fine_tune=1)
        higher = pll_registers(103_570_000, vco_fine_tune=3)
        assert lower["divider"] == base["divider"] - 0x20
        assert higher["divider"] == base["divider"] + 0x20

    def test_exact_integral_no_sdm(self):
        # exactly 54 MHz + 10 * 1.8 MHz -> zero fractional part
        regs = pll_registers(54_000_000 + 10 * 1_800_000)
        assert regs["sdm"] == 0


class TestR820TController:
    def _tuner(self):
        t = RecordingTransport()
        return t, R820TController(RTL2832Controller(t))

    def test_masked_write_preserves_shadow(self):
        t, r = self._tuner()
        r.set_mixer_gain(5)
        # reg 0x07 shadow 0x75, mask 0x1F -> 0x60 | 5
        assert r.shadow[0x07] == (SHADOW_INIT[0x07] & ~0x1F) | 5
        assert t.writes()[-1].data == bytes([0x07, r.shadow[0x07]])

    def test_set_frequency_register_sequence(self):
        t, r = self._tuner()
        r.set_frequency(100_000_000)
        regs = [w.data[0] for w in t.writes()]
        # ref div, autotune, vco current, divider, pll, sdm power+msb+lsb,
        # autotune variant — in R820TTunerController.setPLL order
        assert regs[:4] == [0x10, 0x1A, 0x12, 0x10]
        assert 0x14 in regs and 0x15 in regs and 0x16 in regs
        assert regs[-1] == 0x1A
        assert r.frequency == 100_000_000

    def test_frequency_out_of_range(self):
        _, r = self._tuner()
        with pytest.raises(UsbError):
            r.set_frequency(5_000_000)

    def test_init_registers_writes_5_to_31(self):
        t, r = self._tuner()
        r.init_registers()
        assert [w.data[0] for w in t.writes()] == list(range(5, 32))
        assert [w.data[1] for w in t.writes()] == SHADOW_INIT[5:]


class TestHackRF:
    def test_frequency_mhz_hz_split(self):
        t = RecordingTransport()
        h = HackRFController(t)
        h.set_frequency(145_500_000)
        w = t.writes()[-1]
        assert w.request == Request.SET_FREQUENCY
        assert w.data == struct.pack("<II", 145, 500_000)

    def test_sample_rate_sets_matching_filter(self):
        t = RecordingTransport()
        h = HackRFController(t)
        h.set_sample_rate(10_000_000)
        rate_w, filt_w = t.writes()[-2:]
        assert rate_w.data == struct.pack("<II", 10_000_000, 1)
        bw = select_baseband_filter(10_000_000)
        assert bw == 7_000_000
        assert filt_w.value == bw & 0xFFFF
        assert filt_w.index == bw >> 16

    def test_gain_validation(self):
        h = HackRFController(RecordingTransport())
        with pytest.raises(UsbError):
            h.set_lna_gain(12)         # not an 8 dB step
        with pytest.raises(UsbError):
            h.set_vga_gain(63)
        h.set_lna_gain(24)
        h.set_vga_gain(20)


class TestAirspy:
    def test_read_sample_rates(self):
        t = RecordingTransport(responses={
            (Command.GET_SAMPLE_RATES, 0, 0): struct.pack("<I", 2),
            (Command.GET_SAMPLE_RATES, 0, 2):
                struct.pack("<2I", 10_000_000, 2_500_000)})
        a = AirspyController(t)
        assert a.read_sample_rates() == [10_000_000, 2_500_000]
        a.set_sample_rate(2_500_000)           # programs the rate INDEX
        assert t.transfers[-1].index == 1
        with pytest.raises(UsbError):
            a.set_sample_rate(3_000_000)

    def test_coupled_gain_program(self):
        t = RecordingTransport(default=b"\x00")
        a = AirspyController(t)
        a.set_gain(14, "linearity")
        cmds = [(tr.request, tr.index) for tr in t.transfers]
        vga, mixer, lna = LINEARITY_GAINS[14]
        assert cmds == [
            (Command.SET_MIXER_AGC, 0), (Command.SET_LNA_AGC, 0),
            (Command.SET_VGA_GAIN, vga), (Command.SET_MIXER_GAIN, mixer),
            (Command.SET_LNA_GAIN, lna)]

    def test_frequency_encoding(self):
        t = RecordingTransport()
        a = AirspyController(t)
        a.set_frequency(433_920_000)
        assert t.writes()[-1].data == struct.pack("<I", 433_920_000)


class TestTransferProcessor:
    def test_steady_state_keeps_pipeline_full(self):
        tp = TransferProcessor(lambda: True, n_transfers=4)
        tp.start()
        assert tp.in_flight == 4
        for _ in range(10):
            tp.on_complete(True)
        assert tp.in_flight == 4 and tp.completed == 10
        assert tp.state == TransferState.RUNNING

    def test_error_storm_restarts_then_fails(self):
        tp = TransferProcessor(lambda: True, n_transfers=2,
                               max_consecutive_errors=3, max_restarts=2)
        tp.start()
        # 3 consecutive errors -> restart; repeat past max_restarts
        for _ in range(3 * 3):
            tp.on_complete(False)
        assert tp.state == TransferState.ERROR

    def test_success_resets_error_counter(self):
        tp = TransferProcessor(lambda: True, n_transfers=2,
                               max_consecutive_errors=3, max_restarts=1)
        tp.start()
        for _ in range(20):
            tp.on_complete(False)
            tp.on_complete(True)
        assert tp.state == TransferState.RUNNING
