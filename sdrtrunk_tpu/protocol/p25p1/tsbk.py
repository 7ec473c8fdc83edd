"""P25 trunking signaling block (TSBK) codec + opcode parsing.

Wire format (TIA-102.BAAB; reference TSBKMessage/TSBKMessageFactory):
196 payload bits = interleave(trellis_1/2(96 bits)), where the 96 bits are
LB(1) P(1) OPCODE(6) MFID(8) ARGS(64) CRC-CCITT(16, complemented).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bits import from_int, to_int
from ..edac.crc import check_crc16_ccitt, crc16_ccitt
from ..edac.trellis import TRELLIS_1_2_P25, deinterleave_p25, interleave_p25

__all__ = ["TSBK", "tsbk_encode", "tsbk_decode", "OSP_OPCODES"]

# common outbound (OSP) opcodes — module/decode/p25/reference/Opcode.java
OSP_OPCODES = {
    0x00: "GRP_V_CH_GRANT",
    0x02: "GRP_V_CH_GRANT_UPDT",
    0x03: "GRP_V_CH_GRANT_UPDT_EXP",
    0x04: "UU_V_CH_GRANT",
    0x05: "UU_ANS_REQ",
    0x06: "UU_V_CH_GRANT_UPDT",
    0x14: "SNDCP_DATA_CH_GNT",
    0x18: "STS_UPDT",
    0x1A: "MSG_UPDT",
    0x1C: "RAD_MON_CMD",
    0x1F: "CALL_ALRT",
    0x20: "ACK_RSP_FNE",
    0x21: "QUE_RSP",
    0x24: "EXT_FNCT_CMD",
    0x27: "DENY_RSP",
    0x28: "GRP_AFF_RSP",
    0x29: "SCCB_EXP",
    0x2A: "GRP_AFF_Q",
    0x2B: "LOC_REG_RSP",
    0x2C: "U_REG_RSP",
    0x2D: "U_REG_CMD",
    0x2F: "U_DE_REG_ACK",
    0x30: "SYNC_BCST",
    0x34: "IDEN_UP_VU",
    0x35: "TIME_DATE_ANN",
    0x39: "SCCB",
    0x3A: "RFSS_STS_BCST",
    0x3B: "NET_STS_BCST",
    0x3C: "ADJ_STS_BCST",
    0x3D: "IDEN_UP",
}


@dataclass
class TSBK:
    last_block: bool
    protected: bool
    opcode: int
    mfid: int
    args: np.ndarray            # 64 bits
    corrected: int = 0
    fields: dict = field(default_factory=dict)

    @property
    def opcode_name(self) -> str:
        return OSP_OPCODES.get(self.opcode, f"OPCODE_{self.opcode:02X}")


def tsbk_encode(opcode: int, args: np.ndarray, mfid: int = 0,
                last_block: bool = True, protected: bool = False
                ) -> np.ndarray:
    """-> 196 on-air payload bits."""
    args = np.asarray(args, np.uint8)
    if len(args) != 64:
        raise ValueError("TSBK args must be 64 bits")
    body = np.concatenate([
        np.array([int(last_block), int(protected)], np.uint8),
        from_int(opcode, 6), from_int(mfid, 8), args])
    crc = crc16_ccitt(body)  # complemented per TIA-102.BAAB
    block96 = np.concatenate([body, from_int(crc, 16)])
    return interleave_p25(TRELLIS_1_2_P25.encode(block96))


def tsbk_decode(payload196: np.ndarray) -> TSBK | None:
    deint = deinterleave_p25(np.asarray(payload196, np.uint8))
    block96, errors = TRELLIS_1_2_P25.decode(deint)
    if not check_crc16_ccitt(block96, 80):
        return None
    tsbk = TSBK(
        last_block=bool(block96[0]),
        protected=bool(block96[1]),
        opcode=to_int(block96, 2, 8),
        mfid=to_int(block96, 8, 16),
        args=block96[16:80],
        corrected=errors,
    )
    tsbk.fields = _parse_args(tsbk)
    return tsbk


def _parse_args(t: TSBK) -> dict:
    """Field extraction for common OSP opcodes (standard MFID only)."""
    a = t.args
    if t.mfid not in (0x00, 0x01):
        return {}
    if t.opcode == 0x00:       # group voice channel grant
        return {
            "service_options": to_int(a, 0, 8),
            "frequency_band": to_int(a, 8, 12),
            "channel_number": to_int(a, 12, 24),
            "group_address": to_int(a, 24, 40),
            "source_address": to_int(a, 40, 64),
        }
    if t.opcode == 0x02:       # group voice channel grant update (2 grants)
        return {
            "frequency_band_1": to_int(a, 0, 4),
            "channel_number_1": to_int(a, 4, 16),
            "group_address_1": to_int(a, 16, 32),
            "frequency_band_2": to_int(a, 32, 36),
            "channel_number_2": to_int(a, 36, 48),
            "group_address_2": to_int(a, 48, 64),
        }
    if t.opcode == 0x04:       # unit-to-unit voice channel grant
        return {
            "frequency_band": to_int(a, 0, 4),
            "channel_number": to_int(a, 4, 16),
            "target_address": to_int(a, 16, 40),
            "source_address": to_int(a, 40, 64),
        }
    if t.opcode in (0x34, 0x3D):  # IDEN_UP (VHF/UHF and general)
        if t.opcode == 0x3D:
            return {
                "identifier": to_int(a, 0, 4),
                "bandwidth_khz": to_int(a, 4, 13) * 0.125,
                "transmit_offset_mhz": to_int(a, 13, 22) * 0.25,
                "channel_spacing_khz": to_int(a, 22, 32) * 0.125,
                "base_frequency_mhz": to_int(a, 32, 64) * 5e-6,
            }
        return {
            "identifier": to_int(a, 0, 4),
            "bandwidth_vu": to_int(a, 4, 8),
            "transmit_offset_sign": to_int(a, 8, 9),
            "transmit_offset": to_int(a, 9, 22),
            "channel_spacing_khz": to_int(a, 22, 32) * 0.125,
            "base_frequency_mhz": to_int(a, 32, 64) * 5e-6,
        }
    if t.opcode == 0x3B:       # network status broadcast
        return {
            "location_registration_area": to_int(a, 0, 8),
            "wacn": to_int(a, 8, 28),
            "system_id": to_int(a, 28, 40),
            "frequency_band": to_int(a, 40, 44),
            "channel_number": to_int(a, 44, 56),
            "system_service_class": to_int(a, 56, 64),
        }
    if t.opcode == 0x3A:       # RFSS status broadcast
        return {
            "location_registration_area": to_int(a, 0, 8),
            "system_id": to_int(a, 8, 20),
            "rfss_id": to_int(a, 20, 28),
            "site_id": to_int(a, 28, 36),
            "frequency_band": to_int(a, 36, 40),
            "channel_number": to_int(a, 40, 52),
            "system_service_class": to_int(a, 52, 60),
        }
    if t.opcode == 0x3C:       # adjacent status broadcast
        return {
            "location_registration_area": to_int(a, 0, 8),
            "system_id": to_int(a, 8, 20),
            "rfss_id": to_int(a, 20, 28),
            "site_id": to_int(a, 28, 36),
            "frequency_band": to_int(a, 36, 40),
            "channel_number": to_int(a, 40, 52),
            "system_service_class": to_int(a, 52, 60),
        }
    if t.opcode == 0x28:       # group affiliation response
        return {
            "group_affiliation_value": to_int(a, 0, 8),
            "announcement_group": to_int(a, 8, 24),
            "group_address": to_int(a, 24, 40),
            "target_address": to_int(a, 40, 64),
        }
    return {}
