"""P25 link control word (72 bits) parsing + construction.

Format (TIA-102.AABF; reference lc/LinkControlWord.java + subclasses):
PF(1) SF(1) LCO(6) then opcode-specific fields. Standard-MFID layouts for
the common voice-call opcodes are parsed into dicts.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bits import from_int, to_int

__all__ = ["LinkControl", "lc_parse", "lc_build_group_voice"]

LCO_NAMES = {
    0x00: "GROUP_VOICE_CHANNEL_USER",
    0x02: "GROUP_VOICE_CHANNEL_UPDATE",
    0x03: "UNIT_TO_UNIT_VOICE_CHANNEL_USER",
    0x04: "GROUP_VOICE_CHANNEL_UPDATE_EXPLICIT",
    0x05: "UNIT_TO_UNIT_ANSWER_REQUEST",
    0x07: "TELEPHONE_INTERCONNECT_VOICE_CHANNEL_USER",
    0x0F: "CALL_TERMINATION_OR_CANCELLATION",
    0x10: "GROUP_AFFILIATION_QUERY",
    0x11: "UNIT_REGISTRATION_COMMAND",
    0x13: "STATUS_QUERY",
    0x14: "STATUS_UPDATE",
    0x15: "MESSAGE_UPDATE",
    0x16: "CALL_ALERT",
    0x17: "EXTENDED_FUNCTION_COMMAND",
    0x18: "CHANNEL_IDENTIFIER_UPDATE",
    0x20: "ADJACENT_SITE_STATUS_BROADCAST",
    0x21: "RFSS_STATUS_BROADCAST",
    0x22: "NETWORK_STATUS_BROADCAST",
    0x24: "SYSTEM_SERVICE_BROADCAST",
}


@dataclass
class LinkControl:
    protected: bool
    implicit: bool
    opcode: int
    raw: np.ndarray              # full 72 bits
    fields: dict = field(default_factory=dict)

    @property
    def opcode_name(self) -> str:
        return LCO_NAMES.get(self.opcode, f"LCO_{self.opcode:02X}")


def lc_parse(bits72: np.ndarray) -> LinkControl:
    b = np.asarray(bits72, np.uint8)
    if len(b) != 72:
        raise ValueError("link control word must be 72 bits")
    lc = LinkControl(protected=bool(b[0]), implicit=not bool(b[1]),
                     opcode=to_int(b, 2, 8), raw=b)
    mfid = to_int(b, 8, 16)
    if mfid in (0x00, 0x01):
        if lc.opcode == 0x00:   # group voice channel user
            lc.fields = {
                "mfid": mfid,
                "service_options": to_int(b, 16, 24),
                "group_address": to_int(b, 32, 48),
                "source_address": to_int(b, 48, 72),
            }
        elif lc.opcode == 0x03:  # unit-to-unit voice channel user
            lc.fields = {
                "mfid": mfid,
                "service_options": to_int(b, 16, 24),
                "target_address": to_int(b, 24, 48),
                "source_address": to_int(b, 48, 72),
            }
        elif lc.opcode == 0x0F:  # call termination
            lc.fields = {"mfid": mfid, "source_address": to_int(b, 48, 72)}
    return lc


def lc_build_group_voice(group: int, source: int,
                         service_options: int = 0) -> np.ndarray:
    """72-bit GROUP_VOICE_CHANNEL_USER link control word."""
    return np.concatenate([
        from_int(0, 2),                 # PF=0, SF=0 (implicit MFID)
        from_int(0x00, 6),              # LCO
        from_int(0x00, 8),              # MFID
        from_int(service_options, 8),
        from_int(0, 8),                 # reserved
        from_int(group, 16),
        from_int(source, 24),
    ])
