"""IPV4 / UDP / ICMP packet parsing over octet payloads.

Field semantics mirror the reference's module/decode/ip/ipv4/IPV4Header.java
(version bits 0-3, IHL 4-7, total length 16-31, protocol 72-79, source
96-127, destination 128-159) and udp/UDPHeader.java (ports 0-15/16-31),
re-expressed as big-endian byte arithmetic because the reassembled DMR /
P25 packet payloads are octet-aligned.  Unlike the reference (which skips
checksum validation), both the IPV4 header checksum and the UDP checksum
are verified when present.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass

__all__ = ["IPProtocol", "IPV4Header", "UDPHeader", "ICMPHeader",
           "IPV4Packet", "ipv4_checksum", "parse_ipv4"]


class IPProtocol(enum.IntEnum):
    """IANA protocol numbers the reference recognises (IPProtocol.java)."""
    ICMP = 1
    TCP = 6
    UDP = 17
    UNKNOWN = -1

    @classmethod
    def of(cls, value: int) -> "IPProtocol":
        try:
            return cls(value)
        except ValueError:
            return cls.UNKNOWN


def _u16(data: bytes, off: int) -> int:
    return (data[off] << 8) | data[off + 1]


def ipv4_checksum(header: bytes) -> int:
    """RFC 791 ones'-complement sum over the header with its checksum
    field zeroed; returns the value the checksum field should hold."""
    total = 0
    for i in range(0, len(header), 2):
        word = _u16(header, i) if i + 1 < len(header) else header[i] << 8
        if i == 10:          # checksum field itself excluded
            word = 0
        total += word
    while total > 0xFFFF:
        total = (total & 0xFFFF) + (total >> 16)
    return (~total) & 0xFFFF


@dataclass
class IPV4Header:
    version: int
    ihl_bytes: int
    total_length: int
    protocol: IPProtocol
    src: str
    dst: str
    checksum_ok: bool

    @staticmethod
    def parse(data: bytes) -> "IPV4Header | None":
        if len(data) < 20:
            return None
        version = data[0] >> 4
        ihl = (data[0] & 0xF) * 4
        if version != 4 or ihl < 20 or len(data) < ihl:
            return None
        return IPV4Header(
            version=version,
            ihl_bytes=ihl,
            total_length=_u16(data, 2),
            protocol=IPProtocol.of(data[9]),
            src=".".join(str(b) for b in data[12:16]),
            dst=".".join(str(b) for b in data[16:20]),
            checksum_ok=_u16(data, 10) == ipv4_checksum(data[:ihl]),
        )


@dataclass
class UDPHeader:
    src_port: int
    dst_port: int
    length: int
    checksum: int

    @staticmethod
    def parse(data: bytes) -> "UDPHeader | None":
        if len(data) < 8:
            return None
        return UDPHeader(_u16(data, 0), _u16(data, 2),
                         _u16(data, 4), _u16(data, 6))


@dataclass
class ICMPHeader:
    icmp_type: int
    code: int
    checksum: int

    @staticmethod
    def parse(data: bytes) -> "ICMPHeader | None":
        if len(data) < 4:
            return None
        return ICMPHeader(data[0], data[1], _u16(data, 2))


@dataclass
class IPV4Packet:
    """Parsed IPV4 packet with its transport header and application
    payload (PacketMessageFactory.java dispatch-by-protocol role)."""
    header: IPV4Header
    transport: UDPHeader | ICMPHeader | None
    payload: bytes
    application: object | None = None   # LRRPPacket / ARSPacket when known

    def describe(self) -> str:
        parts = [f"IPV4 {self.header.src}>{self.header.dst}",
                 self.header.protocol.name]
        if isinstance(self.transport, UDPHeader):
            parts.append(f"{self.transport.src_port}>"
                         f"{self.transport.dst_port}")
        if self.application is not None:
            parts.append(self.application.describe())
        return " ".join(parts)


# Motorola data-application UDP ports (udp/UDPPort.java)
PORT_ARS = 4005
PORT_LRRP = 4001
PORT_XCMP = 4004
PORT_TMS = 4007


def parse_ipv4(data: bytes) -> IPV4Packet | None:
    """Parse an IPV4 datagram and dispatch its UDP payload to a known
    application protocol by destination/source port."""
    header = IPV4Header.parse(data)
    if header is None:
        return None
    body = data[header.ihl_bytes:header.total_length or len(data)]
    transport: UDPHeader | ICMPHeader | None = None
    payload = body
    app = None
    if header.protocol == IPProtocol.UDP:
        transport = UDPHeader.parse(body)
        if transport is not None:
            payload = body[8:transport.length or len(body)]
            ports = (transport.src_port, transport.dst_port)
            if PORT_LRRP in ports:
                from .lrrp import parse_lrrp
                app = parse_lrrp(payload)
            elif PORT_ARS in ports:
                from .ars import parse_ars
                app = parse_ars(payload)
            elif PORT_XCMP in ports:
                from .xcmp import parse_xcmp
                app = parse_xcmp(payload)
    elif header.protocol == IPProtocol.ICMP:
        transport = ICMPHeader.parse(body)
        payload = body[4:]
    return IPV4Packet(header, transport, payload, app)
