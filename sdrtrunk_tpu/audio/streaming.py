"""Audio streaming egress (role of audio/broadcast/: AudioStreamingManager
.java:46 delay queues + icecast/IcecastTCPAudioBroadcaster.java:43).

IcecastSourceClient speaks the Icecast2 HTTP PUT source protocol over any
socket-like object (connect/sendall/recv/close) so tests inject a fake
transport; MP3 conversion is a pluggable encoder callable (the reference
shells out to LAME — an external dependency — so PCM16 passthrough is the
default here).
"""
from __future__ import annotations

import base64
from collections import deque
from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from .segments import AudioSegment

__all__ = ["StreamConfig", "IcecastSourceClient", "AudioStreamingManager"]


@dataclass(frozen=True)
class StreamConfig:
    name: str
    host: str = "localhost"
    port: int = 8000
    mountpoint: str = "/stream"
    username: str = "source"
    password: str = ""
    content_type: str = "audio/mpeg"
    delay_seconds: float = 0.0


class IcecastSourceClient:
    """Minimal Icecast2 source: HTTP PUT + basic auth + raw frame stream."""

    def __init__(self, config: StreamConfig, socket_factory: Callable):
        self.config = config
        self._socket_factory = socket_factory
        self._socket = None
        self.connected = False

    def connect(self) -> bool:
        sock = self._socket_factory(self.config.host, self.config.port)
        auth = base64.b64encode(
            f"{self.config.username}:{self.config.password}".encode()
        ).decode()
        request = (
            f"PUT {self.config.mountpoint} HTTP/1.1\r\n"
            f"Host: {self.config.host}:{self.config.port}\r\n"
            f"Authorization: Basic {auth}\r\n"
            f"User-Agent: sdrtrunk-tpu\r\n"
            f"Content-Type: {self.config.content_type}\r\n"
            f"Ice-Name: {self.config.name}\r\n"
            f"Ice-Public: 0\r\n"
            f"Expect: 100-continue\r\n\r\n")
        sock.sendall(request.encode())
        response = sock.recv(4096).decode(errors="replace")
        if "100 Continue" in response or "200 OK" in response:
            self._socket = sock
            self.connected = True
            return True
        sock.close()
        return False

    def send(self, frames: bytes) -> None:
        if not self.connected:
            raise ConnectionError("not connected")
        self._socket.sendall(frames)

    def close(self) -> None:
        if self._socket is not None:
            self._socket.close()
        self.connected = False


def pcm16_encoder(segment: AudioSegment) -> bytes:
    pcm = np.clip(segment.samples, -1.0, 1.0)
    return (pcm * 32767.0).astype("<i2").tobytes()


class AudioStreamingManager:
    """Per-stream delay queue -> encoder -> client (the reference delays
    segments so streamed audio lags live playback)."""

    def __init__(self, client, encoder: Callable = pcm16_encoder,
                 delay_seconds: float = 0.0, streamable_filter=None):
        self.client = client
        self.encoder = encoder
        self.delay_seconds = delay_seconds
        self.streamable_filter = streamable_filter
        self._queue: deque = deque()
        self.sent_segments = 0

    def receive(self, segment: AudioSegment) -> None:
        if segment.duplicate:
            return
        if self.streamable_filter is not None and \
                not self.streamable_filter(segment):
            return
        self._queue.append(segment)

    def process(self, now: float) -> int:
        """Send all segments older than the delay; returns count sent."""
        sent = 0
        while self._queue and \
                now - self._queue[0].end_time >= self.delay_seconds:
            segment = self._queue.popleft()
            self.client.send(self.encoder(segment))
            self.sent_segments += 1
            sent += 1
        return sent
