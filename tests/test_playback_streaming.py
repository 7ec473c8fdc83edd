"""Audio playback manager + Shoutcast/Broadcastify streaming clients."""
import numpy as np
import pytest

from sdrtrunk_tpu.audio.playback import (AudioOutput, AudioPlaybackManager,
                                         CollectorSink)
from sdrtrunk_tpu.audio.segments import AudioSegment
from sdrtrunk_tpu.audio.streaming import (BroadcastifyCallClient,
                                          ShoutcastV1Client, StreamConfig)


def _segment(priority=100, duplicate=False, complete=False,
             samples=800, **kw):
    s = AudioSegment(monitor_priority=priority, duplicate=duplicate, **kw)
    if samples:
        s.add_audio(np.zeros(samples, np.float32))
    if complete:
        s.complete_segment()
    return s


class FakeSocket:
    def __init__(self, response: bytes):
        self.sent = b""
        self._response = response
        self.closed = False

    def sendall(self, data):
        self.sent += data

    def recv(self, n):
        return self._response

    def close(self):
        self.closed = True


class TestPlaybackManager:
    def test_priority_assignment_fills_empty_outputs(self):
        mgr = AudioPlaybackManager(n_outputs=2)
        low = _segment(priority=200)
        high = _segment(priority=10)
        mid = _segment(priority=50)
        for s in (low, high, mid):
            mgr.receive(s)
        mgr.process()
        playing = [o.current for o in mgr.outputs]
        assert any(p is high for p in playing)
        assert any(p is mid for p in playing)
        assert not any(p is low for p in playing)

    def test_preemption_by_higher_priority(self):
        mgr = AudioPlaybackManager(n_outputs=1)
        low = _segment(priority=200)
        mgr.receive(low)
        mgr.process()
        assert mgr.outputs[0].current is low
        high = _segment(priority=5)
        mgr.receive(high)
        mgr.process()
        assert mgr.outputs[0].current is high

    def test_duplicate_suppression(self):
        mgr = AudioPlaybackManager(n_outputs=1)
        dup = _segment(duplicate=True)
        mgr.receive(dup)
        mgr.process()
        assert mgr.outputs[0].empty and mgr.dropped == 1
        mgr2 = AudioPlaybackManager(n_outputs=1,
                                    suppress_duplicates=False)
        mgr2.receive(_segment(duplicate=True))
        mgr2.process()
        assert not mgr2.outputs[0].empty

    def test_pending_until_audio_arrives(self):
        mgr = AudioPlaybackManager(n_outputs=1)
        s = _segment(samples=0)
        mgr.receive(s)
        mgr.process()
        assert mgr.outputs[0].empty
        s.add_audio(np.ones(160, np.float32))
        mgr.process()
        assert mgr.outputs[0].current is s

    def test_linked_segment_follows_call(self):
        mgr = AudioPlaybackManager(n_outputs=2)
        first = _segment(priority=50)
        mgr.receive(first)
        mgr.process()
        out = next(o for o in mgr.outputs if o.current is first)
        follow = _segment(priority=90)
        follow.linked_to = first
        mgr.receive(follow)
        mgr.process()
        assert out.current is follow

    def test_sink_receives_audio_and_releases_on_complete(self):
        sink = CollectorSink()
        out = AudioOutput("t", sink)
        s = _segment(samples=320)
        out.play(s)
        assert len(sink.played) == 1
        s.add_audio(np.ones(80, np.float32))
        out.pump()
        assert len(sink.played) == 2 and len(sink.played[1][1]) == 80
        s.complete_segment()
        out.pump()
        assert out.empty


class TestShoutcast:
    def _config(self):
        return StreamConfig(name="tpu-feed", host="h", port=8000,
                            password="pw")

    def test_handshake_ok(self):
        sock = FakeSocket(b"OK2\r\nicy-caps:11\r\n")
        client = ShoutcastV1Client(self._config(),
                                   lambda h, p: sock)
        assert client.connect()
        sent = sock.sent.decode()
        assert sent.startswith("pw\r\n")
        assert "icy-name:tpu-feed" in sent and "icy-br:16" in sent
        client.send(b"\xff\xfb")
        assert sock.sent.endswith(b"\xff\xfb")

    def test_bad_password(self):
        sock = FakeSocket(b"invalid password\r\n")
        client = ShoutcastV1Client(self._config(), lambda h, p: sock)
        assert not client.connect()
        assert "invalid" in client.last_error
        assert sock.closed
        with pytest.raises(ConnectionError):
            client.send(b"x")


class TestBroadcastify:
    def test_two_step_upload(self):
        posts, puts = [], []

        def http_post(url, content_type, body):
            posts.append((url, content_type, body))
            return "0 https://upload.example/abc"

        def http_put(url, data):
            puts.append((url, data))
            return 200

        c = BroadcastifyCallClient("KEY", 777, http_post, http_put)
        out = c.upload(b"MP3DATA", talkgroup=101, radio_id=5,
                       frequency_hz=853_212_500, timestamp=1700000000,
                       duration_s=4.5)
        assert out == "uploaded" and c.uploaded == 1
        url, ctype, body = posts[0]
        assert "call-upload" in url and "boundary=" in ctype
        text = body.decode()
        assert 'name="apiKey"\r\n\r\nKEY' in text
        assert 'name="tg"\r\n\r\n101' in text
        assert 'name="freq"\r\n\r\n853212500' in text
        assert puts[0] == ("https://upload.example/abc", b"MP3DATA")

    def test_skipped_and_error(self):
        c = BroadcastifyCallClient(
            "K", 1, lambda *a: "1 SKIPPED duplicate", lambda *a: 200)
        assert c.upload(b"x", talkgroup=1) == "skipped"
        c2 = BroadcastifyCallClient(
            "K", 1, lambda *a: "0 https://u", lambda *a: 500)
        assert c2.upload(b"x", talkgroup=1) == "error"
        assert c2.errors == 1


class TestIcecastMpegEgress:
    def test_icecast_e2e_layer2_stream_decodes(self):
        """End-to-end egress interop (VERDICT r4 item 7): a call
        segment streamed through the Icecast source client as MPEG
        Layer II must be a bitstream the independent ISO-text decoder
        (tests/test_mpeg_interop.py) reconstructs to the original
        tone."""
        from sdrtrunk_tpu.audio.mpeg import L2_FRAME_BYTES
        from sdrtrunk_tpu.audio.mpeg import mpeg_layer2_encoder
        from sdrtrunk_tpu.audio.streaming import (AudioStreamingManager,
                                                  IcecastSourceClient,
                                                  StreamConfig)
        from test_mpeg_interop import _Bits, _l2_decode_frame, _synthesis

        sock = FakeSocket(b"HTTP/1.1 100 Continue\r\n\r\n")
        client = IcecastSourceClient(
            StreamConfig(name="feed", password="pw"),
            lambda h, p: sock)
        assert client.connect()
        header_len = len(sock.sent)

        mgr = AudioStreamingManager(client,
                                    encoder=mpeg_layer2_encoder)
        seg = AudioSegment(start_time=0.0, sample_rate=8000.0)
        t = np.arange(16000) / 8000.0
        seg.add_audio((0.4 * np.sin(2 * np.pi * 700.0 * t)
                       ).astype(np.float32))
        seg.complete_segment()
        mgr.receive(seg)
        assert mgr.process(now=10.0) == 1

        payload = sock.sent[header_len:]
        assert len(payload) >= L2_FRAME_BYTES
        bits = _Bits(payload)
        frames = []
        while bits.pos + L2_FRAME_BYTES * 8 <= len(bits.bits):
            start = bits.pos
            frames.append(_l2_decode_frame(bits))
            bits.pos = start + L2_FRAME_BYTES * 8
        audio = _synthesis(np.concatenate(frames))
        segm = audio[4096:4096 + 16384]
        spec = np.abs(np.fft.rfft(segm * np.hanning(len(segm))))
        freqs = np.fft.rfftfreq(len(segm), 1 / 32000.0)
        assert abs(freqs[np.argmax(spec)] - 700.0) < 16.0
