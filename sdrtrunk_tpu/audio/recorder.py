"""Audio + bitstream recording (role of record/AudioSegmentRecorder
(WAV with metadata), record/binary/BinaryRecorder.java:51 (.bits
demodulated bitstream) and BinaryReader).

.bits files are byte-packed dibit streams identical to the reference's
format (each byte holds 4 dibits, MSB-first) so recordings interchange as
golden vectors.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..io.wave import read_real_wave, write_real_wave
from .segments import AudioSegment

__all__ = ["write_audio_wave", "read_audio_wave", "BitsRecorder",
           "BitsReader"]


def write_audio_wave(path, segment: AudioSegment) -> None:
    """WAV + sidecar JSON metadata (identifier values, times) — the role
    of the reference's ID3/LIST metadata chunks."""
    path = Path(path)
    write_real_wave(path, segment.samples, int(segment.sample_rate))
    meta = {
        "start_time": segment.start_time,
        "duration": segment.duration,
        "sample_rate": segment.sample_rate,
        "timeslot": segment.timeslot,
        "identifiers": [
            {"class": i.identifier_class.value, "form": i.form.value,
             "role": i.role.value, "value": i.value,
             "protocol": i.protocol}
            for i in segment.identifiers.all()],
    }
    path.with_suffix(path.suffix + ".json").write_text(json.dumps(meta))


def read_audio_wave(path):
    """-> (samples float32, rate, metadata dict | None)."""
    path = Path(path)
    samples, rate = read_real_wave(path)
    meta_path = path.with_suffix(path.suffix + ".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else None
    return samples, rate, meta


class BitsRecorder:
    """Append dibits to a .bits file (4 dibits/byte, MSB-first — the
    reference BinaryRecorder byte layout, Dibit.parse(value, x))."""

    def __init__(self, path):
        self.path = Path(path)
        self._pending = np.zeros(0, np.uint8)
        self.path.write_bytes(b"")

    def write(self, dibits: np.ndarray) -> None:
        d = np.concatenate([self._pending, np.asarray(dibits, np.uint8)])
        n = (len(d) // 4) * 4
        chunk, self._pending = d[:n], d[n:]
        if n:
            q = chunk.reshape(-1, 4)
            packed = (q[:, 0] << 6) | (q[:, 1] << 4) | (q[:, 2] << 2) | q[:, 3]
            with open(self.path, "ab") as fh:
                fh.write(packed.astype(np.uint8).tobytes())

    def close(self) -> None:
        if len(self._pending):
            self.write(np.zeros(4 - len(self._pending) % 4, np.uint8))


class BitsReader:
    @staticmethod
    def read(path) -> np.ndarray:
        """-> dibit array."""
        data = np.frombuffer(Path(path).read_bytes(), np.uint8)
        out = np.empty(4 * len(data), np.uint8)
        out[0::4] = (data >> 6) & 3
        out[1::4] = (data >> 4) & 3
        out[2::4] = (data >> 2) & 3
        out[3::4] = data & 3
        return out
