"""DMR BANK framer: burst-frame ALL channels of a slot bank in one
vectorized pass per chunk — the DMR sibling of
protocol/p25p1/bankframer.py (scaling tier of DMRMessageFramer /
DMRBurstFramer, module/decode/dmr/DMRMessageFramer.java:61).

Vectorized across channels:
  * sync detection (device hit mask, or host correlation of the seven
    48-bit patterns via the dibit-difference LUT) and pattern
    classification at every candidate;
  * rolling per-slot symbol windows carried as one (C, retain) array.

Per burst (a few thousand per second at 1000-channel scale) the proven
per-slot decode path runs unchanged: DMRFramer._frame_burst — CACH,
slot type, EMB, CSBK/LC/voice content — so bank framing and per-slot
framing are byte-identical by construction (asserted in
tests/test_dmr_bankframer.py).

Voice superframes (bursts B..F carry EMB instead of sync) follow frame
A by fixed 144-dibit strides; a superframe that crosses a chunk
boundary continues from per-slot stride state on the next call.
"""
from __future__ import annotations

import numpy as np

from ..bits import dibits_to_bits, from_int
from .framer import (BURST_BITS, MAX_SYNC_BIT_ERRORS, SYNC_OFFSET,
                     DMRBurstFrame, DMRFramer, VOICE_FRAME_ORDER)
from .sync import SYNC_VALUES, VOICE_PATTERNS

__all__ = ["DMRBankFramer", "DMR_SYNC_DIBIT_PATTERNS"]

BURST_DIBITS = BURST_BITS // 2          # 144
SYNC_OFFSET_DIBITS = SYNC_OFFSET // 2   # 66

_PATTERNS = list(SYNC_VALUES.keys())
DMR_SYNC_DIBIT_PATTERNS = np.stack(
    [np.asarray(from_int(v, 48).reshape(24, 2) @ np.array([2, 1]),
                np.uint8)
     for v in SYNC_VALUES.values()])     # (7, 24) dibit patterns
_DIFF = np.array([[bin(a ^ b).count("1") for b in range(4)]
                  for a in range(4)], np.uint8)


class DMRBankFramer:
    """Streaming multi-channel DMR burst framer; feed per-chunk
    compacted dibit blocks for all C slots, receive (slot, burst) pairs.

    retain: symbols of history per slot — must cover a full voice
    superframe anchored by frame A's sync (6 x 144 dibits) plus the
    pre-sync half of a burst."""

    def __init__(self, channels: int, retain: int = 1024,
                 max_sync_errors: int = MAX_SYNC_BIT_ERRORS):
        self.c = channels
        self.retain = retain
        self.max_sync_errors = max_sync_errors
        self.tail = np.zeros((channels, retain), np.uint8)
        self.total = np.zeros(channels, np.int64)
        self.emitted_until = np.full(channels, -1 << 60, np.int64)
        # per-slot voice superframe continuation: next expected
        # continuation burst (abs dibit start, index into B..F order)
        self.voice_next: dict[int, tuple[int, int]] = {}
        # (slot, abs, pattern, sync_errs) — sync error measured at
        # detection time rides along so a boundary-crossing burst
        # reinjected next chunk reports its true error count
        self.pending: list[tuple[int, int, int, int]] = []
        self._helper = DMRFramer(max_sync_errors)

    def _sync_errs(self, w: np.ndarray, lags: np.ndarray) -> tuple:
        """(C, L) min error + argmin pattern over the 7 sync patterns."""
        best = np.full((w.shape[0], len(lags)), 255, np.uint8)
        which = np.zeros((w.shape[0], len(lags)), np.uint8)
        for p in range(len(_PATTERNS)):
            pat = DMR_SYNC_DIBIT_PATTERNS[p]
            err = np.zeros((w.shape[0], len(lags)), np.uint16)
            for k in range(24):
                err += _DIFF[w[:, lags + k], pat[k]]
            err8 = np.minimum(err, 255).astype(np.uint8)
            upd = err8 < best
            which[upd] = p
            best[upd] = err8[upd]
        return best, which

    def process(self, dib: np.ndarray, counts: np.ndarray,
                device_hits: np.ndarray | None = None
                ) -> list[tuple[int, DMRBurstFrame]]:
        dib = np.asarray(dib, np.uint8)
        counts = np.asarray(counts, np.int64)
        c, cap = dib.shape
        retain = self.retain
        w = np.concatenate([self.tail, dib], axis=1)
        valid_w = retain + counts
        abs0 = self.total - retain

        cand_slot, cand_pos = [], []
        if device_hits is not None:
            s_idx, lag = np.nonzero(np.asarray(device_hits, bool))
            keep = lag < counts[s_idx] - 23
            cand_slot.append(s_idx[keep])
            cand_pos.append(lag[keep] + retain)
            blags = np.arange(retain - 23, retain)
            berr, _ = self._sync_errs(w, blags)
            s_idx, li = np.nonzero(berr <= self.max_sync_errors)
            cand_slot.append(s_idx)
            cand_pos.append(blags[li])
        else:
            max_l = int(counts.max()) if len(counts) else 0
            lags = np.arange(retain - 23,
                             retain + max(0, max_l - 23))
            if len(lags):
                errs, _ = self._sync_errs(w, lags)
                s_idx, li = np.nonzero(errs <= self.max_sync_errors)
                keep = lags[li] - retain < counts[s_idx] - 23
                cand_slot.append(s_idx[keep])
                cand_pos.append(lags[li[keep]])

        pend = self.pending
        self.pending = []
        out: list[tuple[int, DMRBurstFrame]] = []

        slots = (np.concatenate(cand_slot) if cand_slot
                 else np.zeros(0, np.int64))
        wpos = (np.concatenate(cand_pos) if cand_pos
                else np.zeros(0, np.int64))
        if len(slots):
            # verify + classify patterns at every candidate
            win = w[slots[:, None], wpos[:, None] + np.arange(24)]
            errs = np.stack(
                [_DIFF[win, DMR_SYNC_DIBIT_PATTERNS[p][None, :]
                       ].sum(axis=1) for p in range(len(_PATTERNS))],
                axis=1)                            # (N, 7)
            which = errs.argmin(axis=1)
            serr = errs.min(axis=1)
            ok = serr <= self.max_sync_errors
            slots, wpos, which, serr = (slots[ok], wpos[ok],
                                        which[ok], serr[ok])

        # merge sync candidates + pendings into per-slot worklists
        per_slot: dict[int, list] = {}
        for j in range(len(slots)):
            s = int(slots[j])
            per_slot.setdefault(s, []).append(
                (int(wpos[j]) - SYNC_OFFSET_DIBITS + int(abs0[s]),
                 int(which[j]), int(serr[j])))
        for s, a, p, e in pend:
            per_slot.setdefault(s, []).append((a, p, e))

        # per-slot positional walk merging sync-anchored bursts with
        # pending voice superframe continuations — events must be
        # consumed in stream order or a later burst's claim watermark
        # suppresses an earlier continuation (the per-slot framer gets
        # this for free by re-scanning its whole carry window)
        for s in set(per_slot) | set(self.voice_next):
            items = sorted(per_slot.get(s, []))
            vw = int(valid_w[s])
            a0 = int(abs0[s])
            claimed = int(self.emitted_until[s])
            vn = self.voice_next.pop(s, None)
            i = 0
            while True:
                nxt = items[i] if i < len(items) else None
                if vn is not None and (nxt is None or vn[0] <= nxt[0]):
                    a, idx = vn
                    pos = a - a0
                    if pos < 0:
                        vn = None               # slid out of the window
                        continue
                    if pos + BURST_DIBITS > vw:
                        break                   # nothing later fits either
                    if a >= claimed + BURST_DIBITS // 2:
                        frame = self._burst(w[s], pos,
                                            VOICE_FRAME_ORDER[idx], 0, a)
                        if frame.emb is not None and not frame.emb.valid:
                            vn = None           # superframe lost
                            continue
                        out.append((s, frame))
                        claimed = a
                    vn = ((a + BURST_DIBITS, idx + 1)
                          if idx + 1 < len(VOICE_FRAME_ORDER) else None)
                elif nxt is not None:
                    a, p_idx, err = nxt
                    i += 1
                    pos = a - a0
                    if a < claimed + BURST_DIBITS // 2 or pos < 0:
                        continue
                    if pos + BURST_DIBITS > vw:
                        i -= 1
                        break                   # keep for next chunk
                    pattern = _PATTERNS[p_idx]
                    out.append((s, self._burst(w[s], pos, pattern,
                                               err, a)))
                    claimed = a
                    if pattern in VOICE_PATTERNS:
                        vn = (a + BURST_DIBITS, 0)
                else:
                    break
            self.emitted_until[s] = claimed
            if vn is not None:
                self.voice_next[s] = vn
            for a, p_idx, err in items[i:]:     # incomplete tail bursts
                self.pending.append((s, a, p_idx, err))

        # advance rolling windows
        idx = (valid_w - retain)[:, None] + np.arange(retain)
        self.tail = w[np.arange(self.c)[:, None], idx]
        self.total += counts

        out.sort(key=lambda sf: (sf[0], sf[1].start))
        return out

    def _burst(self, row: np.ndarray, pos: int, pattern, err: int,
               abs_start: int) -> DMRBurstFrame:
        bits = dibits_to_bits(row[pos: pos + BURST_DIBITS])
        return self._helper._frame_burst(bits, 0, pattern, err,
                                         abs_start)
