import numpy as np, time, json
import bench
from sdrtrunk_tpu.dsp.synthesizer import synthesize_bank
from sdrtrunk_tpu.protocol.p25p1.duid import DUID
from sdrtrunk_tpu.protocol.p25p1.framer import P25P1FrameAssembler
from sdrtrunk_tpu.protocol.p25p1.lc import lc_build_group_voice
from sdrtrunk_tpu.protocol.p25p1.ldu import ldu1_encode, ldu2_encode
from sdrtrunk_tpu.runtime.identifiers import IdentifierCollection
from sdrtrunk_tpu.runtime.orchestrator import Orchestrator
from sdrtrunk_tpu.dsp.channelizer import Channelizer
from sdrtrunk_tpu.signal.generators import c4fm_modulate

m, slots = 1024, 1023
fs = m * 12500.0
chunk = m * 5120
k = 2 * chunk // m
total_chunks = 7
rng = np.random.default_rng(0)
asm = P25P1FrameAssembler()
lc = lc_build_group_voice(0x457, 0xABCDE)
p1 = ldu1_encode(lc, rng.integers(0, 2, (9, 144)).astype(np.uint8))
p2 = ldu2_encode(rng.integers(0, 2, 72).astype(np.uint8), 0x80, 1,
                 rng.integers(0, 2, (9, 144)).astype(np.uint8))
sf = np.concatenate([asm.assemble(DUID.LDU1, p1), asm.assemble(DUID.LDU2, p2)])
ch = Channelizer.design(fs, 12500.0)
offsets = [(i - m // 2 + 1) * 12500.0 for i in range(m - 1)][:slots]
bins = np.array([ch.channel_for_frequency(o) for o in offsets])
starts = rng.integers(0, len(sf) * 5, slots)
need = int(starts.max()) + (total_chunks + 1) * k + len(sf)
dibits = np.tile(sf, need // (len(sf) * 5) + 2)
base = c4fm_modulate(dibits, sample_rate=25000.0).astype(np.complex64)
iq8 = []
for j in range(total_chunks):
    u = np.zeros((k, m), np.complex64)
    idx = starts[:, None] + j * k + np.arange(k)[None, :]
    u[:, bins] = base[idx].T * 0.5
    x = synthesize_bank(u, np.asarray(ch.hmat))[:chunk]
    scale = 118.0 / max(np.abs(x.real).max(), np.abs(x.imag).max())
    iq8.append(np.clip(np.stack([x.real, x.imag], -1) * scale, -127, 127).astype(np.int8))
pos = 0
def source(num):
    global pos
    j = pos // chunk; pos += num
    return iq8[j] if j < len(iq8) else None
orch = Orchestrator(source, fs, 460e6, [offsets[0]], slots=slots,
                    decoder="c4fm", chunk_samples=chunk,
                    idle_teardown_seconds=1e9, ppm_correction=False)
for off in offsets[1:]:
    orch._activate(460e6 + off, IdentifierCollection())
orch.run(max_chunks=3, pipelined=False)
for it in range(4):
    iq = source(chunk)
    t0 = time.perf_counter()
    prep = orch._prepare(np.asarray(iq)); t1 = time.perf_counter()
    dev = orch._upload(prep); t2 = time.perf_counter()
    out, now = orch._dispatch(dev); t3 = time.perf_counter()
    _p = np.asarray(out["packed"][:8]); t3b = time.perf_counter()
    raw = np.asarray(out["packed"]); t4 = time.perf_counter()
    dib4, hits, counts, pll = orch._split_packed(raw); t5 = time.perf_counter()
    msgs = orch.bank_proc.frame_chunk(dib4, counts, hits); t6 = time.perf_counter()
    active = np.array([s.active for s in orch.slots])
    orch.bank_proc.route(msgs, counts, active, now); t7 = time.perf_counter()
    print(json.dumps({"upload": round(t2-t1,3), "dispatch": round(t3-t2,3),
        "exec": round(t3b-t3,3), "xfer": round(t4-t3b,3),
        "frame": round(t6-t5,3), "route": round(t7-t6,3),
        "msgs": len(msgs)}), flush=True)
# also measure pure pipelined run for comparison
t0 = time.perf_counter()
orch.run(max_chunks=0)
print("done")
