import numpy as np, time, json
exec(open('/root/repo/_c4fm_stage.py').read().split("orch.run(max_chunks=3")[0])
orch.run(max_chunks=2, pipelined=False)
iq = source(chunk)
prep = orch._prepare(np.asarray(iq))
dev = orch._upload(prep)
out, now = orch._dispatch(dev)
_ = np.asarray(out["packed"][:8])
# device-only: re-dispatch on the SAME device buffer (no H2D)
for i in range(3):
    t0 = time.perf_counter()
    out, now = orch._dispatch(dev)
    _ = np.asarray(out["packed"][:8])
    print(f"device-only exec: {(time.perf_counter()-t0)*1000:.0f} ms")
# H2D wire alone
for i in range(2):
    t0 = time.perf_counter()
    dev2 = orch._upload(prep)
    _ = np.asarray(dev2[:4])
    print(f"h2d alone: {(time.perf_counter()-t0)*1000:.0f} ms")
# overlap test: enqueue upload of chunk B while computing chunk A
t0 = time.perf_counter()
out, _ = orch._dispatch(dev)
dev3 = orch._upload(prep)          # enqueued during compute
_ = np.asarray(out["packed"][:8])
t1 = time.perf_counter()
_ = np.asarray(dev3[:4])
t2 = time.perf_counter()
print(f"compute-with-upload-enqueued: {(t1-t0)*1000:.0f} ms, "
      f"remaining upload wait: {(t2-t1)*1000:.0f} ms")
