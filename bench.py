"""Benchmark: wideband IQ megasamples/s/chip through channelize + demod.

Flagship config: 12.8 MS/s wideband IQ -> 1024 x 12.5 kHz channels ->
polyphase channelize -> extract ALL 1024 channels -> vmapped NBFM demod
(FIR + squelch + discriminator + de-emphasis + 8 kHz resample) -> audio.

Prints ONE JSON line:
  {"metric": "iq_msps_per_chip", "value": <MS/s>, "unit": "Msamples/s",
   "vs_baseline": <value / 10.0>}

Baseline divisor: the reference's largest in-repo rate is the 10 MS/s
synthetic test tuner on a desktop CPU (TestTunerController.java:35), i.e.
real-time at 10 MS/s == 1.0x.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    small = "--small" in sys.argv
    if small:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from sdrtrunk_tpu.receiver import WidebandReceiver

    if small:
        m, chunk_blocks, iters = 64, 128, 3
    else:
        m, chunk_blocks, iters = 1024, 1250, 10
    fs = m * 12500.0
    # extract every bin (full occupancy — the hardest realistic load)
    offsets = [(i - m // 2 + 1) * 12500.0 for i in range(m - 1)]
    rx = WidebandReceiver(fs, offsets)
    step, state = rx.build_safe()

    n = m * chunk_blocks  # samples per step; K per channel = 2*chunk_blocks
    rng = np.random.default_rng(0)
    # float32 (n, 2) I/Q pairs: complex arrays cannot cross the TPU
    # host<->device boundary; complex is formed on device (receiver.run)
    x = jnp.asarray(0.1 * rng.standard_normal((n, 2)).astype(np.float32))

    # warmup / compile
    outputs, state = step(x, state)
    jax.block_until_ready(outputs)

    t0 = time.perf_counter()
    for _ in range(iters):
        outputs, state = step(x, state)
    jax.block_until_ready(outputs)
    elapsed = time.perf_counter() - t0

    total_samples = n * iters
    msps = total_samples / elapsed / 1e6
    realtime_factor = msps * 1e6 / fs
    result = {
        "metric": "iq_msps_per_chip",
        "value": round(msps, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / 10.0, 3),
        "detail": {
            "wideband_rate_msps": fs / 1e6,
            "channels": rx.num_channels,
            "realtime_factor": round(realtime_factor, 3),
            "device": str(jax.devices()[0]),
            "chunk_samples": n,
            "iters": iters,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
