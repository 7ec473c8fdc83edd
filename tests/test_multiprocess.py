"""Two-process JAX run of the sharded channelizer pipeline (VERDICT
round-2 item 6): jax.distributed.initialize + gloo CPU collectives +
make_array_from_process_local_data, each process ingesting its own time
slice and verifying its local output shard against a single-device
reference. Skips cleanly if the distributed runtime cannot start in this
environment."""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_pipeline():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "sdrtrunk_tpu.parallel.multiprocess",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("distributed runtime timed out in this environment")
        lines = [l for l in out.strip().splitlines() if l.startswith("{")]
        if p.returncode != 0 and not lines:
            if "UNAVAILABLE" in err or "gloo" in err.lower() \
                    or "distributed" in err.lower():
                pytest.skip(f"distributed init unavailable: {err[-200:]}")
            raise AssertionError(f"worker failed rc={p.returncode}: "
                                 f"{err[-2000:]}")
        results.append(json.loads(lines[-1]))

    assert len(results) == 2
    for r in results:
        assert r["ok"], r
        assert r["devices"] == 4            # 2 processes x 2 local devices
        assert r["msps_per_process"] > 0
