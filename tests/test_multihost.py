"""Multi-host path pinned without hardware: 2 local ``jax.distributed``
CPU processes build the hybrid DCN x ICI mesh and run one psum and one
sharded train step (see _multihost_worker.py).

The reference never tests its distributed layer (SURVEY.md §4); this
exercises ``make_multihost_mesh``'s multi-process branch
(parallel/mesh.py:62-86), which every other test skips because
``jax.process_count() == 1`` on the virtual 8-device mesh.
"""

import json
import math
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(bool(os.environ.get("SINK_ATTN_TEST_TPU")),
                    reason="CPU multi-process simulation only")
def test_two_process_mesh_psum_and_train_step(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"rank{i}.json" for i in range(2)]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), str(port), str(outs[i])],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            logs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out")
    for p, log in zip(procs, logs):
        if p.returncode != 0:
            low = log.lower()
            if "unimplemented" in low or "not supported" in low:
                pytest.skip(f"CPU multiprocess collectives unavailable: "
                            f"{log[-500:]}")
            pytest.fail(f"worker rc={p.returncode}:\n{log[-3000:]}")

    results = [json.loads(o.read_text()) for o in outs]
    for r in results:
        assert r["n_processes"] == 2 and r["n_devices"] == 4
        assert r["psum"] == pytest.approx(6.0)  # 0+1+2+3
        assert math.isfinite(r["loss"])
        # ring attention across the process boundary == eager oracle
        assert r["ring_err"] < 2e-5, r["ring_err"]
        # TP-sharded serving decode == single-device greedy
        assert r["tp_match"], r
    # bitwise-identical loss on both controllers (same global program)
    assert results[0]["loss"] == results[1]["loss"]
