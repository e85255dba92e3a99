#!/usr/bin/env python
"""Train-step op-level profiling on the real chip (round-3 perf work).

Runs the bench.py train configuration (R50 1024^2 B=2, JV matcher) under
jax.profiler.trace and aggregates device-op durations from the captured
xplane trace. Uses the same executable bench.py compiles, so a warm
server-side cache makes this cheap (no fresh 15-min compiles).
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "true")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def run_steps(trace_dir, n_steps=3):
    from bm2f_tpu.config import get_config
    from bm2f_tpu.parallel.mesh import shard_batch
    from bm2f_tpu.train.trainer import Trainer

    B, H, W, G = 2, 1024, 1024, 8
    cfg = get_config("coco_instance_r50", {
        "model.dtype": "bfloat16",
        "model.pixel_decoder_f32": False,
        "train.matcher": "jv",
        "train.ims_per_batch": B,
        "mesh.data": 1,
    })
    trainer = Trainer(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
        "labels": jnp.asarray(rng.randint(0, 80, (B, G)).astype(np.int32)),
        "masks": jnp.asarray((rng.rand(B, G, H, W) > 0.8).astype(np.float32)),
        "valid": jnp.asarray(np.ones((B, G), bool)),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch["images"][:1])
    step_fn = trainer.compile_step(state)
    with trainer.mesh:
        batch = shard_batch(batch, trainer.mesh)
        state = trainer.shard_state(state)
        state, metrics = step_fn(state, batch)  # compile + warm
        float(metrics["total_loss"])
        t0 = time.perf_counter()
        with jax.profiler.trace(trace_dir):
            for _ in range(n_steps):
                state, metrics = step_fn(state, batch)
            float(metrics["total_loss"])
        dt = (time.perf_counter() - t0) / n_steps
    print(f"traced {n_steps} steps, {dt*1e3:.1f} ms/step wall", flush=True)
    return dt


def parse_trace(trace_dir, n_steps):
    """Aggregate device-lane op durations from the chrome-trace json.gz.

    Sums only the 'XLA Ops' thread lane of the TPU process (other lanes —
    Steps, XLA Modules, TC Overlay — wrap the same time and would double
    count), and attributes time three ways: by op name, by hlo_category,
    and by the PYTHON SOURCE LINE the op's metadata carries. The by-source
    view is what names the diffuse small-fusion tail: the round-3 trace
    pinned ~120 ms/step of criterion gathers this way."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    # device process + its "XLA Ops" thread lane
    dev_pids = set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pname = ev["args"].get("name", "")
            if any(k in pname for k in ("TPU", "Axon", "axon", "/device:")):
                dev_pids.add(ev["pid"])
    op_tids = set()
    for ev in trace["traceEvents"]:
        if (ev.get("ph") == "M" and ev.get("name") == "thread_name"
                and ev.get("pid") in dev_pids
                and ev["args"].get("name") == "XLA Ops"):
            op_tids.add((ev["pid"], ev["tid"]))
    tot = defaultdict(float)
    cnt = defaultdict(int)
    by_src = defaultdict(float)
    src_cnt = defaultdict(int)
    by_cat = defaultdict(float)
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "X" and (ev.get("pid"), ev.get("tid")) in op_tids:
            a = ev.get("args", {})
            ms = ev.get("dur", 0) / 1e3  # us -> ms
            name = ev.get("name", "?")
            tot[name] += ms
            cnt[name] += 1
            src = a.get("source", "<none>")
            by_src[src] += ms
            src_cnt[src] += 1
            by_cat[a.get("hlo_category", "?")] += ms
    total = sum(tot.values())
    print(f"\ndevice total {total:.1f} ms over {n_steps} steps "
          f"({total/n_steps:.1f} ms/step); top ops per step:")
    for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {ms/n_steps:9.2f} ms  x{cnt[name]//n_steps:<4d} {name[:100]}")
    print("\nby hlo_category (ms/step):")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {v/n_steps:9.2f}  {k}")
    print("\ntop 30 source lines (ms/step):")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {v/n_steps:9.2f} x{src_cnt[k]//n_steps:<5d} {k}")
    return tot


def main():
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/train_trace")
    n = int(os.environ.get("TRACE_STEPS", "3"))
    print("devices:", jax.devices(), flush=True)
    run_steps(trace_dir, n)
    parse_trace(trace_dir, n)


if __name__ == "__main__":
    main()
