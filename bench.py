"""Benchmark harness: driver-captured performance metrics on the local chip.

Prints one JSON line per metric (the headline R50 forward throughput is the
LAST line so single-line parsers pick it up):
  1. R50 1024^2 B=2 train step (full fwd+bwd+AdamW, exact JV matching)
  2. Swin-L 200-query forward throughput (the zoo flagship,
     /root/reference/MODEL_ZOO.md:113-121)
  3. p50 single-image forward latency (R50 800^2 B=1)
  4. R50 800^2 B=4 forward throughput (headline)

Robustness (round-4): the round-3 driver run captured NOTHING because the
axon backend init hung >9 min and the driver burned its whole timeout
(BENCH_r03.json rc=124). This harness now never hangs unbounded:

  * a PREFLIGHT probes backend init + one tiny jitted matmul in a killable
    subprocess (hung inits cannot be interrupted in-process), with bounded
    retries (3 x 150 s by default) — a crashed TPU worker recovers on its
    own in ~3 min, so the retry ladder covers that case;
  * each metric runs in its own subprocess under a per-metric timeout, so
    one wedged graph cannot eat the others;
  * each metric child probes the backend FIRST and prints a `# backend up`
    marker; if the marker does not appear within BENCH_INIT_TIMEOUT_S the
    parent kills the child and retries once (observed on 2026-08-19: the
    intermittent init hang can hit a metric subprocess even after a
    successful preflight, and without the watchdog it burned the metric's
    whole 480 s budget);
  * an overall soft deadline (BENCH_DEADLINE_S, default 1260 s) shrinks
    per-metric budgets so the harness always finishes before a ~25-min
    external timeout with whatever it measured;
  * every failure path emits a structured {"metric": ..., "error": ...}
    JSON line instead of silence.

Run modes:
  python bench.py                 driver entry: preflight + all metrics
  python bench.py --metric NAME   one metric in-process (the subprocess leg)
  python bench.py --preflight     the preflight probe body (subprocess leg)

Baselines: the reference publishes no throughput numbers (BASELINE.md) — the
Mask2Former paper reports ~8.6 fps for R50 and ~2.0 fps for Swin-L COCO
panoptic inference on a V100; we take 2x those (17.2 / 4.0 img/s) as A100
estimates for the driver's ">=3x A100 images/sec/chip" north star, 58.1 ms
(= 1000/17.2) as the A100 p50 latency estimate (vs_baseline =
baseline/value there: higher is better), and the round-1 pre-Pallas train
step (1.46 s/it) as the train baseline (vs_baseline = baseline/value).
These are self-derived estimates — documented, not hidden.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

# The LOCAL persistent compile cache is DISABLED for bench: measured on
# the axon backend it never skips the server-side compile (the entry gets
# written but a fresh process still waits the full compile), and it CAN
# serve a stale executable whose hoisted-constant calling convention does
# not match the current process's tracing ("Computation compiled for 628
# inputs but called with 585", 2026-08-20 — the jaxpr's 43 consts were
# hoisted as executable inputs by the cached build but tracked as empty
# const_args by the new trace). The server-side HLO cache provides all the
# real warm-start benefit. FORCED, not setdefault: metric children inherit
# the parent's environment, and any pre-set "true" (e.g. from an older
# bench parent or the surrounding shell) resurrects the stale-executable
# hazard.
os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"

A100_ESTIMATE_IMG_PER_S = 17.2
A100_ESTIMATE_SWINL_IMG_PER_S = 4.0
A100_ESTIMATE_P50_MS = 1000.0 / A100_ESTIMATE_IMG_PER_S
ROUND1_TRAIN_S_PER_IT = 1.46

PREFLIGHT_ATTEMPTS = int(os.environ.get("BENCH_PREFLIGHT_ATTEMPTS", "3"))
# first preflight window 240 s (observed GOOD init at 114.7 s — a 150 s
# window kills inits that were about to succeed, VERDICT r4 weak item 5);
# retries use a shorter window since a crashed worker recovers in ~3 min
PREFLIGHT_TIMEOUT_S = float(os.environ.get("BENCH_PREFLIGHT_TIMEOUT_S", "240"))
PREFLIGHT_RETRY_TIMEOUT_S = float(
    os.environ.get("BENCH_PREFLIGHT_RETRY_TIMEOUT_S", "150"))
# a metric child must bring the backend up within this window or be retried
INIT_TIMEOUT_S = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "150"))
INIT_MARKER = "# backend up"
# overall soft deadline for the METRICS, counted from the end of preflight
# (VERDICT r4: a slow preflight used to eat the metric budgets); a hard
# total cap still bounds the whole run under the driver's external timeout
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1380"))
# 60 s of headroom under the ~25-min (1500 s) external driver timeout so
# the tail work (kernel gate result, prewarm reap, final headline re-emit)
# always lands before an external kill
HARD_TOTAL_S = float(os.environ.get("BENCH_HARD_TOTAL_S", "1440"))

# v5e peak numbers for the hardware-grounded utilization fields
# (VERDICT r4 item 6): bf16 matmul peak and HBM bandwidth
V5E_PEAK_FLOPS = 197e12
V5E_HBM_BYTES_S = 819e9

# (name, per-metric timeout seconds), run in order; the headline JSON line
# is re-emitted as the LAST line for single-line parsers. train runs first
# because it is the most valuable metric and historically the hardest to
# capture; since round 5 it fits its budget COLD (see below), so ordering
# is about priority under a tight deadline, not cache residency.
# Budgets sized to the round-5 scan-ified graphs' COLD costs measured on
# the chip (tools/compile_timer.py): headline lower 3.6 s + compile 13 s
# (was ~7 min unrolled); train lower ~300 s (AD tracing, the remaining
# local cost) + compile 65-124 s (was ~23 min) + run. Server-side compile
# latency is VARIABLE (the same headline HLO compiled in 13 s at 12:21 and
# ~5.5 min at 12:57 on 2026-08-20, ~18 s of local CPU either way), so caps
# carry headroom; they only bind when the server is slow, and the
# post-preflight deadline cuts late metrics rather than letting one slow
# compile starve everything. No keep-warm process, no server-cache
# dependence.
METRICS = [
    ("train", 600.0),
    ("headline", 420.0),
    ("swinl", 480.0),
    ("p50", 300.0),
    ("video", 360.0),
]


def _emit(metric, value, unit, vs_baseline, **extra):
    line = {"metric": metric, "value": round(value, 2), "unit": unit,
            "vs_baseline": round(vs_baseline, 2)}
    line.update({k: v for k, v in extra.items() if v is not None})
    print(json.dumps(line), flush=True)


def _cost_analysis(compiled):
    """(flops, bytes_accessed) from an AOT-compiled executable, or Nones —
    powers the MFU / HBM-utilization fields. Wrapped: not every backend
    exposes cost analysis."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return ca.get("flops"), ca.get("bytes accessed")
    except Exception:
        return None, None


def _util_fields(flops, nbytes, dt_s):
    """mfu = achieved flops / bf16 peak; hbm_util = achieved bytes / peak
    bandwidth — per-executable-invocation time dt_s."""
    out = {}
    if flops and dt_s > 0:
        out["mfu"] = round(flops / dt_s / V5E_PEAK_FLOPS, 4)
    if nbytes and dt_s > 0:
        out["hbm_util"] = round(nbytes / dt_s / V5E_HBM_BYTES_S, 4)
    return out


def _emit_error(metric, error):
    print(json.dumps({"metric": metric, "error": error}), flush=True)


# ---------------------------------------------------------------------------
# metric bodies (run inside the per-metric subprocess)
# ---------------------------------------------------------------------------

# --prewarm mode: build + lower + compile the metric's graph, print the
# marker, and exit WITHOUT running the timed loop. main() launches all
# prewarm children CONCURRENTLY after preflight so the server-side compiles
# overlap (they are remote; the local cost is only tracing), then runs the
# timed metrics sequentially against a warm server cache. Measured need:
# the same HLO compiled in 13 s..5.5 min depending on server load, and
# cache entries evict within tens of minutes, so sequential children can
# pay the full compile 5x while parallel ones pay ~max once.
PREWARM = False
PREWARM_MARKER = "# prewarmed"


_T0 = time.time()

PARAM_CACHE_DIR = os.environ.get("BENCH_PARAM_CACHE_DIR",
                                 "/root/.bm2f_bench_params")


def _cached_init(tag, init_fn, shape_fn):
    """Disk-cache a metric child's init variables. model.init is a DEVICE
    computation; during backend slow windows even the tiny 64x64 init graph
    queued for minutes per child. Values are deterministic (PRNGKey(0)), so
    caching them is measurement-neutral. `shape_fn` returns
    jax.eval_shape(init) — cheap, local — used to reject a stale cache
    after model-code changes (structure or shapes differ -> re-init)."""
    import pickle

    import jax
    import jax.numpy as jnp

    path = os.path.join(PARAM_CACHE_DIR, f"{tag}.pkl")
    want = shape_fn()
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                tree = pickle.load(f)
            ok = jax.tree_util.tree_structure(tree) == \
                jax.tree_util.tree_structure(want)
            if ok:
                flat = zip(jax.tree.leaves(tree), jax.tree.leaves(want))
                ok = all(a.shape == b.shape and a.dtype == b.dtype
                         for a, b in flat)
            if ok:
                _mark(f"init loaded from cache ({tag})")
                return jax.tree.map(jnp.asarray, tree)
            print(f"# param cache stale for {tag}; re-initializing",
                  flush=True)
        except Exception as e:  # corrupt cache: fall through to re-init
            print(f"# param cache unreadable ({e!r}); re-initializing",
                  flush=True)
    variables = init_fn()
    host = jax.tree.map(lambda x: np.asarray(x), variables)
    os.makedirs(PARAM_CACHE_DIR, exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(host, f)
    os.replace(tmp, path)
    return variables


def _mark(phase):
    """Phase timestamps in every metric child: backend slow windows showed
    up as 5-min children with ~18 s of local CPU, and without these marks
    the stall was unattributable (compile vs attach vs weight upload)."""
    print(f"# t+{time.time() - _T0:6.1f}s {phase}", flush=True)


def _fwd_bench(cfg_name, B, H, W, iters, overrides=None,
               per_iter_sync=False):
    """Forward throughput with data-dependent chaining (the axon runtime
    dedupes identical dispatches). per_iter_sync=True pulls a scalar every
    iteration (for latency percentiles — includes the ~ms host-sync cost);
    throughput mode chains iterations and syncs once at the end."""
    import jax
    import jax.numpy as jnp

    from bm2f_tpu.config import get_config
    from bm2f_tpu.models import build_model
    from bm2f_tpu.models.maskformer import normalize_images

    over = {"model.dtype": "bfloat16", "model.pixel_decoder_f32": False}
    over.update(overrides or {})
    cfg = get_config(cfg_name, over)
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
    # init with a TINY sample: param shapes are image-size independent, and
    # a full-resolution init would cost a second multi-minute server-side
    # compile the benchmark never uses (found via the 44 s _value block in
    # the round-5 lowering profile — the init graph's async compile+run is
    # what the first host sync actually waits for)
    _mark("model built; init")
    init_arg = normalize_images(images[:1, :64, :64], cfg.model)
    variables = _cached_init(
        cfg_name,
        lambda: model.init(jax.random.PRNGKey(0), init_arg),
        lambda: jax.eval_shape(model.init, jax.random.PRNGKey(0), init_arg),
    )
    _mark("init done; lower+compile")

    # params as jit ARGUMENTS, not closure constants: closed-over arrays are
    # embedded in the serialized HLO, and Swin-L's ~200M params overflow the
    # axon remote-compile request (HTTP 413)
    @jax.jit
    def fwd(variables, images, shift):
        out = model.apply(variables, normalize_images(images + shift, cfg.model))
        return out["pred_logits"], out["pred_masks"]

    # AOT lower+compile: same executable the jit path would build, plus
    # cost_analysis for the MFU / HBM-utilization fields
    shift = jnp.float32(0.0)
    compiled = fwd.lower(variables, images, shift).compile()
    if PREWARM:
        print(PREWARM_MARKER, flush=True)
        return None, None, None
    _mark("compiled; warmup (uploads weights)")
    flops, nbytes = _cost_analysis(compiled)

    # warmup MUST sync by pulling a scalar: block_until_ready is a no-op on
    # the axon platform, and an unsynced warmup leaks compile + first-run
    # work into the timed window (measured 9x distortion on Swin-L)
    logits, _ = compiled(variables, images, shift)
    shift = logits[0, 0, 0].astype(jnp.float32) * 1e-6
    logits, _ = compiled(variables, images, shift)
    shift = logits[0, 0, 0].astype(jnp.float32) * 1e-6
    float(shift)
    _mark("warm; timed loop")

    times = []
    t0 = time.perf_counter()
    for _ in range(iters):
        t1 = time.perf_counter()
        logits, _ = compiled(variables, images, shift)
        shift = logits[0, 0, 0].astype(jnp.float32) * 1e-6
        if per_iter_sync:
            float(shift)  # host sync (block_until_ready no-ops on axon)
        times.append(time.perf_counter() - t1)
    float(shift)
    dt = time.perf_counter() - t0
    return B * iters / dt, times, _util_fields(flops, nbytes, dt / iters)


def bench_train():
    import jax
    import jax.numpy as jnp

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
    # tiny init sample: param shapes don't depend on image size, and a
    # 1024^2 init graph would cost its own multi-minute server compile
    _mark("trainer built; init_state")
    sample = batch["images"][:1, :64, :64]
    state = _cached_init(
        "train_coco_instance_r50",
        lambda: trainer.init_state(jax.random.PRNGKey(0), sample),
        lambda: jax.eval_shape(trainer.init_state, jax.random.PRNGKey(0),
                               sample),
    )
    # ALWAYS rebuild the optimizer from the concrete params: on the
    # cache-hit path trainer.tx was created inside jax.eval_shape's
    # abstract trace (init_state's side effect), and an optimizer built
    # under a trace poisons the train step's constant tracking — the AOT
    # executable hoists the jaxpr consts as inputs while the Compiled
    # wrapper tracks zero const_args ("compiled for 628 inputs but called
    # with 585"; reproduced and fixed 2026-08-20).
    from bm2f_tpu.train.optim import make_optimizer

    trainer.tx = make_optimizer(cfg.train.optimizer, state.params)
    step_fn = trainer.compile_step(state)
    with trainer.mesh:
        batch = shard_batch(batch, trainer.mesh)
        state = trainer.shard_state(state)
        _mark("state sharded; lower+compile")
        compiled = step_fn.lower(state, batch).compile()
        if PREWARM:
            print(PREWARM_MARKER, flush=True)
            return None, None
        _mark("compiled; first step (uploads state)")
        flops, nbytes = _cost_analysis(compiled)
        state, metrics = compiled(state, batch)  # first run
        float(metrics["total_loss"])
        _mark("warm; timed loop")
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = compiled(state, batch)
        float(metrics["total_loss"])  # the state chain defeats dedupe
        dt = (time.perf_counter() - t0) / iters
    return dt, _util_fields(flops, nbytes, dt)


def run_metric(name):
    """One metric, in-process. Prints the JSON line(s) itself."""
    # bring the backend up FIRST and say so: the parent watches for this
    # marker and kills+retries a child whose init hangs (intermittent axon
    # condition; a hung init cannot be interrupted from inside the process)
    import jax
    t0 = time.time()
    jax.devices()
    print(f"{INIT_MARKER} ({time.time() - t0:.1f}s)", flush=True)
    if name == "headline":
        img_per_s, _, util = _fwd_bench("coco_instance_r50", 4, 800, 800,
                                        iters=20)
        if PREWARM:
            return
        _emit("forward images/sec/chip (R50, 800x800, bf16)", img_per_s,
              "img/s", img_per_s / A100_ESTIMATE_IMG_PER_S, **util)
    elif name == "train":
        s_per_it, util = bench_train()
        if PREWARM:
            return
        _emit("train s/it (R50, 1024x1024, B=2, JV matcher)", s_per_it,
              "s/it", ROUND1_TRAIN_S_PER_IT / s_per_it, **util)
    elif name == "swinl":
        swinl, _, util = _fwd_bench("coco_panoptic_swin_l", 2, 800, 800,
                                    iters=10)
        if PREWARM:
            return
        _emit("forward images/sec/chip (Swin-L 200q, 800x800, bf16)", swinl,
              "img/s", swinl / A100_ESTIMATE_SWINL_IMG_PER_S, **util)
    elif name == "p50":
        # p50 single-image latency (R50). Per-iteration timing must pull a
        # scalar to the host (block_until_ready no-ops on axon) and that
        # null round trip costs ~25-30 ms on the tunneled chip — a harness
        # artifact, not model time, so it is measured and subtracted; both
        # raw and net are printed for transparency (ADVICE r3: the full
        # round-trip subtraction slightly over-corrects, so the raw number
        # is the honest upper bound).
        _, times, _util = _fwd_bench("coco_instance_r50", 1, 800, 800,
                                     iters=20, per_iter_sync=True)
        if PREWARM:
            return
        import jax.numpy as jnp
        x = jnp.float32(1.0)
        null = []
        for _ in range(10):
            t1 = time.perf_counter()
            x = x * 1.0000001
            float(x)
            null.append(time.perf_counter() - t1)
        sync_ms = float(np.median(null)) * 1e3
        raw_ms = float(np.median(times)) * 1e3
        p50 = raw_ms - sync_ms
        print(f"# p50 raw {raw_ms:.1f} ms; host-sync round trip subtracted:"
              f" {sync_ms:.1f} ms", flush=True)
        _emit("p50 single-image forward latency (R50, 800x800)", p50, "ms",
              A100_ESTIMATE_P50_MS / p50)
    elif name == "video":
        # YTVIS-shaped clip forward: R50, T=8 x 480x640 (the video stack's
        # perf was previously untracked — VERDICT r4 item 9). Reference
        # analogue: the clip-at-once forward in
        # mask2former_video/video_maskformer_model_WithColor.py:316-324.
        import jax
        import jax.numpy as jnp

        from bm2f_tpu.config import get_config
        from bm2f_tpu.models.maskformer import normalize_images
        from bm2f_tpu.video import build_video_model

        B, T, H, W = 1, 8, 480, 640
        cfg = get_config("ytvis2021_video_r50", {
            "model.dtype": "bfloat16", "model.pixel_decoder_f32": False,
        })
        model = build_video_model(cfg)
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32) * 255)
        init_arg = normalize_images(images[:, :2, :64, :64], cfg.model)
        variables = _cached_init(
            "video_ytvis2021_r50",
            lambda: model.init(jax.random.PRNGKey(0), init_arg),
            lambda: jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                   init_arg),
        )

        @jax.jit
        def fwd(variables, images, shift):
            out = model.apply(
                variables, normalize_images(images + shift, cfg.model))
            return out["pred_logits"], out["pred_masks"]

        shift = jnp.float32(0.0)
        compiled = fwd.lower(variables, images, shift).compile()
        if PREWARM:
            print(PREWARM_MARKER, flush=True)
            return
        flops, nbytes = _cost_analysis(compiled)
        logits, _ = compiled(variables, images, shift)
        shift = logits[0, 0, 0].astype(jnp.float32) * 1e-6
        logits, _ = compiled(variables, images, shift)
        shift = logits[0, 0, 0].astype(jnp.float32) * 1e-6
        float(shift)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            logits, _ = compiled(variables, images, shift)
            shift = logits[0, 0, 0].astype(jnp.float32) * 1e-6
        float(shift)
        dt = time.perf_counter() - t0
        frames_per_s = B * T * iters / dt
        # baseline: the video model is the image model + clip decoder; the
        # paper-derived A100 estimate for R50 image forward (17.2 img/s)
        # is the per-frame bar
        _emit("video clip forward frames/sec/chip (R50, T=8, 480x640, bf16)",
              frames_per_s, "frames/s",
              frames_per_s / A100_ESTIMATE_IMG_PER_S,
              **_util_fields(flops, nbytes, dt / iters))
    else:
        raise SystemExit(f"unknown metric {name!r}")


# ---------------------------------------------------------------------------
# preflight (subprocess leg)
# ---------------------------------------------------------------------------

def run_preflight():
    """Backend init + one tiny jitted matmul + host pull. Run in a killable
    subprocess: a hung backend init cannot be interrupted from Python."""
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    devs = jax.devices()
    x = jnp.ones((256, 256), jnp.float32)
    y = float(jnp.sum(jax.jit(lambda a: a @ a)(x)))
    assert np.isfinite(y), y
    print(f"# preflight ok: {len(devs)} device(s), platform="
          f"{jax.default_backend()}, {time.time() - t0:.1f}s", flush=True)


# ---------------------------------------------------------------------------
# driver entry: watchdogged subprocess orchestration
# ---------------------------------------------------------------------------

def _run_child(args, timeout_s, init_timeout_s=None, script=None):
    """Run `python <script or bench.py> <args>` streaming stdout through
    live; kill the whole process group on timeout (a hung TPU init ignores
    SIGTERM). If init_timeout_s is set and the INIT_MARKER line has not
    appeared by then, kill and return "init-timeout" so the caller can retry
    cheaply instead of burning the full metric budget on a hung backend
    init."""
    import threading

    proc = subprocess.Popen(
        [sys.executable, script or os.path.abspath(__file__)] + args,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, start_new_session=True)
    lines = []
    marker_seen = threading.Event()

    def _reader():
        for ln in proc.stdout:
            ln = ln.rstrip("\n")
            lines.append(ln)
            print(ln, flush=True)
            if ln.startswith(INIT_MARKER):
                marker_seen.set()

    th = threading.Thread(target=_reader, daemon=True)
    th.start()
    t0 = time.time()
    verdict = None
    while proc.poll() is None:
        elapsed = time.time() - t0
        if (init_timeout_s is not None and not marker_seen.is_set()
                and elapsed > init_timeout_s):
            verdict = "init-timeout"
            break
        if elapsed > timeout_s:
            verdict = "timeout"
            break
        time.sleep(0.5)
    if verdict is not None:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        pass
    th.join(timeout=5)
    return (verdict if verdict is not None else proc.returncode), lines


def main():
    t_start = time.time()

    def hard_remaining():
        return HARD_TOTAL_S - (time.time() - t_start)

    # --- preflight: bounded, retried, killable. Attempt 1 gets the long
    # window (observed good-but-slow inits up to 114.7 s); retries the
    # short one (a crashed worker recovers on its own in ~3 min) ---------
    ok = False
    for attempt in range(1, PREFLIGHT_ATTEMPTS + 1):
        cap = PREFLIGHT_TIMEOUT_S if attempt == 1 else PREFLIGHT_RETRY_TIMEOUT_S
        budget = min(cap, max(30.0, hard_remaining() - 120.0))
        print(f"# preflight attempt {attempt}/{PREFLIGHT_ATTEMPTS} "
              f"(timeout {budget:.0f}s)", flush=True)
        rc, _ = _run_child(["--preflight"], budget)
        if rc == 0:
            ok = True
            break
        print(f"# preflight attempt {attempt} failed (rc={rc})", flush=True)
        if hard_remaining() < 180:
            break
        if attempt < PREFLIGHT_ATTEMPTS:
            time.sleep(20)  # crashed worker recovers on its own in ~3 min
    if not ok:
        err = ("backend preflight failed: TPU init hung or crashed after "
               f"{PREFLIGHT_ATTEMPTS} bounded attempts — environmental, "
               "not a model regression (see BENCH docstring)")
        _emit_error("preflight", err)
        for name, _ in METRICS:
            _emit_error(name, "skipped: backend preflight failed")
        return

    # --- metric deadline counts from HERE (post-preflight), bounded by the
    # hard total cap (VERDICT r4: preflight retries used to eat the 1260 s
    # deadline and shrink the headline's budget to less than its compile)
    t_metrics = time.time()

    def remaining():
        return min(DEADLINE_S - (time.time() - t_metrics), hard_remaining())

    # --- parallel prewarm: lower+compile EVERY metric graph concurrently.
    # Server-side compile latency for one graph varied 13 s..5.5 min on the
    # same day and the server cache evicts within tens of minutes, so five
    # sequential children can each pay a full compile; five concurrent
    # prewarms pay ~max(compile) once, and the timed metrics then hit a
    # warm server cache. Stragglers are left to finish — NEVER killed:
    # SIGKILLing a mid-compile child can wedge the backend for minutes
    # (observed 2026-08-20 / VERDICT r4 keep-warm incident).
    # spawn prewarms for every metric AFTER the first and proceed
    # immediately: the first (train) metric's own child performs the train
    # compile anyway, and waiting for a prewarm wait-loop only burned
    # deadline (328-512 s measured). Later metrics' graphs compile in the
    # background while earlier metrics measure. Contention note: prewarm
    # children compile server-side and only touch the device for tiny
    # 64x64 inits, and the measured train s/it was IDENTICAL (0.44) with
    # prewarms racing (runs #4/#7, 2026-08-20) and solo — the timed loops
    # are not measurably perturbed.
    print(f"# prewarm: compiling {len(METRICS) - 1} later graphs in "
          "background subprocesses", flush=True)
    prewarm_procs = [
        (name, subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--metric", name, "--prewarm"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True))
        for name, _ in METRICS[1:]
    ]

    # --- metrics: one subprocess each, per-metric + overall deadline;
    # a child whose backend init hangs is killed at INIT_TIMEOUT_S and
    # retried once (the hang is intermittent — the next attach usually
    # succeeds in seconds). A metric that TIMES OUT gets one retry AFTER
    # the others: the backend's slow windows (compile/transfer latency
    # varied 13 s..5.5 min for the same graph on 2026-08-20) usually pass
    # within minutes, so a late retry often lands in a fast window. ------
    headline_line = None

    def run_one(name, budget_cap):
        nonlocal headline_line
        for attempt in (1, 2):
            budget = min(budget_cap, remaining() - 30.0)
            if budget < 90:
                return "deadline"
            rc, lines = _run_child(
                ["--metric", name], budget,
                init_timeout_s=min(INIT_TIMEOUT_S, budget - 30.0))
            if rc == "init-timeout" and attempt == 1:
                print(f"# {name}: backend init hung >"
                      f"{INIT_TIMEOUT_S:.0f}s, retrying", flush=True)
                continue
            if rc == "init-timeout":
                return "backend init hung on both attempts"
            if rc == "timeout":
                return f"timeout after {budget:.0f}s (killed)"
            if rc != 0:
                tail = "; ".join(lines[-3:])[-300:] if lines else ""
                return f"subprocess rc={rc}: {tail}"
            if name == "headline":
                for ln in lines:
                    if ln.startswith("{") and '"value"' in ln:
                        headline_line = ln
            return "ok"
        return "ok"

    failures = {}
    for name, cap in METRICS:
        status = run_one(name, cap)
        if status == "ok":
            continue
        if status == "deadline":
            failures[name] = "skipped: overall bench deadline reached"
        else:
            failures[name] = status
            print(f"# {name}: {status}; will retry after the other metrics",
                  flush=True)

    for name, cap in METRICS:
        if name not in failures or failures[name].startswith("skipped"):
            continue
        if remaining() < 150:
            break
        print(f"# retry: {name}", flush=True)
        status = run_one(name, cap)
        if status == "ok":
            del failures[name]
        elif status != "deadline":
            failures[name] = status + " (retry)"

    for name, _ in METRICS:
        if name in failures:
            _emit_error(name, failures[name])

    # --- on-chip Pallas kernel gate (VERDICT r4 item 7): certify the
    # Mosaic compile on real hardware every round. Runs AFTER the metrics
    # so it can never starve their budgets; bounded by the hard cap.
    gate = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "onchip_kernel_check.py")
    budget = min(300.0, hard_remaining() - 30.0)
    if budget > 60 and os.path.exists(gate):
        rc, lines = _run_child([], budget, script=gate)
        if rc == 0:
            _emit("onchip_kernel_check (Pallas vs XLA, fwd+grads)", 1.0,
                  "pass", 1.0)
        else:
            _emit_error("onchip_kernel_check",
                        f"rc={rc}: " + ("; ".join(lines[-2:])[-200:]
                                        if lines else ""))
    else:
        _emit_error("onchip_kernel_check", "skipped: no time budget left")

    # --- leave the chip clean: the metrics took >=10 min, so any prewarm
    # child still alive is WEDGED (its compile long since finished or will
    # never finish), not mid-compile — reap it rather than leave a stray
    # process behind for the next run
    deadline = time.time() + min(20.0, max(0.0, hard_remaining() - 20.0))
    for name, p in prewarm_procs:
        try:
            p.wait(timeout=max(0.1, deadline - time.time()))
        except subprocess.TimeoutExpired:
            print(f"# reaping wedged prewarm child for {name}", flush=True)
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                p.kill()
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                pass

    # --- headline re-emitted as the LAST line (same measurement) --------
    if headline_line is not None:
        print(headline_line, flush=True)


def run_selftest_child(pre_s, post_s):
    """TPU-free child for tests/test_bench_harness.py: sleep pre_s, print
    the INIT_MARKER, sleep post_s, exit 0. Lets the suite exercise
    _run_child's init-timeout / timeout / success verdicts without a
    backend."""
    time.sleep(pre_s)
    print(INIT_MARKER, flush=True)
    time.sleep(post_s)
    print("selftest child done", flush=True)


if __name__ == "__main__":
    if "--preflight" in sys.argv:
        run_preflight()
    elif "--metric" in sys.argv:
        if "--prewarm" in sys.argv:
            PREWARM = True
        run_metric(sys.argv[sys.argv.index("--metric") + 1])
    elif "--selftest-child" in sys.argv:
        i = sys.argv.index("--selftest-child")
        run_selftest_child(float(sys.argv[i + 1]), float(sys.argv[i + 2]))
    else:
        main()
