"""OOM-resilient execution (reference: mask2former_video/utils/memory.py:27-80
`retry_if_cuda_oom` — empty_cache retry, then fp16->fp32-on-CPU fallback,
wrapped around every inference step, maskformer_model.py:355-374).

TPU analogue: XLA raises RESOURCE_EXHAUSTED at compile/run time. The retry
ladder here is (1) plain retry (transient allocator pressure), (2) split the
batch in half recursively, (3) run the call on CPU."""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _is_oom(e: Exception) -> bool:
    s = str(e)
    return "RESOURCE_EXHAUSTED" in s or "Out of memory" in s or "OOM" in s


def retry_if_oom(fn: Callable, batch_axis: int = 0) -> Callable:
    """Wrap `fn(*arrays)` so TPU OOM falls back to half batches, then CPU.

    All positional args must share the batch axis; outputs are concatenated
    back along it."""

    @functools.wraps(fn)
    def wrapped(*args):
        try:
            return fn(*args)
        except Exception as e:  # noqa: BLE001 — XLA raises various types
            if not _is_oom(e):
                raise
        n = args[0].shape[batch_axis]
        if n > 1:
            half = n // 2

            def take(a, sl):
                idx = [slice(None)] * a.ndim
                idx[batch_axis] = sl
                return a[tuple(idx)]

            out1 = wrapped(*(take(a, slice(0, half)) for a in args))
            out2 = wrapped(*(take(a, slice(half, n)) for a in args))
            return jax.tree.map(
                lambda x, y: jnp.concatenate([x, y], batch_axis), out1, out2
            )
        # last resort: CPU
        cpu = jax.devices("cpu")[0]
        cpu_args = [jax.device_put(np.asarray(a), cpu) for a in args]
        with jax.default_device(cpu):
            return fn(*cpu_args)

    return wrapped
