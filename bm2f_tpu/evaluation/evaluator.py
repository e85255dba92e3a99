"""DatasetEvaluator protocol + inference loop (replacement for detectron2's
inference_on_dataset used by the reference's Trainer.test)."""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np


def inference_on_dataset(
    predict_fn: Callable[[Dict], Dict],
    data_loader: Iterable[Dict],
    process_fn: Callable[[Dict, Dict], None],
    evaluate_fn: Callable[[], Dict[str, float]],
    *,
    log_every: int = 50,
) -> Dict[str, float]:
    """predict_fn: batched jitted model+inference; process_fn feeds each
    (prediction, batch) pair into the evaluator(s)."""
    n = 0
    t0 = time.time()
    for batch in data_loader:
        preds = predict_fn(batch)
        preds = jax.tree.map(np.asarray, preds)
        process_fn(preds, batch)
        n += 1
        if n % log_every == 0:
            print(f"inference {n} batches ({(time.time()-t0)/n:.3f} s/batch)")
    return evaluate_fn()


def gather_evaluator(ev):
    """Merge evaluator state across hosts before evaluate() (reference:
    ytvis_eval.py:120-126 comm.gather / d2 comm.synchronize). Each process
    pickles its `state_dict()`, all-gathers the padded byte payloads over
    the ICI/DCN fabric, and folds every other process's state in via
    `merge_state`. No-op in single-process runs."""
    if jax.process_count() == 1:
        return ev
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(ev.state_dict()), np.uint8)
    sizes = multihost_utils.process_allgather(np.array([payload.size]))
    maxlen = int(np.max(sizes))
    padded = np.zeros(maxlen, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    ev.reset()
    for i in range(gathered.shape[0]):
        size = int(np.asarray(sizes).reshape(-1)[i])
        ev.merge_state(pickle.loads(bytes(gathered[i][:size])))
    return ev


def verify_results(expected: Dict[str, float], results: Dict[str, float],
                   tolerance: float = 0.3) -> bool:
    """Assert metric parity against expected numbers (reference: detectron2
    verify_results driven by TEST.EXPECTED_RESULTS, train_net.py:317)."""
    ok = True
    for k, v in expected.items():
        got = results.get(k)
        if got is None or abs(got - v) > tolerance:
            print(f"verify_results FAIL: {k}: expected {v} got {got}")
            ok = False
        else:
            print(f"verify_results OK: {k}: {got} (expected {v} +- {tolerance})")
    return ok
