"""Overlapped host/device inference pipeline (reference:
demo/predictor.py:131-199 `AsyncPredictor`).

The reference overlaps visualization with inference by spawning one
`_PredictWorker` process per GPU connected by task/result multiprocessing
queues. On a single TPU chip the equivalent parallelism is a 3-stage
THREAD pipeline (JAX dispatch is async, so the device crunches batch i
while the host preprocesses batch i+1 and postprocesses batch i-1):

  loader thread:  item -> preprocess(item)   (file IO + numpy resize/pad)
  caller thread:  dispatch jitted predict    (returns device futures)
  caller thread:  materialize the OLDEST in-flight result (device sync)

Results are yielded strictly in submission order (the reference tracks
put/get indices for the same guarantee, predictor.py:178-196)."""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Tuple


class AsyncPredictor:
    """predict_fn: device inference taking preprocess's output;
    preprocess: host-side item -> model input (runs in the loader thread);
    postprocess: device output -> host result (runs in the caller thread,
    materializing device arrays = the pipeline's sync point);
    depth: in-flight device batches (2 = double buffering)."""

    _STOP = object()

    def __init__(self, predict_fn: Callable, preprocess: Callable,
                 postprocess: Callable = lambda item, out: out,
                 depth: int = 2, queue_size: int = 4):
        self.predict_fn = predict_fn
        self.preprocess = preprocess
        self.postprocess = postprocess
        self.depth = max(1, depth)
        self.queue_size = queue_size

    def __call__(self, items: Iterable[Any]) -> Iterator[Tuple[Any, Any]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.queue_size)
        err: list = []

        def loader():
            try:
                for item in items:
                    q.put((item, self.preprocess(item)))
            except BaseException as e:  # noqa: BLE001 — surface in caller
                err.append(e)
            finally:
                q.put(self._STOP)

        t = threading.Thread(target=loader, daemon=True)
        t.start()

        inflight: list = []
        try:
            while True:
                got = q.get()
                if got is self._STOP:
                    break
                item, inputs = got
                inflight.append((item, self.predict_fn(inputs)))
                if len(inflight) >= self.depth:
                    it, out = inflight.pop(0)
                    yield it, self.postprocess(it, out)
            for it, out in inflight:
                yield it, self.postprocess(it, out)
            inflight = []
        finally:
            # a consumer that abandons the generator early would otherwise
            # leave the loader thread blocked on a full queue forever —
            # drain so it can observe the stop and exit (bounded: if
            # preprocess itself is slow we give up after 10 s and leave the
            # daemon thread to die with the process)
            import time as _time

            deadline = _time.monotonic() + 10.0
            while t.is_alive() and _time.monotonic() < deadline:
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.1)
        if err:
            raise err[0]
