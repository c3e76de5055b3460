"""Host->device transfer pipelining.

The production bottleneck is the HOST side of the train loop: stacking the
per-dispatch batch group and pushing ~0.6 MB over the tunneled host->TPU
link (~85 MB/s effective for fresh buffers; see CLAUDE.md) costs of order
one device step. Done inline, that time serializes with the dispatch; done
on a background thread, it overlaps with the in-flight scan's compute —
the TPU-native analog of the reference's DataLoader prefetch
(ref: lib/datasets/make_dataset.py:82-90), except the expensive part here
is the transfer, not the decode, so the pipeline sits between batch
assembly and dispatch rather than inside the loader.

JAX client calls (device_put / jnp.asarray) are thread-safe; dispatches
stay on the caller's thread, so parameter donation and RNG-key order are
unaffected.
"""
from __future__ import annotations

import queue
import threading


class DevicePrefetcher:
    """Run `prep_fn(item)` on one background thread, preserving order.

    submit() enqueues work (blocks when `depth` items are in flight —
    bounding host memory and device staging buffers); ready() yields any
    finished results without blocking; drain() marks end-of-input and
    yields the rest in order. A prep_fn exception is re-raised at the next
    ready()/drain() call on the caller's thread.
    """

    def __init__(self, prep_fn, depth: int = 2):
        self._prep = prep_fn
        self._in: queue.Queue = queue.Queue(maxsize=depth)
        self._out: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._in.get()
            if item is None:
                self._out.put((None, None))
                return
            try:
                self._out.put((self._prep(item), None))
            except BaseException as e:  # noqa: BLE001 — re-raised in caller
                self._out.put((None, e))
                return

    def submit(self, item):
        self._in.put(item)

    def ready(self):
        """Yield finished results without blocking."""
        while True:
            try:
                res, err = self._out.get_nowait()
            except queue.Empty:
                return
            if err is not None:
                raise err
            if res is None:
                return
            yield res

    def drain(self):
        """Signal end-of-input and yield all remaining results in order."""
        self._in.put(None)
        while True:
            res, err = self._out.get()
            if err is not None:
                raise err
            if res is None:
                return
            yield res

    def close(self):
        """Best-effort shutdown (error paths; drain() is the normal exit)."""
        try:
            self._in.put_nowait(None)
        except queue.Full:
            pass
        self._thread.join(timeout=10)
