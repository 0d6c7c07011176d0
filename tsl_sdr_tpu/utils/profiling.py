"""Observability: throughput meters and JAX profiler traces.

The reference's only observability is a handful of counters logged at
thread exit (``multifm/demod.h:71-81``); SURVEY §5 calls for real
profiling in the new framework. Two tools:

* :class:`Throughput` — running samples/s meter with EMA smoothing, for
  CLI --stats style reporting.
* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace of device execution.
"""

from __future__ import annotations

import contextlib
import time


class Throughput:
    """Running samples/s with an exponential moving average."""

    def __init__(self, alpha: float = 0.2):
        self.alpha = alpha
        self.total = 0
        self.rate = 0.0
        self._t_last = None

    def update(self, n_samples: int):
        now = time.monotonic()
        self.total += n_samples
        if self._t_last is not None:
            dt = now - self._t_last
            if dt > 0:
                inst = n_samples / dt
                self.rate = (
                    inst if self.rate == 0.0
                    else self.alpha * inst + (1 - self.alpha) * self.rate
                )
        self._t_last = now

    def summary(self) -> str:
        return f"{self.total} samples, {self.rate / 1e6:.2f} Msps"


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile the enclosed block: ``with trace('/tmp/tb'): run()``.

    View with TensorBoard's profile plugin (or xprof). Produces device
    timelines for every XLA/Pallas kernel the block dispatches.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
