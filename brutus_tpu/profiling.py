"""
Tracing and throughput instrumentation.

The reference's only observability is stderr progress lines with mean
per-star timing (`brutus/fitting.py:1716-1731`).  The TPU framework
adds (SURVEY.md §5):
  * `trace(...)` — context manager around `jax.profiler` emitting an
    XPlane trace viewable in TensorBoard/Perfetto,
  * `annotate(...)` — named trace regions (`jax.profiler.TraceAnnotation`),
  * `Throughput` — a running stars/sec + ETA meter used by
    `fitting.BruteForce` and available to user pipelines.
"""

import contextlib
import sys
import time

import jax


@contextlib.contextmanager
def trace(logdir, with_host=True):
    """Capture a device trace for the enclosed block.

    View with TensorBoard (`tensorboard --logdir ...`) or Perfetto.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region that shows up inside profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """Running throughput/ETA meter.

    Example
    -------
    >>> meter = Throughput(total=len(stars), unit="stars")
    >>> for batch in batches:
    ...     process(batch)
    ...     meter.update(len(batch))
    """

    def __init__(self, total=None, unit="items", stream=sys.stderr,
                 report_every=1.0):
        self.total = total
        self.unit = unit
        self.stream = stream
        self.report_every = report_every
        self.t0 = time.perf_counter()
        self.done = 0
        self._last_report = 0.0

    @property
    def elapsed(self):
        return time.perf_counter() - self.t0

    @property
    def rate(self):
        dt = self.elapsed
        return self.done / dt if dt > 0 else 0.0

    @property
    def eta(self):
        if self.total is None or self.rate == 0:
            return float("nan")
        return (self.total - self.done) / self.rate

    def update(self, n=1, extra=""):
        self.done += n
        now = self.elapsed
        if self.stream is not None and (now - self._last_report
                                        >= self.report_every):
            self._last_report = now
            msg = (f"\r{self.done}"
                   + (f"/{self.total}" if self.total else "")
                   + f" {self.unit}  ({self.rate:.2f}/s")
            if self.total:
                msg += f", eta {self.eta:.1f} s"
            msg += ") " + extra + "   "
            self.stream.write(msg)
            self.stream.flush()

    def close(self):
        if self.stream is not None:
            self.stream.write("\n")
            self.stream.flush()


__all__ = ["trace", "annotate", "Throughput"]
