"""Profiling / throughput instrumentation.

The reference's tracing story is ad-hoc wall-clock prints (SURVEY §5:
trainer epoch timing, per-image ms in detect.py). TPU equivalents:

- `trace(logdir)`: context manager around `jax.profiler` — produces a
  TensorBoard/Perfetto trace of device execution,
- `Throughput`: images/sec meter with EMA smoothing,
- `device_timer`: robust on-device timing helper that defeats both
  dispatch-overhead contamination and loop-invariant hoisting (both of
  which produced wildly wrong numbers on this hardware — see bench.py).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace", create_perfetto_link: bool = False):
    """Capture a device profile: `with trace('/tmp/t'): run_step()`."""
    import jax

    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Images/sec meter with exponential smoothing."""

    def __init__(self, smoothing: float = 0.9):
        self.smoothing = smoothing
        self.rate = None
        self._t = None

    def update(self, n_images: int) -> float:
        now = time.perf_counter()
        if self._t is not None:
            inst = n_images / max(now - self._t, 1e-9)
            self.rate = (inst if self.rate is None
                         else self.smoothing * self.rate
                         + (1 - self.smoothing) * inst)
        self._t = now
        return self.rate or 0.0


def device_timer(fn, *args, iters: int = 10):
    """Time `fn(*args)` on device, amortizing dispatch and defeating LICM.

    fn must take and return a pytree whose first leaf is an array; the
    timer chains iterations through a data dependency. Returns seconds per
    iteration.

    CAUTION: the value fetch pays one tunnel round trip (~25 ms here) per
    loop call, i.e. a ~25ms/iters floor on the returned number. iters=10
    is fine for ≥10 ms stage probes but reads every sub-ms op as
    "~2.5 ms" — pass iters≳200 for micro-ops (docs/performance.md,
    measurement methodology).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*args):
        def body(i, carry):
            acc, a = carry
            out = fn(a, *args[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            s = leaf.astype(jnp.float32).sum()
            a = a + (s * 1e-12).astype(a.dtype)
            return acc + s, a
        acc, _ = jax.lax.fori_loop(0, iters, body,
                                   (jnp.float32(0), args[0]))
        return acc

    # value fetch on BOTH calls: block_until_ready can return early
    # through the device tunnel in this environment (see CLAUDE.md), which
    # would let warmup execution bleed into the timed region.
    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters
