"""Profiling & tracing: jax.profiler traces + synced stage timers.

Replaces the reference's wall-clock-only Timer instrumentation (SURVEY.md §5:
pcdet/utils/timer.py wrapped around every pipeline stage, AverageMeter train
timing) with TPU-aware equivalents: device-synced timers and on-demand XLA
traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def stage_timer(name, sync_tree=None, verbose=True, stats=None):
    """Wall-clock timer that blocks on device work before stopping."""
    t0 = time.time()
    yield
    if sync_tree is not None:
        import jax

        jax.block_until_ready(sync_tree)
    dt = time.time() - t0
    if stats is not None:
        stats.setdefault(name, []).append(dt)
    if verbose:
        print(f"[stage] {name}: {dt:.4f}s")


@contextlib.contextmanager
def device_trace(log_dir="/tmp/pcseq_trace", enabled=True):
    """XLA profiler trace (open in TensorBoard's profile tab / Perfetto)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region inside a trace (shows in the timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
