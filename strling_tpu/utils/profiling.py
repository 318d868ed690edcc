"""Tracing / profiling hooks.

The reference's only observability is stderr progress (reads/sec every 10M
reads, extract.nim:317-320) — which this build mirrors in core/extract.py.
On top of that, every CLI stage accepts `--profile DIR` to capture a
jax.profiler device trace (XLA/Pallas op timelines, viewable in
TensorBoard/Perfetto), plus wall-time stage banners.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None, label: str = "stage"):
    """Capture a jax.profiler trace of the enclosed block when a directory is
    given; otherwise a zero-cost no-op."""
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(
            f"[strling] {label}: {time.perf_counter() - t0:.2f}s; "
            f"profiler trace written to {trace_dir}",
            file=sys.stderr,
        )


@contextlib.contextmanager
def stage_timer(label: str, verbose: bool = True):
    """Wall-clock banner for a pipeline stage (cpuTime() analog,
    extract.nim:304)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if verbose:
            print(
                f"[strling] time for {label}: {time.perf_counter() - t0:.2f}s",
                file=sys.stderr,
            )
