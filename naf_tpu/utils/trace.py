"""Lightweight stage tracing / profiling.

The reference has only ``--verbose`` progress messages (SURVEY §5); this
subsystem adds:

  * ``NAF_TPU_TRACE=1``   — per-stage wall times + byte counts to stderr
    (scan, section zstd, section unzstd, render, container);
  * ``NAF_TPU_PROFILE=dir`` — wraps the process in a JAX profiler trace
    (device path only; produces a TensorBoard/Perfetto trace in `dir`).

Usage::

    with trace_span("scan", bytes=len(piece)):
        ...

Zero overhead when disabled (module-level flag check).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

ENABLED = bool(os.environ.get("NAF_TPU_TRACE"))
_PROFILE_DIR = os.environ.get("NAF_TPU_PROFILE")


@contextlib.contextmanager
def trace_span(stage: str, **fields):
    """Time a pipeline stage; prints '[naf-trace] stage 12.3ms k=v' when on."""
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = (time.perf_counter() - t0) * 1e3
        extra = " ".join(f"{k}={v}" for k, v in fields.items())
        mbs = ""
        if "bytes" in fields and dt > 0:
            mbs = f" ({fields['bytes'] / dt / 1048.576:.0f} MB/s)"
        print(f"[naf-trace] {stage:<16} {dt:9.2f} ms{mbs} {extra}",
              file=sys.stderr)


@contextlib.contextmanager
def device_profile():
    """JAX profiler session when NAF_TPU_PROFILE=dir is set."""
    if not _PROFILE_DIR:
        yield
        return
    import jax

    jax.profiler.start_trace(_PROFILE_DIR)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
