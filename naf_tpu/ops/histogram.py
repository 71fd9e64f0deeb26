"""Byte histograms: --charcount and unexpected-character statistics.

Device path uses a scatter-add (jnp bincount); host path uses numpy.
Reference parity: unnaf/src/output.c:544-605 (charcount),
ennaf/src/process.c:75-96 (unexpected-char report).
"""

from __future__ import annotations

import numpy as np

from ..utils.lazy import LazyModule, lazy_jit

jax = LazyModule("jax")
jnp = LazyModule("jax.numpy")


@lazy_jit
def charcount_jnp(data: jnp.ndarray) -> jnp.ndarray:
    """u8[N] -> i32 counts[256] for ONE chunk (N must be < 2**31).

    Device scatter-adds are 32-bit; unbounded streams go through
    ``charcount_device`` which accumulates chunk histograms in u64 on host.
    """
    return jnp.zeros(256, dtype=jnp.int32).at[data.astype(jnp.int32)].add(1)


#: chunk bound for 32-bit device histograms: a single chunk can add at most
#: 2**30 to one bin, so the i32 bins cannot wrap.
_HIST_CHUNK = 1 << 30


def charcount_device(data: np.ndarray) -> np.ndarray:
    """u8[N] (any N) -> u64 counts[256]; device per-chunk, u64 host merge."""
    total = np.zeros(256, np.uint64)
    for off in range(0, max(data.size, 1), _HIST_CHUNK):
        chunk = data[off:off + _HIST_CHUNK]
        if chunk.size:
            total += np.asarray(charcount_jnp(jnp.asarray(chunk))).astype(np.uint64)
    return total


def charcount_np(data: np.ndarray) -> np.ndarray:
    return np.bincount(data, minlength=256).astype(np.uint64)


def format_charcount(counts: np.ndarray) -> str:
    """Exact --charcount rendering (output.c:602-604)."""
    lines = []
    for i in range(0, 33):
        if counts[i]:
            lines.append("\\x%02X\t%d\n" % (i, counts[i]))
    for i in range(33, 127):
        if counts[i]:
            lines.append("%c\t%d\n" % (chr(i), counts[i]))
    for i in range(127, 256):
        if counts[i]:
            lines.append("\\x%02X\t%d\n" % (i, counts[i]))
    return "".join(lines)


def format_unexpected_report(counts: np.ndarray, kind_name: str) -> str:
    """Exact stderr report (process.c:75-87); counts has 257 bins (EOF last)."""
    total = int(counts.sum())
    if total == 0:
        return ""
    lines = [f"input has {total} unexpected {kind_name} characters:\n"]
    for i in range(0, 32):
        if counts[i]:
            lines.append("    '\\x%02X': %d\n" % (i, counts[i]))
    for i in range(32, 127):
        if counts[i]:
            lines.append("    '%c': %d\n" % (chr(i), counts[i]))
    for i in range(127, 256):
        if counts[i]:
            lines.append("    '\\x%02X': %d\n" % (i, counts[i]))
    if len(counts) > 256 and counts[256]:
        lines.append("    EOF: %d\n" % counts[256])
    return "".join(lines)
