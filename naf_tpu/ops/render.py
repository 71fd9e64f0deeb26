"""Output rendering: line wrapping and record interleaving for decode.

The reference streams bytes through small buffers with per-record state
(unnaf/src/output.c:339-430).  Here rendering is a single vectorized
scatter/gather over the whole output buffer: for every output byte position
we compute whether it is a newline or which sequence byte it copies.

`wrap_records_np` is the host (numpy) implementation used by the decoder;
`wrap_stream_jnp` is the device form for on-device rendering of a
concatenated stream with uniform wrap width.
"""

from __future__ import annotations

import numpy as np

from ..utils.lazy import LazyModule, lazy_jit

jax = LazyModule("jax")
jnp = LazyModule("jax.numpy")


def body_length(seq_len: np.ndarray, line_len: int) -> np.ndarray:
    """Output body size per record: seq plus newlines (incl. final one).

    line_len == 0 means no wrapping (raw + final newline).  Empty sequences
    produce empty bodies (header-only records print no blank line).
    """
    seq_len = np.asarray(seq_len, dtype=np.int64)
    if line_len <= 0:
        return np.where(seq_len > 0, seq_len + 1, 0)
    n_lines = -(-seq_len // line_len)  # ceil
    return np.where(seq_len > 0, seq_len + n_lines, 0)


def wrap_records_np(seq: np.ndarray, seq_lens: np.ndarray, line_len: int) -> np.ndarray:
    """Concatenated seq bytes + per-record lengths -> wrapped body stream.

    Returns the concatenation over records of: record bytes with '\n'
    inserted after every `line_len` chars, plus a final '\n' per non-empty
    record.  (Headers are interleaved separately by the decoder.)
    """
    seq = np.ascontiguousarray(seq, dtype=np.uint8)
    seq_lens = np.asarray(seq_lens, dtype=np.int64)
    body_lens = body_length(seq_lens, line_len)
    total_out = int(body_lens.sum())
    if total_out == 0:
        return np.zeros(0, dtype=np.uint8)

    nonzero = seq_lens > 0
    blens = body_lens[nonzero]
    slens = seq_lens[nonzero]
    out_base = np.concatenate([[0], np.cumsum(blens)[:-1]])
    seq_base = np.concatenate([[0], np.cumsum(seq_lens)[:-1]])[nonzero]

    rec = np.repeat(np.arange(blens.size), blens)     # record per out byte
    off = np.arange(total_out, dtype=np.int64) - out_base[rec]

    if line_len > 0:
        is_nl = ((off + 1) % (line_len + 1) == 0) | (off == blens[rec] - 1)
        src = off - off // (line_len + 1)
    else:
        is_nl = off == blens[rec] - 1
        src = off
    out = np.empty(total_out, dtype=np.uint8)
    out[is_nl] = ord("\n")
    take = ~is_nl
    out[take] = seq[(seq_base[rec] + src)[take]]
    return out


@lazy_jit(static_argnames=("line_len", "total_out"))
def wrap_stream_jnp(seq: jnp.ndarray, seq_ends: jnp.ndarray, body_ends: jnp.ndarray,
                    line_len: int, total_out: int) -> jnp.ndarray:
    """Device form of wrap_records_np with precomputed prefix sums.

    seq_ends/body_ends: exclusive cumsum ends per (non-empty) record.
    """
    pos = jnp.arange(total_out, dtype=jnp.int64)
    rec = jnp.searchsorted(body_ends, pos, side="right")
    body_base = jnp.where(rec > 0, body_ends[jnp.maximum(rec - 1, 0)], 0)
    seq_base = jnp.where(rec > 0, seq_ends[jnp.maximum(rec - 1, 0)], 0)
    off = pos - body_base
    blen = body_ends[rec] - body_base
    if line_len > 0:
        is_nl = ((off + 1) % (line_len + 1) == 0) | (off == blen - 1)
        src = off - off // (line_len + 1)
    else:
        is_nl = off == blen - 1
        src = off
    chars = seq[jnp.clip(seq_base + src, 0, seq.shape[0] - 1)]
    return jnp.where(is_nl, jnp.uint8(ord("\n")), chars)


def interleave_records(headers: list[bytes], bodies: np.ndarray,
                       body_lens: np.ndarray) -> bytes:
    """Zip per-record header lines with slices of the wrapped body stream."""
    out = []
    pos = 0
    for k, h in enumerate(headers):
        out.append(h)
        ln = int(body_lens[k])
        if ln:
            out.append(bodies[pos:pos + ln].tobytes())
            pos += ln
    return b"".join(out)
