"""Device-side LZ match-candidate scoring (SURVEY §7 step 6).

The zstd bitstream is inherently serial, but match *finding* is the
data-parallel 99% of the work.  This kernel computes, for every input
position, the K closest earlier positions sharing the same 4-byte window —
with a sort instead of a hash table (hash tables are sequential-write; a
(key, position) sort is how you express "group equal windows" on a TPU):

    keys      = hash32(window4(data))          # gather + multiply, VPU
    order     = argsort(keys, stable)          # XLA sort, runs on device
    cand[p,j] = j-th previous position in p's equal-key run

Hash collisions are harmless: the host serializer re-verifies bytes before
using a candidate (naf_zstd.cpp), exactly as it does for its own hash
table.  The output feeds ``naf_zstd_compress_cand_k`` — device proposes the
candidate chain, host extends/scores/packs the bitstream.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.lazy import LazyModule, lazy_jit

jnp = LazyModule("jax.numpy")

#: candidate chain depth proposed per position
TOP_K = 4


@lazy_jit(static_argnames=("k",))
def _candidates(data, k: int):
    n = data.shape[0]
    d = data.astype(jnp.uint32)
    # 4-byte little-endian window at each position (tail windows wrap
    # harmlessly; the host ignores candidates in the last 12 bytes)
    w = (d
         | jnp.roll(d, -1) << 8
         | jnp.roll(d, -2) << 16
         | jnp.roll(d, -3) << 24)
    keys = (w * jnp.uint32(2654435761)) >> 15
    order = jnp.argsort(keys, stable=True)          # pos ascending per key
    sk = jnp.take(keys, order)
    cols = []
    for j in range(1, k + 1):
        same = jnp.concatenate(
            [jnp.zeros(j, bool), sk[j:] == sk[:-j]])
        prev = jnp.concatenate(
            [jnp.zeros(j, jnp.int32), order[:-j].astype(jnp.int32)])
        cols.append(jnp.where(same, prev, jnp.int32(-1)))
    cand_sorted = jnp.stack(cols, axis=-1)          # [n, k]
    return jnp.zeros((n, k), jnp.int32).at[order].set(cand_sorted)


def find_match_candidates(data: np.ndarray, k: int = 1) -> np.ndarray:
    """int32[n, k] (or [n] when k == 1): closest earlier same-window
    positions, nearest first, -1 padded."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    if data.size < 16:
        out = np.full((data.size, k), -1, np.int32)
        return out[:, 0] if k == 1 else out
    out = np.asarray(_candidates(data, k))
    return out[:, 0] if k == 1 else out
