"""Device-side LZ match-candidate scoring (SURVEY §7 step 6).

The zstd bitstream is inherently serial, but match *finding* is the
data-parallel 99% of the work.  This kernel computes, for every input
position, the closest earlier position sharing the same 4-byte window —
with a sort instead of a hash table (hash tables are sequential-write; a
(key, position) sort is how you express "group equal windows" on a TPU):

    keys    = hash32(window4(data))          # gather + multiply, VPU
    order   = argsort(keys, stable)          # XLA sort, runs on device
    cand[p] = previous position in p's equal-key run (closest earlier)

Hash collisions are harmless: the host serializer re-verifies bytes before
using a candidate (naf_zstd.cpp), exactly as it does for its own hash
table.  The output feeds ``naf_zstd_compress_cand`` — device scores the
matches, host packs the bitstream.
"""

from __future__ import annotations

import numpy as np

from ..utils.lazy import LazyModule, lazy_jit

jnp = LazyModule("jax.numpy")


@lazy_jit
def _candidates(data):
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
    same = jnp.concatenate([jnp.zeros(1, bool), sk[1:] == sk[:-1]])
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            order[:-1].astype(jnp.int32)])
    cand_sorted = jnp.where(same, prev, jnp.int32(-1))
    return jnp.zeros(n, jnp.int32).at[order].set(cand_sorted)


def find_match_candidates(data: np.ndarray) -> np.ndarray:
    """int32[n]: closest earlier same-window position, or -1."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    if data.size < 16:
        return np.full(data.size, -1, np.int32)
    return np.asarray(_candidates(data))
