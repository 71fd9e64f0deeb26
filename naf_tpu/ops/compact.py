"""Stream compaction on TPU — the emit pass's bottleneck transform.

XLA offers no fast compaction: the scatter formulation is element-at-a-time
(~0.1 GB/s on v5e) and a stable key sort only ~0.22 GB/s.  This kernel does
it the TPU-native way:

  1. Pallas per-tile pack: each (ROWS, 128) tile left-packs its kept lanes.
     Within a 128-lane row the classic butterfly compaction runs fully
     vectorized (7 static lane rolls, one per shift bit).  Two tile-merge
     strategies: the GENERAL kernel merges rows into a staging group
     sequentially (dynamic lane roll + dynamic-sublane stores, any keep
     density), and the DENSE kernel (compact_u8_dense) places K=4 shifted
     source-row candidates per output row with per-row variable lane
     rotation by binary decomposition — no sequential loop — valid while
     cumulative holes stay inside the K-row window (self-checked from
     per-row counts; a lax.cond falls back to the general kernel).
  2. XLA epilogue: per-tile counts -> exclusive offsets (tiny cumsum), then
     a ``fori_loop`` of tile-sized ``dynamic_update_slice`` writes stitches
     the padded tiles into the final stream.  Ascending order makes each
     tile's padding land exactly where the next tile overwrites it.

Reference counterpart: the byte-at-a-time copy loops of the reference
encoder (ennaf/src/process.c); here compaction feeds the 4-bit packer and
the id/comment/quality section streams (parallel/block.py).
"""

from __future__ import annotations

import numpy as np

from ..utils.lazy import LazyModule, lazy_jit

jax = LazyModule("jax")
jnp = LazyModule("jax.numpy")
pl = LazyModule("jax.experimental.pallas")
pltpu = LazyModule("jax.experimental.pallas.tpu")

_LANES = 128
_ROWS = 256                       # tile = 32 KB of input
_TILE = _ROWS * _LANES


def _lane_cumsum_excl(x):
    """Exclusive prefix sum along the 128-lane axis (7 static rolls)."""
    acc = x
    for s in (1, 2, 4, 8, 16, 32, 64):
        sh = jnp.roll(acc, s, axis=-1)
        lane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, acc.ndim - 1)
        acc = acc + jnp.where(lane >= s, sh, 0)
    return acc - x                # inclusive -> exclusive


def _butterfly_pack(v, keep):
    """Left-pack kept lanes within each 128-lane row (vectorized all rows).

    Each kept element must move left by the number of holes before it;
    moving bit-by-bit keeps every step a static lane roll + select.
    """
    shift = jnp.where(keep, _lane_cumsum_excl((~keep).astype(jnp.int32)), 0)
    live = keep.astype(jnp.int32)         # i32 masks: Mosaic rejects bool rolls
    x = jnp.where(keep, v, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    for j in range(7):
        step = 1 << j
        src_live = jnp.roll(live, -step, axis=-1)
        src_shift = jnp.roll(shift, -step, axis=-1)
        src_x = jnp.roll(x, -step, axis=-1)
        valid_src = lane + step < _LANES
        take = valid_src & (src_live != 0) & ((src_shift & step) != 0)
        keep_here = (live != 0) & ((shift & step) == 0)
        x = jnp.where(take, src_x, jnp.where(keep_here, x, 0))
        shift = jnp.where(take, src_shift - step,
                          jnp.where(keep_here, shift, 0))
        live = (take | keep_here).astype(jnp.int32)
    return x


_GROUP = 8                        # sublane group: Mosaic's store alignment


def _compact_kernel(v_ref, k_ref, out_ref, stage, fvals):
    """Per-tile compaction: left-pack rows, then merge in 8-row groups.

    Mosaic only allows dynamic sublane offsets that are provably multiples
    of 8, so the merge carries an (8, 128) staging GROUP as a loop value
    (row placement is a sublane-iota select, not a store) and flushes whole
    groups at ``out_grp * 8``.
    """
    keep = k_ref[:] != 0
    packed = _butterfly_pack(v_ref[:].astype(jnp.int32), keep)
    stage[:_ROWS, :] = packed
    del fvals                     # alignment scratch kept for ABI stability

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, 1), 0)
    cap = _GROUP * _LANES         # elements per staging group

    def outer(g8, carry):
        buf, f, out_grp = carry
        grp = stage[pl.ds(g8 * _GROUP, _GROUP), :]          # aligned load
        kv = jnp.sum((k_ref[pl.ds(g8 * _GROUP, _GROUP), :] != 0
                      ).astype(jnp.int32), axis=1)           # (8,)
        for j in range(_GROUP):                              # static unroll
            row = jnp.sum(jnp.where(sub8 == j, grp, 0), axis=0,
                          keepdims=True)                     # (1, 128)
            k_r = kv[j]
            fl = f % _LANES
            sr = f // _LANES
            # roll the full-height broadcast: Mosaic's dynamic roll asserts
            # on sub-native (1, 128) vregs
            bcast = pltpu.roll(
                jnp.broadcast_to(row, (_GROUP, _LANES)), fl, 1)
            mask_a = (lane >= fl) & (lane < fl + k_r)
            mask_b = lane < (fl + k_r - _LANES)
            contrib = ((sub8 == sr) & mask_a) | ((sub8 == sr + 1) & mask_b)
            merged = jnp.where(contrib, bcast, buf)
            nf = f + k_r
            flush = nf >= cap

            @pl.when(flush)
            def _store():
                out_ref[pl.ds(out_grp * _GROUP, _GROUP), :] = merged

            # a flush implies sr == GROUP-1; the wrapped lanes seed sub 0
            spill = jnp.where((sub8 == 0) & mask_b, bcast,
                              jnp.zeros((_GROUP, _LANES), jnp.int32))
            buf = jnp.where(flush, spill, merged)
            out_grp = out_grp + flush.astype(jnp.int32)
            f = nf - jnp.where(flush, cap, 0)
        return buf, f, out_grp

    buf0 = jnp.zeros((_GROUP, _LANES), jnp.int32)
    buf, f, out_grp = jax.lax.fori_loop(
        0, _ROWS // _GROUP, outer, (buf0, jnp.int32(0), jnp.int32(0)))
    # final partial group (garbage beyond the tile's count is overwritten
    # by the next tile in the XLA merge epilogue)
    @pl.when(out_grp * _GROUP < _ROWS)
    def _tail():
        out_ref[pl.ds(out_grp * _GROUP, _GROUP), :] = buf


@lazy_jit(static_argnames=("interpret",))
def _compact_tiles(values, keep, interpret: bool = False):
    """u8[n] (n % TILE == 0) -> (i32[G, ROWS, 128] packed tiles, i32[G])."""
    n = values.shape[0]
    g = n // _TILE
    v2 = values.reshape(g * _ROWS, _LANES)
    k2 = keep.reshape(g * _ROWS, _LANES).astype(jnp.uint8)
    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _compact_kernel,
        grid=(g,),
        in_specs=[spec, spec],
        out_shape=jax.ShapeDtypeStruct((g * _ROWS, _LANES), jnp.int32),
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((_ROWS, _LANES), jnp.int32),
                        pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(v2, k2)
    # per-tile kept counts: a plain vector reduce, no kernel output needed
    cnts = jnp.sum(k2.astype(jnp.int32).reshape(g, _TILE), axis=1)
    return out.reshape(g, _TILE), cnts


# ---------------------------------------------------------------------------
# Dense-path kernel: shifted-candidate merge (no sequential row loop)
# ---------------------------------------------------------------------------

_DROWS = 128                      # dense tile = 16 KB of input
_DTILE = _DROWS * _LANES
_KCAND = 4                        # output row o draws from rows o..o+K-1


def _dense_compact_kernel(v_ref, k_ref, out_ref):
    """Per-tile compaction without the sequential merge: after the per-row
    butterfly, output row o's lanes come from at most _KCAND source rows
    (valid while cumulative holes above any row stay < (K-1)*128 — the
    caller falls back to the general kernel otherwise, signalled via
    ``ok_ref``).  Each candidate contributes via ONE static sublane roll
    plus a per-row variable lane rotation done as 7 static roll+selects
    (binary decomposition of the rotation amount) — all vector ops.
    """
    keep = k_ref[:] != 0
    packed = _butterfly_pack(v_ref[:].astype(jnp.int32), keep)
    c = jnp.sum(keep.astype(jnp.int32), axis=1, keepdims=True)   # (R,1)

    # exclusive prefix of row counts, broadcast along lanes
    t = jnp.broadcast_to(c, (_DROWS, _LANES))
    row = jax.lax.broadcasted_iota(jnp.int32, (_DROWS, _LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_DROWS, _LANES), 1)
    s = 1
    while s < _DROWS:
        sh = jnp.roll(t, s, axis=0)
        t = t + jnp.where(row >= s, sh, 0)
        s *= 2
    f_excl = t - jnp.broadcast_to(c, (_DROWS, _LANES))   # f[r] excl prefix

    out = jnp.zeros((_DROWS, _LANES), jnp.int32)
    base = row * _LANES                       # 128*o per output row
    for k in range(_KCAND):
        src = pltpu.roll(packed, _DROWS - k, axis=0) if k else packed
        fk = pltpu.roll(f_excl, _DROWS - k, axis=0) if k else f_excl
        cb = jnp.broadcast_to(c, (_DROWS, _LANES))
        ck = pltpu.roll(cb, _DROWS - k, axis=0) if k else cb
        dk = fk - base                        # placement shift of row o+k
        # cyclic right-rotation of each row by dk mod 128, one bit at a time
        dkm = dk & 127
        x = src
        for sbit in (1, 2, 4, 8, 16, 32, 64):
            x = jnp.where((dkm & sbit) != 0, jnp.roll(x, sbit, axis=1), x)
        valid_row = row + k < _DROWS
        m = valid_row & (lane >= dk) & (lane < dk + ck)
        out = jnp.where(m, x, out)
    out_ref[:] = out


@lazy_jit(static_argnames=("interpret",))
def _compact_tiles_dense(values, keep, interpret: bool = False):
    """u8[n] (n % DTILE == 0) -> (i32[G, DTILE] tiles, i32[G] cnts, ok)."""
    n = values.shape[0]
    g = n // _DTILE
    v2 = values.reshape(g * _DROWS, _LANES)
    k2 = keep.reshape(g * _DROWS, _LANES).astype(jnp.uint8)
    spec = pl.BlockSpec((_DROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _dense_compact_kernel,
        grid=(g,),
        in_specs=[spec, spec],
        out_shape=jax.ShapeDtypeStruct((g * _DROWS, _LANES), jnp.int32),
        out_specs=spec,
        interpret=interpret,
    )(v2, k2)
    cnts = jnp.sum(k2.astype(jnp.int32).reshape(g, _DTILE), axis=1)
    # K-window validity in XLA (needs only per-row counts): output row o of
    # a tile draws from rows o..o+K-1 only, which holds iff no row o+K has
    # its data start at or before lane 127 of output row o (f is
    # non-decreasing, so later rows reach even further back)
    rowcnt = jnp.sum(k2.astype(jnp.int32), axis=1).reshape(g, _DROWS)
    f_incl = jnp.cumsum(rowcnt, axis=1)
    f_excl = f_incl - rowcnt
    o = jnp.arange(_DROWS - _KCAND, dtype=jnp.int32)
    bad = f_excl[:, _KCAND:] <= (o[None, :] * _LANES + _LANES - 1)
    ok = 1 - jnp.max(bad.astype(jnp.int32))
    return out.reshape(g, _DTILE), cnts, ok


@lazy_jit(static_argnames=("interpret",))
def compact_u8_dense(values, keep, interpret: bool = False):
    """Dense-regime compaction (out, count): the candidate-merge kernel
    when every tile's holes fit the K-row window, the general butterfly+
    sequential-merge kernel otherwise (one lax.cond — both compiled, one
    executed; keeps the heavy path OUT of the fast kernel so Mosaic's
    schedule stays lean).  Bench: 1.1 GB/s general vs ~4 GB/s dense on
    98%-keep FASTA streams.
    """
    n = values.shape[0]
    pad = (-n) % _DTILE
    v, k = values, keep
    if pad:
        v = jnp.concatenate([v, jnp.zeros(pad, values.dtype)])
        k = jnp.concatenate([k, jnp.zeros(pad, bool)])
    tiles, cnts, ok = _compact_tiles_dense(v, k, interpret=interpret)
    g = tiles.shape[0]
    total = jnp.sum(cnts)
    offs = jnp.cumsum(cnts) - cnts

    def merge(_):
        def body(t, acc):
            return jax.lax.dynamic_update_slice(acc, tiles[t], (offs[t],))
        merged = jax.lax.fori_loop(0, g, body,
                                   jnp.zeros(g * _DTILE, jnp.int32))
        idx = jnp.arange(n, dtype=jnp.int32)
        return jnp.where(idx < total, merged[:n], 0).astype(values.dtype)

    def fallback(_):
        return compact_u8_pallas(values, keep, interpret=interpret)[0]

    out = jax.lax.cond(ok > 0, merge, fallback, 0)
    return out, total


@lazy_jit(static_argnames=("interpret",))
def compact_u8_pallas(values, keep, interpret: bool = False):
    """Stable compaction of a u8 stream: (out u8[n], count).

    Same contract as ops.scan.compact: kept values move to the front in
    order; positions >= count are zero.  Caller may pass any length; the
    tail is padded internally with dropped lanes.
    """
    n = values.shape[0]
    pad = (-n) % _TILE
    v = values
    k = keep
    if pad:
        v = jnp.concatenate([v, jnp.zeros(pad, values.dtype)])
        k = jnp.concatenate([k, jnp.zeros(pad, bool)])
    tiles, cnts = _compact_tiles(v, k, interpret=interpret)
    g = tiles.shape[0]
    total = jnp.sum(cnts)
    offs = jnp.cumsum(cnts) - cnts

    def body(t, out):
        return jax.lax.dynamic_update_slice(out, tiles[t], (offs[t],))

    merged = jax.lax.fori_loop(0, g, body,
                               jnp.zeros(g * _TILE, jnp.int32))
    idx = jnp.arange(n, dtype=jnp.int32)
    out = jnp.where(idx < total, merged[:n], 0).astype(values.dtype)
    return out, total
