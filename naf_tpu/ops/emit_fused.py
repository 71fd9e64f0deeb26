"""Single-pass fused FASTA emit kernel — classify + compact in one VMEM trip.

Round-4's device pipeline ran the classify kernel (11.5 GB/s) and then paid
~15 more full-size HBM passes: per-stream Pallas compactions (0.4-1.1 GB/s),
prefix scans, and segment sums, capping the sharded emit at ~100 MB/s.  This
kernel replaces ALL of them with ONE pass per tile:

  1. branchless classify (the transition-monoid scan of ops.scan_fused)
     keeps every mask in registers — no flags round trip;
  2. two packed 16-bit-pair Hillis-Steele prefix sums (stream|seq counts)
     and two max-scans (previous-kept case, last-EOL position) give every
     per-byte coordinate the emit needs;
  3. the kept stream is left-packed per 128-lane row by a butterfly, each
     row is rotated to its destination lane offset (7 static roll+selects,
     binary decomposition of the per-row rotation), and the cross-row merge
     is a ONE-HOT SEGMENT MATMUL on the MXU: out[o, l] = sum_r H[r, o] *
     contrib[r, l] with H[r, o] = (dest_row(r) == o).  Each output element
     receives exactly one contribution (destination lane ranges of
     consecutive rows are disjoint), so f32 accumulation is exact and the
     merge needs no sequential loop, no validity window, and no fallback —
     compaction at matrix-unit speed instead of vector-shuffle speed.
  4. everything sparse — id bytes, comment bytes, record boundaries, and
     mask-run case changes, four mutually disjoint byte classes — rides a
     single tagged side stream compacted the same way into a small capped
     block (default _CS_ROWS*128 = 2048 entries per 64 KiB FASTA tile,
     32 KiB for FASTQ; per-tile counts let the caller detect overflow and
     fall back to the two-pass path).

Per-record lengths and mask runs need no device segment sums at all: record
entries carry the global kept-sequence prefix at their marker, change
entries carry their index in the compacted stream, and the id/comment split
is implied by tag order — O(records + runs) host arithmetic.

Reference counterpart: the byte-at-a-time parse/append loops of
ennaf/src/process.c:143-311 and the per-section buffers they fill.
"""

from __future__ import annotations

import os as _os

from ..utils.lazy import LazyModule, lazy_jit

jax = LazyModule("jax")
jnp = LazyModule("jax.numpy")
pl = LazyModule("jax.experimental.pallas")
pltpu = LazyModule("jax.experimental.pallas.tpu")

from ..format import constants as C
from . import tables as T
from . import scan_fused as F
from .scan_fused import _ID, _SEQ, _extract, _shift1_rowmajor

_GT = ord(">")
_LANES = 128
#: tile rows MUST match ops.scan_fused's (the classify kernel is reused
#: verbatim as phase 1, writing flags/svals into VMEM scratch)
_ROWS = F._ROWS
_TILE = _ROWS * _LANES
#: sparse side-stream cap: rows of 128 tagged entries per tile
_CS_ROWS = int(_os.environ.get("NAF_TPU_EMIT_SPARSE_ROWS", "16"))
_CS_CAP = _CS_ROWS * _LANES

_NEGBIG = -(1 << 30)

# sparse stream tags (bits 8..9 of the tagged value)
TAG_ID, TAG_COM, TAG_REC, TAG_CHG = 0, 1, 2, 3

# carry slots (SMEM; the classify phase keeps its own 2-slot carry)
_C_CUMS, _C_CUMSEQ, _C_EOLBASE, _C_LONG, _C_ENC, _C_FLOW, _C_FSVAL = range(7)
_NCARRY = 7

# counts-row lanes (per tile)
LANE_CNT, LANE_SEQ, LANE_NSP, LANE_UID, LANE_UCOM, LANE_USEQ, \
    LANE_LONG, LANE_OPEN, LANE_FLOW, LANE_FSVAL = range(10)


def _hs_sum(x):
    """Row-major inclusive Hillis-Steele prefix sum over an (R, 128) tile."""
    R = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)
    p = x
    for s in (1, 2, 4, 8, 16, 32, 64):
        sh = jnp.roll(p, s, axis=1)
        p = p + jnp.where(lane >= s, sh, 0)
    t = jnp.broadcast_to(jax.lax.slice(p, (0, _LANES - 1), (R, _LANES)),
                         (R, _LANES))
    s = 1
    while s < R:
        sh = jnp.roll(t, s, axis=0)
        t = t + jnp.where(row >= s, sh, 0)
        s *= 2
    rc = jnp.roll(t, 1, axis=0)
    rc = jnp.where(row == 0, 0, rc)
    return p + rc


def _hs_max(x):
    """Row-major inclusive prefix max over an (R, 128) i32 tile."""
    R = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)
    p = x
    for s in (1, 2, 4, 8, 16, 32, 64):
        sh = jnp.roll(p, s, axis=1)
        p = jnp.maximum(p, jnp.where(lane >= s, sh, _NEGBIG))
    t = jnp.broadcast_to(jax.lax.slice(p, (0, _LANES - 1), (R, _LANES)),
                         (R, _LANES))
    s = 1
    while s < R:
        sh = jnp.roll(t, s, axis=0)
        t = jnp.maximum(t, jnp.where(row >= s, sh, _NEGBIG))
        s *= 2
    rc = jnp.roll(t, 1, axis=0)
    rc = jnp.where(row == 0, _NEGBIG, rc)
    return jnp.maximum(p, rc)


def _lane_cumsum_excl(x):
    """Exclusive prefix sum along the 128-lane axis (7 static rolls)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    acc = x
    for s in (1, 2, 4, 8, 16, 32, 64):
        sh = jnp.roll(acc, s, axis=-1)
        acc = acc + jnp.where(lane >= s, sh, 0)
    return acc - x


def _row_prefix_excl(c):
    """(R, 1) per-row counts -> (R, 128) broadcast exclusive row prefix."""
    R = c.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)
    t = jnp.broadcast_to(c, (R, _LANES))
    s = 1
    while s < R:
        sh = jnp.roll(t, s, axis=0)
        t = t + jnp.where(row >= s, sh, 0)
        s *= 2
    return t - jnp.broadcast_to(c, (R, _LANES))


def _butterfly_multi(keep, vals):
    """Left-pack kept lanes within each row for several value arrays at once.

    Same network as ops.compact._butterfly_pack, with the take/keep-here
    controls computed once and applied to every array in ``vals``.
    """
    shift = jnp.where(keep, _lane_cumsum_excl((~keep).astype(jnp.int32)), 0)
    live = keep.astype(jnp.int32)
    xs = [jnp.where(keep, v, 0) for v in vals]
    lane = jax.lax.broadcasted_iota(jnp.int32, keep.shape, keep.ndim - 1)
    for j in range(7):
        step = 1 << j
        src_live = jnp.roll(live, -step, axis=-1)
        src_shift = jnp.roll(shift, -step, axis=-1)
        valid_src = lane + step < _LANES
        take = valid_src & (src_live != 0) & ((src_shift & step) != 0)
        keep_here = (live != 0) & ((shift & step) == 0)
        xs = [jnp.where(take, jnp.roll(x, -step, axis=-1),
                        jnp.where(keep_here, x, 0)) for x in xs]
        shift = jnp.where(take, src_shift - step,
                          jnp.where(keep_here, shift, 0))
        live = (take | keep_here).astype(jnp.int32)
    return xs


def _var_lane_rot(xs, rot):
    """Rotate each row of every array in ``xs`` right by rot[r] (mod 128):
    binary decomposition into 7 static rolls, select masks shared."""
    rm = rot & 127
    out = list(xs)
    for sbit in (1, 2, 4, 8, 16, 32, 64):
        m = (rm & sbit) != 0
        out = [jnp.where(m, jnp.roll(x, sbit, axis=1), x) for x in out]
    return out


def _seg_matmul(contribs, dst, out_rows):
    """Cross-row merge: one-hot segment matmul on the MXU.

    ``contribs`` are (main, wrap) pairs of f32 (R, 128) arrays whose rows
    hold lane-rotated, masked row payloads; ``dst`` (R, 128, broadcast) is
    each source row's destination row (wrap goes to dst+1).  Returns one
    (out_rows, 128) f32 array per pair.  Every output element receives at
    most one nonzero contribution, so f32 accumulation is exact.
    """
    R = dst.shape[0]
    ocols = max(out_rows, _LANES)
    o = jax.lax.broadcasted_iota(jnp.int32, (R, ocols), 1)
    d = jnp.broadcast_to(jax.lax.slice(dst, (0, 0), (R, 1)), (R, ocols))
    h_main = (o == d).astype(jnp.float32)
    h_wrap = (o == d + 1).astype(jnp.float32)
    dims = (((0,), (0,)), ((), ()))
    # HIGHEST: the MXU's default bf16 single-pass rounds 16-bit integer
    # halves (7-bit mantissa); the bf16x3 decomposition is exact for the
    # <2^24 integer domain here (verified: default precision corrupts
    # real-chip archives, interpret mode hides it)
    prec = jax.lax.Precision.HIGHEST
    outs = []
    for main, wrap in contribs:
        acc = jax.lax.dot_general(h_main, main, dims, precision=prec,
                                  preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(h_wrap, wrap, dims, precision=prec,
                                        preferred_element_type=jnp.float32)
        outs.append(acc[:out_rows] if ocols == out_rows else
                    jax.lax.slice(acc, (0, 0), (out_rows, _LANES)))
    return outs


def _compact_rows(keep, vals, out_rows):
    """Tile-level compaction of ``vals`` under ``keep`` into (out_rows, 128)
    i32 arrays (butterfly rows -> per-row rotation -> segment matmul).

    Values may exceed 2^24: they are split into 16-bit halves before the
    f32 matmul and recombined after.  Entries beyond the tile's kept count
    are exactly zero.
    """
    R = keep.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    c = jnp.sum(keep.astype(jnp.int32), axis=1, keepdims=True)     # (R,1)
    f = _row_prefix_excl(c)                                        # (R,128)
    packed = _butterfly_multi(keep, vals)
    rho = f & 127
    dst = f >> 7
    rotated = _var_lane_rot(packed, rho)
    cb = jnp.broadcast_to(c, (R, _LANES))
    main_m = (lane >= rho) & (lane < rho + cb)
    wrap_m = lane < rho + cb - _LANES
    pairs = []
    for x in rotated:
        for part in (x & 0xFFFF, (x >> 16) & 0xFFFF):
            pf = part.astype(jnp.float32)
            pairs.append((jnp.where(main_m, pf, 0.0),
                          jnp.where(wrap_m, pf, 0.0)))
    merged = _seg_matmul(pairs, dst, out_rows)
    return [merged[2 * i].astype(jnp.int32)
            | (merged[2 * i + 1].astype(jnp.int32) << 16)
            for i in range(len(rotated))]


def _make_emit_kernel(seq_type: int, stage: str = "full"):
    """``stage`` < 'full' early-outs after that phase (perf attribution via
    tools/emit_kernel_variants.py; production always passes 'full')."""
    classify = F._make_fasta_kernel(seq_type)

    def kernel(sc_ref, x_ref, sv_ref, cnts_ref, tv_ref, a_ref,
               flags_scr, sval_scr, ccarry, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[_C_CUMS] = 0
            carry[_C_CUMSEQ] = 0
            carry[_C_EOLBASE] = 0
            carry[_C_LONG] = 0
            carry[_C_ENC] = _NEGBIG
            carry[_C_FLOW] = 0
            carry[_C_FSVAL] = 0

        # --- phase 1: the production classify kernel, verbatim (its
        # sequence-tile fast path skips the transition-monoid scan, which
        # measures ~20x slower than the fast path when run branchlessly) ---
        classify(sc_ref, x_ref, flags_scr, sval_scr, ccarry)

        R = _ROWS
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)
        lpos = row * _LANES + lane

        # --- phase 2 (unbranched): masks from the flag bits ---
        f = flags_scr[:].astype(jnp.int32)
        sval = sval_scr[:].astype(jnp.int32)
        marker = (f & 1) != 0
        seq_unex = (f & 2) != 0
        seq_keep = (f & 4) != 0
        is_eol = (f & 8) != 0
        id_keep = (f & 16) != 0
        id_unex = (f & 32) != 0
        in_com = (f & 64) != 0
        com_unex = (f & 128) != 0
        stream_keep = seq_keep | id_unex

        if stage == "classify":
            sv_ref[:] = sval.astype(jnp.uint8)
            return

        # --- prefix coordinates: two sum scans + two max scans (a 16-bit
        # packed pair would wrap at a full 64 KiB tile of kept bytes) ---
        cum_stream = _hs_sum(stream_keep.astype(jnp.int32)) + carry[_C_CUMS]
        cum_seq = _hs_sum(seq_keep.astype(jnp.int32)) + carry[_C_CUMSEQ]

        lower = stream_keep & (sval >= 96)
        enc = jnp.where(stream_keep,
                        2 * lpos + lower.astype(jnp.int32), _NEGBIG)
        menc = _hs_max(enc)
        menc_x = _shift1_rowmajor(menc, carry[_C_ENC])
        has_prev = menc_x >= -2
        prev_lower = (menc_x & 1) == 1
        chg = stream_keep & has_prev & (lower != prev_lower)
        last_enc = _extract(menc, R - 1, _LANES - 1)
        carry[_C_ENC] = jnp.where(last_enc >= 0, -2 + (last_enc & 1),
                                  carry[_C_ENC])

        # longest line (kept seq chars between EOLs; ops.scan counterpart
        # longest_line_block)
        aincl = _hs_max(jnp.where(is_eol, cum_seq, _NEGBIG))
        aexcl = _shift1_rowmajor(aincl, carry[_C_EOLBASE])
        # bytes before the tile's first EOL measure from the carried base
        # (cum_seq at the block's last EOL so far; 0 at block start)
        base = jnp.maximum(aexcl, carry[_C_EOLBASE])
        line = jnp.where(is_eol, cum_seq - base, 0)
        tile_long = jnp.max(line)
        carry[_C_LONG] = jnp.maximum(carry[_C_LONG], tile_long)
        last_a = _extract(aincl, R - 1, _LANES - 1)
        carry[_C_EOLBASE] = jnp.maximum(carry[_C_EOLBASE],
                                        jnp.maximum(last_a, 0))
        cum_seq_end = _extract(cum_seq, R - 1, _LANES - 1)
        cum_stream_end = _extract(cum_stream, R - 1, _LANES - 1)

        # first kept byte of the block: case + value (for nibble parity)
        cnt_tile = cum_stream_end - carry[_C_CUMS]
        pmin = jnp.min(jnp.where(stream_keep, lpos, jnp.int32(1 << 30)))
        at_first = stream_keep & (lpos == pmin)
        first_low = jnp.sum(jnp.where(at_first, lower.astype(jnp.int32), 0))
        first_sv = jnp.sum(jnp.where(at_first, sval, 0))
        need_first = jnp.logical_and(carry[_C_FLOW] == 0, cnt_tile > 0)
        carry[_C_FLOW] = jnp.where(need_first, 1 + first_low, carry[_C_FLOW])
        carry[_C_FSVAL] = jnp.where(need_first, first_sv, carry[_C_FSVAL])

        if stage == "scans":
            sv_ref[:] = (sval ^ (menc & 1) ^ (aincl & 1)).astype(jnp.uint8)
            return

        # --- dense stream compaction (butterfly + segment matmul) ---
        sv_out = _compact_rows(stream_keep, [sval], _ROWS)[0]
        sv_ref[:] = sv_out.astype(jnp.uint8)

        if stage == "dense":
            return

        # --- sparse tagged side stream ---
        keep_sp = id_keep | in_com | marker | chg
        tag = jnp.where(marker, TAG_REC,
                        jnp.where(chg, TAG_CHG,
                                  jnp.where(in_com, TAG_COM, TAG_ID)))
        # id/com byte values: ids keep raw bytes (id_keep excludes unex),
        # comments replace unexpected; rec/chg entries carry coordinates
        # sval holds raw bytes at id/com positions (classify only replaces
        # id_unex/seq_unex); comments replace their unexpected bytes here
        spval = jnp.where(id_keep | in_com,
                          jnp.where(com_unex, C.REPLACEMENT_NAME, sval), 0)
        tv = spval | (tag << 8)
        # rec: global kept-seq prefix before the marker (marker not kept ->
        # inclusive == exclusive); chg: index in the compacted stream
        aval = jnp.where(marker, cum_seq,
                         jnp.where(chg, cum_stream - 1, 0))
        tv_c, a_c = _compact_rows(keep_sp, [tv, aval], _CS_ROWS)
        tv_ref[:] = tv_c
        a_ref[:] = a_c

        # --- per-tile counts row ---
        n_sp = jnp.sum(keep_sp.astype(jnp.int32))
        scalars = [
            (LANE_CNT, cnt_tile),
            (LANE_SEQ, cum_seq_end - carry[_C_CUMSEQ]),
            (LANE_NSP, n_sp),
            (LANE_UID, jnp.sum(id_unex.astype(jnp.int32))),
            (LANE_UCOM, jnp.sum(com_unex.astype(jnp.int32))),
            (LANE_USEQ, jnp.sum(seq_unex.astype(jnp.int32))),
            (LANE_LONG, carry[_C_LONG]),
            (LANE_OPEN, cum_seq_end - carry[_C_EOLBASE]),
            (LANE_FLOW, carry[_C_FLOW]),
            (LANE_FSVAL, carry[_C_FSVAL]),
        ]
        # (8, 128) block: Mosaic requires >=8 sublanes; consumers read row 0
        crow = jnp.zeros((8, _LANES), jnp.int32)
        l1 = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
        for k, v in scalars:
            crow = jnp.where(l1 == k, v, crow)
        cnts_ref[:] = crow

        carry[_C_CUMS] = cum_stream_end
        carry[_C_CUMSEQ] = cum_seq_end

    return kernel


@lazy_jit(static_argnames=("seq_type", "interpret"))
def emit_fasta_tiles(block, prev_byte, starts_in_seq=False, *,
                     seq_type: int = C.SEQ_TYPE_DNA, interpret: bool = False):
    """u8[B] -> per-tile fused emit outputs.

    Returns (sv u8[gR,128] tile-compacted stream values, counts i32[g,128],
    tv i32[g*CS,128] tagged sparse values, a i32[g*CS,128] coordinates).
    ``prev_byte``/``starts_in_seq`` as ops.scan_fused.classify_fasta_fused.
    """
    B = block.shape[0]
    pad = (-B) % _TILE
    x = block
    if pad:
        x = jnp.concatenate([x, jnp.full(pad, 0x0A, jnp.uint8)])
    g = x.shape[0] // _TILE
    x2 = x.reshape(g * _ROWS, _LANES)

    st0 = jnp.where(jnp.asarray(starts_in_seq), _SEQ, _ID)
    pe0 = jnp.asarray(T.IS_EOL)[prev_byte.astype(jnp.int32)]
    scalars = jnp.stack([st0.astype(jnp.int32), pe0.astype(jnp.int32)])

    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((8, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((_CS_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    sv, cnts, tv, a = pl.pallas_call(
        _make_emit_kernel(seq_type),
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_shape=(jax.ShapeDtypeStruct((g * _ROWS, _LANES), jnp.uint8),
                   jax.ShapeDtypeStruct((g * 8, _LANES), jnp.int32),
                   jax.ShapeDtypeStruct((g * _CS_ROWS, _LANES), jnp.int32),
                   jax.ShapeDtypeStruct((g * _CS_ROWS, _LANES), jnp.int32)),
        out_specs=(spec, cspec, sspec, sspec),
        scratch_shapes=[pltpu.VMEM((_ROWS, _LANES), jnp.uint8),
                        pltpu.VMEM((_ROWS, _LANES), jnp.uint8),
                        pltpu.SMEM((2,), jnp.int32),
                        pltpu.SMEM((_NCARRY,), jnp.int32)],
        interpret=interpret,
    )(scalars, x2)
    return sv, cnts.reshape(g, 8, _LANES)[:, 0, :], tv, a


@lazy_jit(static_argnames=("seq_type", "interpret"))
def emit_fasta_fused(block, prev_byte, starts_in_seq=False, *,
                     seq_type: int = C.SEQ_TYPE_DNA, interpret: bool = False):
    """Fused single-pass FASTA emit for one block.

    Returns a dict of device arrays:
      sv u8[B']   block-compacted stream values (B' = B rounded up to tiles;
                  entries >= cnt are zero)
      cnt, cnt_seq, n_sp, unex_id/com/seq, longest, first_lower (0 none /
                  1 upper / 2 lower), first_sval — i32 scalars
      sp_tv, sp_a i32[g*CS_CAP] merged sparse stream (tight occupancy n_sp)
      sp_ok       bool: no tile overflowed the sparse cap
    """
    sv_t, cnts, tv_t, a_t = emit_fasta_tiles(
        block, prev_byte, starts_in_seq, seq_type=seq_type,
        interpret=interpret)
    g = cnts.shape[0]

    c_t = cnts[:, LANE_CNT]
    offs = jnp.cumsum(c_t) - c_t
    sv_tiles = sv_t.reshape(g, _TILE)

    def body(i, acc):
        return jax.lax.dynamic_update_slice(acc, sv_tiles[i], (offs[i],))
    sv = jax.lax.fori_loop(0, g, body, jnp.zeros(g * _TILE, jnp.uint8))
    cnt = jnp.sum(c_t)
    idx = jnp.arange(g * _TILE, dtype=jnp.int32)
    sv = jnp.where(idx < cnt, sv, 0)

    n_t = cnts[:, LANE_NSP]
    sp_ok = jnp.all(n_t <= _CS_CAP)
    soffs = jnp.cumsum(n_t) - n_t
    tv_tiles = tv_t.reshape(g, _CS_CAP)
    a_tiles = a_t.reshape(g, _CS_CAP)

    def sbody(i, accs):
        atv, aa = accs
        return (jax.lax.dynamic_update_slice(atv, tv_tiles[i], (soffs[i],)),
                jax.lax.dynamic_update_slice(aa, a_tiles[i], (soffs[i],)))
    sp_tv, sp_a = jax.lax.fori_loop(
        0, g, sbody, (jnp.zeros(g * _CS_CAP, jnp.int32),
                      jnp.zeros(g * _CS_CAP, jnp.int32)))
    n_sp = jnp.sum(jnp.minimum(n_t, _CS_CAP))
    sidx = jnp.arange(g * _CS_CAP, dtype=jnp.int32)
    sp_tv = jnp.where(sidx < n_sp, sp_tv, 0)
    sp_a = jnp.where(sidx < n_sp, sp_a, 0)

    return dict(
        sv=sv, cnt=cnt, cnt_seq=jnp.sum(cnts[:, LANE_SEQ]),
        n_sp=n_sp, sp_ok=sp_ok,
        unex_id=jnp.sum(cnts[:, LANE_UID]),
        unex_com=jnp.sum(cnts[:, LANE_UCOM]),
        unex_seq=jnp.sum(cnts[:, LANE_USEQ]),
        longest=jnp.maximum(cnts[g - 1, LANE_LONG], cnts[g - 1, LANE_OPEN]),
        first_lower=cnts[g - 1, LANE_FLOW],
        first_sval=cnts[g - 1, LANE_FSVAL],
        sp_tv=sp_tv, sp_a=sp_a,
    )


# ---------------------------------------------------------------------------
# FASTQ variant: same single-pass design; ids are DENSE here (headers are a
# fixed fraction of every record, far past the sparse cap), so the kernel
# runs three dense butterfly+matmul compactions (stream, quality, ids) and
# keeps the tagged sparse channel for record boundaries, mask-run changes,
# and the rare comment bytes.  Record entries carry THREE coordinates
# (kept-seq / kept-qual / kept-id prefixes) so every per-record length is
# host diff arithmetic.  Reference counterpart: the FASTQ parse/append
# loops of ennaf/src/process.c:358-476.
# ---------------------------------------------------------------------------

#: FASTQ tiles are half-height: three dense compactions + a four-array
#: sparse channel exceed the 16 MiB scoped-VMEM budget at 512 rows
_ROWS_Q = int(_os.environ.get("NAF_TPU_EMIT_FASTQ_ROWS", "256"))
_TILE_Q = _ROWS_Q * _LANES

LANE_QUAL, LANE_ID, LANE_UQUAL = 10, 11, 12
_CQ_CUMQ, _CQ_CUMID = 7, 8
_NCARRY_Q = 9


def _make_emit_fastq_kernel(seq_type: int):
    classify = F._make_fastq_kernel(seq_type)

    def kernel(sc_ref, x_ref, sv_ref, qv_ref, iv_ref, cnts_ref, tv_ref,
               a_ref, b_ref, c_ref, flags_scr, sval_scr, ccarry, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[_C_CUMS] = 0
            carry[_C_CUMSEQ] = 0
            carry[_C_EOLBASE] = 0
            carry[_C_LONG] = 0
            carry[_C_ENC] = _NEGBIG
            carry[_C_FLOW] = 0
            carry[_C_FSVAL] = 0
            carry[_CQ_CUMQ] = 0
            carry[_CQ_CUMID] = 0

        classify(sc_ref, x_ref, flags_scr, sval_scr, ccarry)

        R = _ROWS_Q
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)
        lpos = row * _LANES + lane

        f = flags_scr[:].astype(jnp.int32)
        sval = sval_scr[:].astype(jnp.int32)
        rec_start = (f & 1) != 0
        seq_unex = (f & 2) != 0
        seq_keep = (f & 4) != 0
        is_eol = (f & 8) != 0
        b45 = (f & 16) != 0
        b5 = (f & 32) != 0
        in_com = (f & 64) != 0
        qual_line = (f & 128) != 0
        id_keep = b45 & ~qual_line
        qual_keep = b45 & qual_line
        id_unex = b5 & ~in_com & ~qual_line
        com_unex = b5 & in_com
        qual_unex = b5 & qual_line
        stream_keep = seq_keep | id_unex

        cum_stream = _hs_sum(stream_keep.astype(jnp.int32)) + carry[_C_CUMS]
        cum_seq = _hs_sum(seq_keep.astype(jnp.int32)) + carry[_C_CUMSEQ]
        cum_qual = _hs_sum(qual_keep.astype(jnp.int32)) + carry[_CQ_CUMQ]
        cum_id = _hs_sum(id_keep.astype(jnp.int32)) + carry[_CQ_CUMID]

        lower = stream_keep & (sval >= 96)
        enc = jnp.where(stream_keep,
                        2 * lpos + lower.astype(jnp.int32), _NEGBIG)
        menc = _hs_max(enc)
        menc_x = _shift1_rowmajor(menc, carry[_C_ENC])
        has_prev = menc_x >= -2
        prev_lower = (menc_x & 1) == 1
        chg = stream_keep & has_prev & (lower != prev_lower)
        last_enc = _extract(menc, R - 1, _LANES - 1)
        carry[_C_ENC] = jnp.where(last_enc >= 0, -2 + (last_enc & 1),
                                  carry[_C_ENC])

        aincl = _hs_max(jnp.where(is_eol, cum_seq, _NEGBIG))
        aexcl = _shift1_rowmajor(aincl, carry[_C_EOLBASE])
        base = jnp.maximum(aexcl, carry[_C_EOLBASE])
        line = jnp.where(is_eol, cum_seq - base, 0)
        carry[_C_LONG] = jnp.maximum(carry[_C_LONG], jnp.max(line))
        last_a = _extract(aincl, R - 1, _LANES - 1)
        carry[_C_EOLBASE] = jnp.maximum(carry[_C_EOLBASE],
                                        jnp.maximum(last_a, 0))
        cum_seq_end = _extract(cum_seq, R - 1, _LANES - 1)
        cum_stream_end = _extract(cum_stream, R - 1, _LANES - 1)
        cum_qual_end = _extract(cum_qual, R - 1, _LANES - 1)
        cum_id_end = _extract(cum_id, R - 1, _LANES - 1)

        cnt_tile = cum_stream_end - carry[_C_CUMS]
        pmin = jnp.min(jnp.where(stream_keep, lpos, jnp.int32(1 << 30)))
        at_first = stream_keep & (lpos == pmin)
        first_low = jnp.sum(jnp.where(at_first, lower.astype(jnp.int32), 0))
        first_sv = jnp.sum(jnp.where(at_first, sval, 0))
        need_first = jnp.logical_and(carry[_C_FLOW] == 0, cnt_tile > 0)
        carry[_C_FLOW] = jnp.where(need_first, 1 + first_low, carry[_C_FLOW])
        carry[_C_FSVAL] = jnp.where(need_first, first_sv, carry[_C_FSVAL])

        sv_ref[:] = _compact_rows(stream_keep, [sval],
                                  _ROWS_Q)[0].astype(jnp.uint8)
        qv_ref[:] = _compact_rows(qual_keep, [sval],
                                  _ROWS_Q)[0].astype(jnp.uint8)
        iv_ref[:] = _compact_rows(id_keep, [sval],
                                  _ROWS_Q)[0].astype(jnp.uint8)

        keep_sp = in_com | rec_start | chg
        tag = jnp.where(rec_start, TAG_REC,
                        jnp.where(chg, TAG_CHG, TAG_COM))
        spval = jnp.where(in_com,
                          jnp.where(com_unex, C.REPLACEMENT_NAME, sval), 0)
        tv = spval | (tag << 8)
        aval = jnp.where(rec_start, cum_seq,
                         jnp.where(chg, cum_stream - 1, 0))
        # rec_start is the '@' byte: not counted in any stream, so the
        # inclusive prefixes here ARE the exclusive boundary coordinates
        bval = jnp.where(rec_start, cum_qual, 0)
        cval = jnp.where(rec_start, cum_id, 0)
        tv_c, a_c, b_c, c_c = _compact_rows(keep_sp, [tv, aval, bval, cval],
                                            _CS_ROWS)
        tv_ref[:] = tv_c
        a_ref[:] = a_c
        b_ref[:] = b_c
        c_ref[:] = c_c

        n_sp = jnp.sum(keep_sp.astype(jnp.int32))
        scalars = [
            (LANE_CNT, cnt_tile),
            (LANE_SEQ, cum_seq_end - carry[_C_CUMSEQ]),
            (LANE_NSP, n_sp),
            (LANE_UID, jnp.sum(id_unex.astype(jnp.int32))),
            (LANE_UCOM, jnp.sum(com_unex.astype(jnp.int32))),
            (LANE_USEQ, jnp.sum(seq_unex.astype(jnp.int32))),
            (LANE_LONG, carry[_C_LONG]),
            (LANE_OPEN, cum_seq_end - carry[_C_EOLBASE]),
            (LANE_FLOW, carry[_C_FLOW]),
            (LANE_FSVAL, carry[_C_FSVAL]),
            (LANE_QUAL, cum_qual_end - carry[_CQ_CUMQ]),
            (LANE_ID, cum_id_end - carry[_CQ_CUMID]),
            (LANE_UQUAL, jnp.sum(qual_unex.astype(jnp.int32))),
        ]
        crow = jnp.zeros((8, _LANES), jnp.int32)
        l1 = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
        for k, v in scalars:
            crow = jnp.where(l1 == k, v, crow)
        cnts_ref[:] = crow

        carry[_C_CUMS] = cum_stream_end
        carry[_C_CUMSEQ] = cum_seq_end
        carry[_CQ_CUMQ] = cum_qual_end
        carry[_CQ_CUMID] = cum_id_end

    return kernel


@lazy_jit(static_argnames=("seq_type", "interpret"))
def emit_fastq_tiles(block, prev_byte, *, seq_type: int = C.SEQ_TYPE_DNA,
                     interpret: bool = False):
    """u8[B] -> per-tile fused FASTQ emit outputs (see the kernel)."""
    B = block.shape[0]
    pad = (-B) % _TILE_Q
    x = block
    if pad:
        x = jnp.concatenate([x, jnp.full(pad, 0x0A, jnp.uint8)])
    g = x.shape[0] // _TILE_Q
    x2 = x.reshape(g * _ROWS_Q, _LANES)

    pe0 = jnp.asarray(T.IS_EOL)[prev_byte.astype(jnp.int32)]
    scalars = jnp.stack([jnp.int32(_ID), pe0.astype(jnp.int32),
                         jnp.int32(0)])

    spec = pl.BlockSpec((_ROWS_Q, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((8, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((_CS_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    u8t = jax.ShapeDtypeStruct((g * _ROWS_Q, _LANES), jnp.uint8)
    i32s = jax.ShapeDtypeStruct((g * _CS_ROWS, _LANES), jnp.int32)
    sv, qv, iv, cnts, tv, a, b, c = pl.pallas_call(
        _make_emit_fastq_kernel(seq_type),
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_shape=(u8t, u8t, u8t,
                   jax.ShapeDtypeStruct((g * 8, _LANES), jnp.int32),
                   i32s, i32s, i32s, i32s),
        out_specs=(spec, spec, spec, cspec, sspec, sspec, sspec, sspec),
        scratch_shapes=[pltpu.VMEM((_ROWS_Q, _LANES), jnp.uint8),
                        pltpu.VMEM((_ROWS_Q, _LANES), jnp.uint8),
                        pltpu.SMEM((3,), jnp.int32),
                        pltpu.SMEM((_NCARRY_Q,), jnp.int32)],
        interpret=interpret,
    )(scalars, x2)
    return (sv, qv, iv, cnts.reshape(g, 8, _LANES)[:, 0, :], tv, a, b, c)


@lazy_jit(static_argnames=("seq_type", "interpret"))
def emit_fastq_fused(block, prev_byte, *, seq_type: int = C.SEQ_TYPE_DNA,
                     interpret: bool = False):
    """Fused single-pass FASTQ emit for one block (dict of device arrays;
    sv/qv/iv are block-compacted stream/quality/id values, sp_* the merged
    tagged sparse channel with three record coordinates)."""
    sv_t, qv_t, iv_t, cnts, tv_t, a_t, b_t, c_t = emit_fastq_tiles(
        block, prev_byte, seq_type=seq_type, interpret=interpret)
    g = cnts.shape[0]

    def merge_u8(tiles2d, counts):
        offs = jnp.cumsum(counts) - counts
        tiles = tiles2d.reshape(g, _TILE_Q)

        def body(i, acc):
            return jax.lax.dynamic_update_slice(acc, tiles[i], (offs[i],))
        out = jax.lax.fori_loop(0, g, body,
                                jnp.zeros(g * _TILE_Q, jnp.uint8))
        total = jnp.sum(counts)
        idx = jnp.arange(g * _TILE_Q, dtype=jnp.int32)
        return jnp.where(idx < total, out, 0), total

    sv, cnt = merge_u8(sv_t, cnts[:, LANE_CNT])
    qv, cnt_q = merge_u8(qv_t, cnts[:, LANE_QUAL])
    iv, cnt_i = merge_u8(iv_t, cnts[:, LANE_ID])

    n_t = cnts[:, LANE_NSP]
    sp_ok = jnp.all(n_t <= _CS_CAP)
    soffs = jnp.cumsum(n_t) - n_t
    sp = []
    for t2 in (tv_t, a_t, b_t, c_t):
        tiles = t2.reshape(g, _CS_CAP)

        def sbody(i, acc, tiles=tiles):
            return jax.lax.dynamic_update_slice(acc, tiles[i], (soffs[i],))
        sp.append(jax.lax.fori_loop(0, g, sbody,
                                    jnp.zeros(g * _CS_CAP, jnp.int32)))
    n_sp = jnp.sum(jnp.minimum(n_t, _CS_CAP))
    sidx = jnp.arange(g * _CS_CAP, dtype=jnp.int32)
    sp = [jnp.where(sidx < n_sp, x, 0) for x in sp]

    return dict(
        sv=sv, qv=qv, iv=iv, cnt=cnt, cnt_seq=jnp.sum(cnts[:, LANE_SEQ]),
        cnt_qual=cnt_q, cnt_id=cnt_i, n_sp=n_sp, sp_ok=sp_ok,
        unex_id=jnp.sum(cnts[:, LANE_UID]),
        unex_com=jnp.sum(cnts[:, LANE_UCOM]),
        unex_seq=jnp.sum(cnts[:, LANE_USEQ]),
        unex_qual=jnp.sum(cnts[:, LANE_UQUAL]),
        longest=jnp.maximum(cnts[g - 1, LANE_LONG], cnts[g - 1, LANE_OPEN]),
        first_lower=cnts[g - 1, LANE_FLOW],
        first_sval=cnts[g - 1, LANE_FSVAL],
        sp_tv=sp[0], sp_a=sp[1], sp_b=sp[2], sp_c=sp[3],
    )


# ---------------------------------------------------------------------------
# Mask-parity application (decode render prep): chars + 32 * (prefix XOR of
# span toggles).  The XLA formulation (i32 toggle scatter + prefix sum +
# add) moves ~18 bytes of HBM per output byte; this kernel reads the char
# and toggle streams once and writes the cased chars — ~3 B/B.
# Reference counterpart: unnaf/src/output.c:295-322 mask_dna_buffer.
# ---------------------------------------------------------------------------

def _maskapply_kernel(ch_ref, tg_ref, out_ref, carry):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[0] = 0

    R = ch_ref.shape[0]
    cum = _hs_sum(tg_ref[:].astype(jnp.int32)) + carry[0]
    out_ref[:] = (ch_ref[:].astype(jnp.int32)
                  + 32 * (cum & 1)).astype(jnp.uint8)
    carry[0] = _extract(cum, R - 1, _LANES - 1)


@lazy_jit(static_argnames=("interpret",))
def apply_mask_parity_pallas(chars, tog, interpret: bool = False):
    """u8 chars + u8 span toggles -> cased chars (+32 inside masked spans)."""
    n = chars.shape[0]
    pad = (-n) % _TILE
    c, t = chars, tog
    if pad:
        c = jnp.concatenate([c, jnp.zeros(pad, jnp.uint8)])
        t = jnp.concatenate([t, jnp.zeros(pad, jnp.uint8)])
    g = c.shape[0] // _TILE
    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _maskapply_kernel,
        grid=(g,),
        in_specs=[spec, spec],
        out_shape=jax.ShapeDtypeStruct((g * _ROWS, _LANES), jnp.uint8),
        out_specs=spec,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(c.reshape(g * _ROWS, _LANES), t.reshape(g * _ROWS, _LANES))
    return out.reshape(-1)[:n]
