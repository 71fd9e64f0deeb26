"""Fused Pallas FASTA/FASTQ byte-classify kernel — the scan data plane.

One VMEM pass replaces the XLA-op formulation in ``ops.scan`` (which
materializes dozens of n-sized i32 intermediates in HBM and ran 1.39 GB/s
on v5e): each grid step loads one (ROWS, 128) u8 tile, classifies every
byte in registers, and stores exactly two bytes per input byte — the
replaced stream value and a bit-packed flag byte.  Sequential carry state
(parser state, prev-byte-is-EOL) rides an SMEM scratch across grid steps;
TPU grids execute in order on a core, so the scan composes across tiles.

The FASTA region tracker is a 3-state machine (ID / COMMENT / SEQ) whose
per-byte transition depends only on the byte's class:

    marker ('>' after EOL)  ->  const ID      (the byte itself is region 0)
    EOL                     ->  const SEQ     (header line ends)
    space (non-EOL)         ->  ID->COMMENT, else unchanged
    other                   ->  unchanged

Transitions compose associatively as 6-bit maps (2 bits per input state),
so the within-tile scan is a Hillis-Steele compose over lanes then rows —
pure VPU shifts/selects, no gathers.  Tiles whose carry state is SEQ and
which contain no '>' byte take a fast path that skips the state machine
entirely (sequence tiles dominate real FASTA).

Flag bit layout (u8, one per byte):
    bit0 rec_start   bit1 seq_unex   bit2 seq_keep   bit3 is_eol
    bit4 id_keep     bit5 id_unex    bit6 com_keep   bit7 com_unex

Reference hot-loop counterpart: ennaf/src/process.c:258-311 in_get_until /
str_append_char byte scan and tables.c:28-197 char classes.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.lazy import LazyModule, lazy_jit

jax = LazyModule("jax")
jnp = LazyModule("jax.numpy")
pl = LazyModule("jax.experimental.pallas")
pltpu = LazyModule("jax.experimental.pallas.tpu")

from ..format import constants as C
from . import tables as T

_GT = ord(">")
_LANES = 128
import os as _os
_ROWS = int(_os.environ.get("NAF_TPU_SCAN_ROWS", "512"))   # tile rows (x128 B)
_TILE = _ROWS * _LANES

# parser states
_ID, _COM, _SEQ = 0, 1, 2
# The transition monoid is closed over just FIVE elements, encoded 0..4:
#   0 = identity           (ordinary byte)
#   1 = s                  (space: ID->COMMENT, else unchanged)
#   2 = const ID           (marker byte)
#   3 = const COMMENT      (s after a marker)
#   4 = const SEQ          (EOL)
# compose(later, earlier) and apply(map, state) are then tiny select chains
# (7 and 6 VPU ops) — a 4x cheaper scan than generic 2-bit-map composition,
# which matters twice: the Hillis-Steele runs 16 steps per tile, and a
# leaner slow branch keeps Mosaic's whole-kernel schedule/regalloc from
# dragging the fast branch down (measured: a heavyweight never-executed
# branch cost the fast path 3.5x).
_M_IDENT, _M_SPACE, _M_CID, _M_CCOM, _M_CSEQ = 0, 1, 2, 3, 4


_WORDS_CACHE: dict = {}


def _bool_words(tab) -> np.ndarray:
    """numpy bool[256+] -> u32[8] bit-packed (cached per table id)."""
    key = id(tab)
    w = _WORDS_CACHE.get(key)
    if w is None:
        t = np.asarray(tab[:256], bool)
        w = np.zeros(8, np.uint32)
        for c in np.flatnonzero(t):
            w[c >> 5] |= np.uint32(1) << (int(c) & 31)
        _WORDS_CACHE[key] = w
    return w


def _lut_bool_small(b, tab):
    """256-entry bool LUT on an i32 byte tensor: 8-way word select + bit
    test (VPU-only; gathers measure ~0.1 GB/s on v5e).  Words ride i32
    (bit-reinterpreted u32); arithmetic right shift + &1 still extracts
    every bit, including bit 31, correctly."""
    w8 = _bool_words(tab).view(np.int32)
    h = b >> 5
    w = jnp.full(b.shape, int(w8[0]), jnp.int32)
    for k in range(1, 8):
        w = jnp.where(h == k, jnp.int32(int(w8[k])), w)
    return ((w >> (b & 31)) & 1) != 0


def _extract(x, r: int, l: int):
    """Scalar at static position [r, l] of a traced 2-D tile (as a 1x1
    slice reduce — Mosaic-friendly, no vector->scalar extract op)."""
    return jnp.sum(jax.lax.slice(x, (r, l), (r + 1, l + 1)))


def _apply_map(m, k):
    """Apply monoid elements `m` (0..4) to state vector `k` (0..2)."""
    return jnp.where(m >= 2, m - 2,
                     jnp.where((m == 1) & (k == _ID), _COM, k))


def _compose(later, earlier):
    """Monoid composition c = later ∘ earlier (earlier applied first).

    A constant absorbs everything before it; s turns const-ID into
    const-COMMENT and is idempotent over id/s.
    """
    return jnp.where(later >= 2, later,
                     jnp.where(later == 0, earlier,
                               jnp.where(earlier >= 2,
                                         jnp.maximum(earlier, 3), 1)))


def _shift1_rowmajor(x, first):
    """Shift a (R, 128) i32 tile by one byte in row-major order; `first`
    (scalar) fills position [0, 0]."""
    R = x.shape[0]
    sh = jnp.roll(x, 1, axis=1)
    last_col = jax.lax.slice(x, (0, _LANES - 1), (R, _LANES))   # (R, 1)
    prev_rows = jnp.roll(last_col, 1, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    prev_rows = jnp.where(row == 0, first, prev_rows)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    return jnp.where(lane == 0, jnp.broadcast_to(prev_rows, (R, _LANES)), sh)


def _make_fasta_kernel(seq_type: int):
    unex_seq_tab = T.UNEXPECTED_BY_TYPE[seq_type]
    repl = C.REPLACEMENT_SEQ[seq_type]

    def kernel(sc_ref, x_ref, flags_ref, sval_ref, carry):
        i = pl.program_id(0)
        _ROWS = x_ref.shape[0]            # shape-generic: emit kernels
                                          # reuse this body at other tiles

        @pl.when(i == 0)
        def _():
            carry[0] = sc_ref[0]          # parser state before byte 0
            carry[1] = sc_ref[1]          # prev byte is EOL

        b = x_ref[:].astype(jnp.int32)
        is_eol = (b >= 0x0A) & (b <= 0x0D)
        is_sp = is_eol | (b == 0x09) | (b == 0x20)
        e = is_eol.astype(jnp.int32)
        st0 = carry[0]

        unex_seq_b = _lut_bool_small(b, unex_seq_tab)

        has_marker = jnp.any(b == _GT)
        fast = jnp.logical_and(st0 == _SEQ, jnp.logical_not(has_marker))

        @pl.when(fast)
        def _():
            seq_keep = ~is_sp
            seq_unex = seq_keep & unex_seq_b
            flags = (seq_unex.astype(jnp.int32) << 1
                     | seq_keep.astype(jnp.int32) << 2
                     | e << 3)
            flags_ref[:] = flags.astype(jnp.uint8)
            sval_ref[:] = jnp.where(seq_keep & unex_seq_b, repl,
                                    b).astype(jnp.uint8)

        @pl.when(jnp.logical_not(fast))
        def _():
            pe = _shift1_rowmajor(e, carry[1]) != 0
            marker = (b == _GT) & pe
            space_nc = is_sp & ~is_eol
            m = jnp.where(marker, _M_CID,
                          jnp.where(is_eol, _M_CSEQ,
                                    jnp.where(space_nc, _M_SPACE, _M_IDENT)))
            lane = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)
            row2 = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 0)
            p = m
            for s in (1, 2, 4, 8, 16, 32, 64):
                sh = jnp.roll(p, s, axis=1)
                sh = jnp.where(lane >= s, sh, _M_IDENT)
                p = _compose(p, sh)
            # row-carry: compose-scan of row totals, broadcast along lanes
            t = jnp.broadcast_to(
                jax.lax.slice(p, (0, _LANES - 1), (_ROWS, _LANES)),
                (_ROWS, _LANES))
            s = 1
            while s < _ROWS:
                shq = jnp.roll(t, s, axis=0)
                shq = jnp.where(row2 >= s, shq, _M_IDENT)
                t = _compose(t, shq)
                s *= 2
            rc = jnp.roll(t, 1, axis=0)
            rc = jnp.where(row2 == 0, _M_IDENT, rc)
            pfx = _compose(p, rc)                   # inclusive prefix maps
            state = _apply_map(pfx, st0)            # state AFTER each byte
            sb = _shift1_rowmajor(state, st0)       # state BEFORE each byte

            in_id = ~marker & (sb == _ID) & ~is_sp
            in_com = ~marker & (sb == _COM) & ~is_eol
            in_seq = ~marker & (sb == _SEQ)
            # a marker byte resets the line: bytes on the marker's line
            # before any space are id, after are comment — sb of the byte
            # right after a marker is ID via the map, so no extra handling
            unex_text_b = _lut_bool_small(b, T.IS_UNEXPECTED_TEXT)
            unex_com_b = _lut_bool_small(b, T.IS_UNEXPECTED_COMMENT)

            id_unex = in_id & unex_text_b
            id_keep = in_id & ~unex_text_b
            com_unex = in_com & unex_com_b
            seq_keep = in_seq & ~is_sp
            seq_unex = seq_keep & unex_seq_b

            flags = (marker.astype(jnp.int32)
                     | seq_unex.astype(jnp.int32) << 1
                     | seq_keep.astype(jnp.int32) << 2
                     | e << 3
                     | id_keep.astype(jnp.int32) << 4
                     | id_unex.astype(jnp.int32) << 5
                     | in_com.astype(jnp.int32) << 6
                     | com_unex.astype(jnp.int32) << 7)
            flags_ref[:] = flags.astype(jnp.uint8)
            sval_ref[:] = jnp.where(
                id_unex, C.REPLACEMENT_NAME,
                jnp.where(seq_unex, repl, b)).astype(jnp.uint8)
            carry[0] = _extract(state, _ROWS - 1, _LANES - 1)

        # fast path leaves state == SEQ; slow path wrote it above
        carry[1] = _extract(e, _ROWS - 1, _LANES - 1)

    return kernel


@lazy_jit(static_argnames=("seq_type", "interpret"))
def classify_fasta_fused(block, prev_byte, starts_in_seq=False, *,
                         seq_type: int = C.SEQ_TYPE_DNA,
                         interpret: bool = False):
    """u8[B] -> (flags u8[B], stream_val u8[B]) via the fused kernel.

    ``prev_byte``/``starts_in_seq`` follow ops.scan.scan_fasta_block: the
    byte before the block ('>' for the very first block) and whether the
    block was cut mid-record (sequence-parallel continuation).
    """
    B = block.shape[0]
    pad = (-B) % _TILE
    x = block
    if pad:
        # LF padding is inert: in-seq it stays in-seq, in-header it closes
        # the header — and padded positions are sliced off anyway
        x = jnp.concatenate([x, jnp.full(pad, 0x0A, jnp.uint8)])
    g = x.shape[0] // _TILE
    x2 = x.reshape(g * _ROWS, _LANES)

    st0 = jnp.where(jnp.asarray(starts_in_seq), _SEQ, _ID)
    pe0 = jnp.asarray(T.IS_EOL)[prev_byte.astype(jnp.int32)]
    scalars = jnp.stack([st0.astype(jnp.int32),
                         pe0.astype(jnp.int32)])

    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    flags, sval = pl.pallas_call(
        _make_fasta_kernel(seq_type),
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_shape=(jax.ShapeDtypeStruct((g * _ROWS, _LANES), jnp.uint8),
                   jax.ShapeDtypeStruct((g * _ROWS, _LANES), jnp.uint8)),
        out_specs=(spec, spec),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(scalars, x2)
    return flags.reshape(-1)[:B], sval.reshape(-1)[:B]


_NEGBIG = -(1 << 30)


def _make_scan_kernel(op: str):
    """Inclusive 1-D prefix scan (add/max) over an i32 stream: lane+row
    Hillis-Steele per tile, SMEM carry across the sequential grid.

    The XLA formulations (MXU tril-matmul cumsum, lane-shift max-scan in
    ops.scan) measure ~0.4 GB/s on v5e and dominated BOTH sharded passes
    (stats 211 ms / emit 237 ms of a 16 MB block); this kernel runs at
    VPU speed with one extra i32 stream of output.
    """
    add = op == "add"
    ident = 0 if add else _NEGBIG

    def comb(a, b):
        return a + b if add else jnp.maximum(a, b)

    def kernel(x_ref, o_ref, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[0] = ident

        x = x_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 0)
        p = x
        for s in (1, 2, 4, 8, 16, 32, 64):
            sh = jnp.roll(p, s, axis=1)
            p = comb(p, jnp.where(lane >= s, sh, ident))
        t = jnp.broadcast_to(
            jax.lax.slice(p, (0, _LANES - 1), (_ROWS, _LANES)),
            (_ROWS, _LANES))
        s = 1
        while s < _ROWS:
            sh = jnp.roll(t, s, axis=0)
            t = comb(t, jnp.where(row >= s, sh, ident))
            s *= 2
        rc = jnp.roll(t, 1, axis=0)
        rc = jnp.where(row == 0, ident, rc)
        out = comb(comb(p, rc), jnp.full((_ROWS, _LANES), 1, jnp.int32)
                   * carry[0])
        o_ref[:] = out
        carry[0] = _extract(out, _ROWS - 1, _LANES - 1)

    return kernel


def _scan_1d(x, op: str, interpret: bool = False):
    n = x.shape[0]
    ident = 0 if op == "add" else _NEGBIG
    pad = (-n) % _TILE
    if pad:
        x = jnp.concatenate([x, jnp.full(pad, ident, jnp.int32)])
    g = x.shape[0] // _TILE
    x2 = x.reshape(g * _ROWS, _LANES)
    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_scan_kernel(op),
        grid=(g,),
        in_specs=[spec],
        out_shape=jax.ShapeDtypeStruct((g * _ROWS, _LANES), jnp.int32),
        out_specs=spec,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(x2)
    return out.reshape(-1)[:n]


@lazy_jit(static_argnames=("interpret",))
def cumsum_i32_pallas(x, interpret: bool = False):
    """Inclusive prefix sum of an i32 (or castable) 1-D array."""
    return _scan_1d(x.astype(jnp.int32), "add", interpret)


@lazy_jit(static_argnames=("interpret",))
def maxscan_i32_pallas(x, interpret: bool = False):
    """Inclusive prefix max of an i32 1-D array."""
    return _scan_1d(x.astype(jnp.int32), "max", interpret)


def _make_fastq_kernel(seq_type: int):
    """Fused FASTQ classify: lane = (#LFs so far) % 4 via a sum-scan, and
    the header id/comment split via the same transition monoid as FASTA
    (EOL resets to const-ID for the next line's header; the sub-state is
    don't-care off lane 0).  Preconditions as ops.scan.scan_fastq_block:
    the validated regular 4-line LF grid, blocks cut at record starts.

    Flag bit layout (u8) — lane-0 and lane-3 reuse bits 4/5, separated by
    bit 7: bit0 rec_start, bit1 seq_unex, bit2 seq_keep, bit3 is_eol,
    bit4 id_keep|qual_keep, bit5 id_unex|qual_unex|com_unex,
    bit6 com_keep, bit7 qual-line byte (lane 3, non-EOL).
    """
    unex_seq_tab = T.UNEXPECTED_BY_TYPE[seq_type]
    repl = C.REPLACEMENT_SEQ[seq_type]
    _AT = ord("@")

    def kernel(sc_ref, x_ref, flags_ref, sval_ref, carry):
        i = pl.program_id(0)
        _ROWS = x_ref.shape[0]            # shape-generic (see FASTA kernel)

        @pl.when(i == 0)
        def _():
            carry[0] = sc_ref[0]          # sub-state before byte 0 (ID)
            carry[1] = sc_ref[1]          # prev byte is LF
            carry[2] = sc_ref[2]          # lane of byte 0's line

        b = x_ref[:].astype(jnp.int32)
        is_lf = (b == 0x0A).astype(jnp.int32)
        is_eolc = (b >= 0x0A) & (b <= 0x0D)
        is_sp = is_eolc | (b == 0x09) | (b == 0x20)
        pe = _shift1_rowmajor(is_lf, carry[1]) != 0

        lane_ax = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)
        row_ax = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 0)

        # line id: inclusive LF count minus own-LF (the EOL byte belongs
        # to the line it terminates) — Hillis-Steele sum over lanes + rows
        c = is_lf
        for s in (1, 2, 4, 8, 16, 32, 64):
            sh = jnp.roll(c, s, axis=1)
            c = c + jnp.where(lane_ax >= s, sh, 0)
        t = jnp.broadcast_to(
            jax.lax.slice(c, (0, _LANES - 1), (_ROWS, _LANES)),
            (_ROWS, _LANES))
        s = 1
        while s < _ROWS:
            sh = jnp.roll(t, s, axis=0)
            t = t + jnp.where(row_ax >= s, sh, 0)
            s *= 2
        rc = jnp.roll(t, 1, axis=0)
        rc = jnp.where(row_ax == 0, 0, rc)
        cum_lf = c + rc                        # inclusive LF count
        lane = (cum_lf - is_lf + carry[2]) & 3

        rec_start = (b == _AT) & pe & (lane == 0)

        # header sub-state: {id, space, const-ID} monoid; EOL resets to ID
        space_nc = is_sp & ~is_eolc
        m = jnp.where(is_eolc, _M_CID,
                      jnp.where(space_nc, _M_SPACE, _M_IDENT))
        p = m
        for s in (1, 2, 4, 8, 16, 32, 64):
            sh = jnp.roll(p, s, axis=1)
            sh = jnp.where(lane_ax >= s, sh, _M_IDENT)
            p = _compose(p, sh)
        t2 = jnp.broadcast_to(
            jax.lax.slice(p, (0, _LANES - 1), (_ROWS, _LANES)),
            (_ROWS, _LANES))
        s = 1
        while s < _ROWS:
            sh = jnp.roll(t2, s, axis=0)
            sh = jnp.where(row_ax >= s, sh, _M_IDENT)
            t2 = _compose(t2, sh)
            s *= 2
        rc2 = jnp.roll(t2, 1, axis=0)
        rc2 = jnp.where(row_ax == 0, _M_IDENT, rc2)
        pfx = _compose(p, rc2)
        st0 = carry[0]
        state = _apply_map(pfx, st0)
        sb = _shift1_rowmajor(state, st0)

        in_hdr = (lane == 0) & ~rec_start & ~is_eolc
        in_id = in_hdr & (sb == _ID) & ~is_sp
        in_com = in_hdr & (sb == _COM)

        unex_text_b = _lut_bool_small(b, T.IS_UNEXPECTED_TEXT)
        unex_com_b = _lut_bool_small(b, T.IS_UNEXPECTED_COMMENT)
        unex_seq_b = _lut_bool_small(b, unex_seq_tab)
        unex_qual_b = _lut_bool_small(b, T.IS_UNEXPECTED_QUAL)

        id_unex = in_id & unex_text_b
        id_keep = in_id & ~unex_text_b
        com_unex = in_com & unex_com_b

        in_seq = (lane == 1) & ~is_eolc        # CR-free grid: ~LF suffices,
        seq_keep = in_seq & ~is_sp             # but is_eolc matches oracle
        seq_unex = seq_keep & unex_seq_b

        is_lf_b = is_lf != 0
        qual_line = (lane == 3) & ~is_lf_b
        qual_first = qual_line & pe
        qual_rest = qual_line & ~qual_first
        qual_unex = qual_rest & ~is_sp & unex_qual_b
        qual_keep = (qual_rest & ~is_sp) | qual_first

        flags = (rec_start.astype(jnp.int32)
                 | seq_unex.astype(jnp.int32) << 1
                 | seq_keep.astype(jnp.int32) << 2
                 | is_lf << 3
                 | (id_keep | qual_keep).astype(jnp.int32) << 4
                 | (id_unex | qual_unex | com_unex).astype(jnp.int32) << 5
                 | in_com.astype(jnp.int32) << 6
                 | qual_line.astype(jnp.int32) << 7)
        flags_ref[:] = flags.astype(jnp.uint8)
        sval_ref[:] = jnp.where(
            id_unex, C.REPLACEMENT_NAME,
            jnp.where(seq_unex, repl,
                      jnp.where(qual_unex, C.REPLACEMENT_QUAL,
                                b))).astype(jnp.uint8)

        carry[0] = _extract(state, _ROWS - 1, _LANES - 1)
        carry[1] = _extract(is_lf, _ROWS - 1, _LANES - 1)
        carry[2] = (carry[2] + _extract(cum_lf, _ROWS - 1, _LANES - 1)) & 3

    return kernel


@lazy_jit(static_argnames=("seq_type", "interpret"))
def classify_fastq_fused(block, prev_byte, *, seq_type: int = C.SEQ_TYPE_DNA,
                         interpret: bool = False):
    """u8[B] -> (flags u8[B], stream/qual values u8[B]); see the kernel."""
    B = block.shape[0]
    pad = (-B) % _TILE
    x = block
    if pad:
        x = jnp.concatenate([x, jnp.full(pad, 0x0A, jnp.uint8)])
    g = x.shape[0] // _TILE
    x2 = x.reshape(g * _ROWS, _LANES)
    pe0 = jnp.asarray(T.IS_EOL)[prev_byte.astype(jnp.int32)]
    scalars = jnp.stack([jnp.int32(_ID), pe0.astype(jnp.int32),
                         jnp.int32(0)])
    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    flags, sval = pl.pallas_call(
        _make_fastq_kernel(seq_type),
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_shape=(jax.ShapeDtypeStruct((g * _ROWS, _LANES), jnp.uint8),
                   jax.ShapeDtypeStruct((g * _ROWS, _LANES), jnp.uint8)),
        out_specs=(spec, spec),
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
        interpret=interpret,
    )(scalars, x2)
    return flags.reshape(-1)[:B], sval.reshape(-1)[:B]


def scan_fastq_fused(block, prev_byte, seq_type: int = C.SEQ_TYPE_DNA, *,
                     interpret: bool = False) -> dict:
    """Drop-in for ops.scan.scan_fastq_block built on the fused kernel."""
    from . import scan as S

    flags, sval = classify_fastq_fused(block, prev_byte, seq_type=seq_type,
                                       interpret=interpret)
    f = flags.astype(jnp.int32)
    rec_start = (f & 1) != 0
    seq_unex = (f & 2) != 0
    seq_keep = (f & 4) != 0
    is_eol = (f & 8) != 0
    b45 = (f & 16) != 0
    b5 = (f & 32) != 0
    com_keep = (f & 64) != 0
    is_qual = (f & 128) != 0
    id_keep = b45 & ~is_qual
    qual_keep = b45 & is_qual
    id_unex = b5 & ~com_keep & ~is_qual
    com_unex = b5 & com_keep
    qual_unex = b5 & is_qual
    return dict(
        rec_start=rec_start,
        stream_keep=seq_keep | id_unex,
        stream_val=jnp.where(qual_unex, block, sval),
        seq_keep=seq_keep,
        is_eol=is_eol,
        id_keep=id_keep,
        id_unex=id_unex,
        com_keep=com_keep,
        com_unex=com_unex,
        com_val=jnp.where(com_unex, jnp.uint8(C.REPLACEMENT_NAME), block),
        qual_keep=qual_keep,
        qual_unex=qual_unex,
        qual_val=jnp.where(qual_unex, jnp.uint8(C.REPLACEMENT_QUAL), block),
        hist_id=S._hist_cond(id_unex, block),
        hist_comment=S._hist_cond(com_unex, block),
        hist_seq=S._hist_cond(seq_unex, block),
        hist_qual=S._hist_cond(qual_unex, block),
    )


def scan_fasta_fused(block, prev_byte, seq_type: int = C.SEQ_TYPE_DNA,
                     starts_in_seq=False, *, interpret: bool = False) -> dict:
    """Drop-in for ops.scan.scan_fasta_block built on the fused kernel.

    Returns the same dict minus 'region'/'rec_id' (unused by the block
    pipeline); every other key is bit-exact with the XLA formulation
    (tests/test_scan_fused.py fuzzes the equivalence).
    """
    from . import scan as S

    flags, sval = classify_fasta_fused(
        block, prev_byte, starts_in_seq, seq_type=seq_type,
        interpret=interpret)
    f = flags.astype(jnp.int32)
    rec_start = (f & 1) != 0
    seq_unex = (f & 2) != 0
    seq_keep = (f & 4) != 0
    is_eol = (f & 8) != 0
    id_keep = (f & 16) != 0
    id_unex = (f & 32) != 0
    com_keep = (f & 64) != 0
    com_unex = (f & 128) != 0
    return dict(
        rec_start=rec_start,
        stream_keep=seq_keep | seq_unex | id_unex,
        stream_val=sval,
        seq_keep=seq_keep | seq_unex,
        is_eol=is_eol,
        id_keep=id_keep,
        id_unex=id_unex,
        com_keep=com_keep,
        com_unex=com_unex,
        com_val=jnp.where(com_unex, jnp.uint8(C.REPLACEMENT_NAME), block),
        hist_id=S._hist_cond(id_unex, block),
        hist_comment=S._hist_cond(com_unex, block),
        hist_seq=S._hist_cond(seq_unex, block),
    )
