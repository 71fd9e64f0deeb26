"""Device-side vectorized FASTA token scan.

The same array program as pipeline/parser.py (the host oracle), expressed in
jnp with static shapes so it jits and shards: record markers via a
prev-is-EOL test, region intervals via searchsorted over EOL/space positions
(using size=-bounded nonzero), per-byte classification via LUT gathers, and
compaction via cumsum + scatter.

This is the per-block data plane of the distributed pipeline
(naf_tpu/parallel/block.py): each device scans its own block (blocks are
split at record boundaries by the host reader), so no cross-device
communication is needed during the scan itself; only the tiny carry state
(nibble parity, mask-run, histograms) is exchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.jaxenv import setup_jax

setup_jax()   # persistent compile cache (remote TPU compiles are expensive)

from ..format import constants as C
from . import tables as T

_GT = ord(">")

#: MXU scan chunk width (the systolic array's native tile)
_MXU = 128


def _mm_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix-sum of an i32 vector via lower-triangular matmuls.

    The TPU compiler's time on ``cumsum``/``associative_scan`` over a giant
    1-D axis grows super-linearly (1-D scans lower to log-n levels of
    stride-2 lane relayouts; measured 150 s+ to compile at 2^20 and
    effectively unbounded at 2^26).  The MXU formulation is compile-flat
    (~1-3 s at every size) AND runs on the systolic array: chunk prefixes
    are one [C,128] @ tril(128,128) matmul, the per-chunk carry recurses on
    the 128x-smaller totals vector, and tiny tails use the plain cumsum.
    """
    n = x.shape[0]
    if n <= 8192 or n % _MXU:
        return jnp.cumsum(x)
    C = n // _MXU
    y = x.reshape(C, _MXU)
    tri = jnp.tril(jnp.ones((_MXU, _MXU), jnp.int32))
    within = y @ tri.T                        # [C, 128] prefix within chunks
    totals = within[:, -1]
    carry = _mm_cumsum(totals) - totals       # exclusive carry per chunk
    return (within + carry[:, None]).reshape(n)


def _cumsum_i32(mask) -> jnp.ndarray:
    return _mm_cumsum(mask.astype(jnp.int32))


def _prev_true_pos(flag: jnp.ndarray, pos: jnp.ndarray,
                   cum: jnp.ndarray) -> jnp.ndarray:
    """Per byte: position of the last ``flag`` byte at/before it, -1 before
    the first.  ``cum`` is the inclusive prefix count of ``flag``.

    Max-scan replacement: scatter the k-th flag position into a table at
    k, gather back by count — scatter/gather compile flat on TPU where the
    max-scan's lane relayouts do not.
    """
    n = flag.shape[0]
    tab = jnp.full(n + 2, -1, jnp.int32).at[
        jnp.where(flag, cum, n + 1)
    ].set(pos, mode="drop")                   # tab[k] = pos of k-th (1-based)
    return tab[cum]                           # cum==0 -> tab[0] == -1


def _next_true_pos(flag: jnp.ndarray, pos: jnp.ndarray,
                   cum: jnp.ndarray) -> jnp.ndarray:
    """Per byte: position of the first ``flag`` byte at/after it, B past the
    last (min-reverse-scan replacement; same scatter/gather scheme)."""
    n = flag.shape[0]
    tab = jnp.full(n + 1, n, jnp.int32).at[
        jnp.where(flag, cum - 1, n)
    ].set(pos, mode="drop")                   # tab[k] = pos of k-th (0-based)
    before = cum - flag.astype(jnp.int32)     # flags strictly before pos
    return tab[before]                        # before == total -> n


@functools.partial(jax.jit, static_argnames=("seq_type",))
def scan_fasta_block(block: jnp.ndarray, prev_byte: jnp.ndarray,
                     seq_type: int = C.SEQ_TYPE_DNA,
                     starts_in_seq=False) -> dict:
    """Classify every byte of a FASTA block (bytes after any leading '>').

    block: u8[B]; prev_byte: u8[] — the byte preceding the block ('>' for the
    very first block, since scan starts right after the first marker).
    starts_in_seq: traced bool — bytes before the block's first '>' marker
    are sequence data (the block was cut at a line boundary inside a record,
    the sequence-parallel case) instead of record-0 header bytes.

    Returns per-byte arrays (all length B):
      rec_start  bool  — '>' markers starting a new record
      region     i32   — 0 none/marker, 1 id, 2 comment, 3 sequence
      stream_keep bool — byte contributes to the sequence stream
      stream_val u8    — its value (after replacement)
      seq_keep   bool  — byte counted in its record's length
      is_eol     bool
      id_keep/id_unex/com_keep/com_unex bool — header classification
    plus 'hist_id', 'hist_comment', 'hist_seq' i32[256] unexpected counts.
    """
    B = block.shape[0]
    b = block
    is_eol = jnp.asarray(T.IS_EOL)[b.astype(jnp.int32)]
    is_space = jnp.asarray(T.IS_SPACE)[b.astype(jnp.int32)]

    prev_is_eol = jnp.concatenate(
        [jnp.asarray(T.IS_EOL)[prev_byte.astype(jnp.int32)].reshape(1), is_eol[:-1]]
    )
    rec_start = (b == _GT) & prev_is_eol

    # positions (padded with B) of markers / eols / spaces
    pos = jnp.arange(B, dtype=jnp.int32)

    # record id per byte (marker byte belongs to the record it starts)
    rec_id = _cumsum_i32(rec_start)

    # for each byte, the position of its record's marker ('-1' for record 0)
    rec_marker = _prev_true_pos(rec_start, pos, rec_id)

    # first EOL / space-class byte at/after each position
    next_eol_incl = _next_true_pos(is_eol, pos, _cumsum_i32(is_eol))
    next_space_incl = _next_true_pos(is_space, pos, _cumsum_i32(is_space))

    def at_or_b(arr, idx):
        # arr[idx] with idx possibly == B -> B
        safe = jnp.minimum(idx, B - 1)
        return jnp.where(idx >= B, B, arr[safe])

    # per byte: its record's header_end = first eol at/after marker+1,
    # id_end = first space at/after marker+1
    m1 = jnp.clip(rec_marker + 1, 0, B)
    header_end = at_or_b(next_eol_incl, m1)
    id_end = at_or_b(next_space_incl, m1)

    in_id = (pos >= m1) & (pos < id_end)
    in_comment = (pos > id_end) & (pos < header_end) & (id_end < header_end)
    in_seq = pos > header_end
    # sequence-parallel cut: bytes before the first in-block marker belong to
    # the previous block's open record's sequence, not to a record-0 header
    pre = (rec_marker < 0) & jnp.asarray(starts_in_seq)
    in_id = in_id & ~pre
    in_comment = in_comment & ~pre
    in_seq = in_seq | pre
    region = jnp.where(in_id, 1, jnp.where(in_comment, 2, jnp.where(in_seq, 3, 0)))
    region = jnp.where(rec_start, 0, region)

    unex_text = jnp.asarray(T.IS_UNEXPECTED_TEXT)[b.astype(jnp.int32)]
    unex_com = jnp.asarray(T.IS_UNEXPECTED_COMMENT)[b.astype(jnp.int32)]
    unex_seq_tab = jnp.asarray(T.UNEXPECTED_BY_TYPE[seq_type])
    unex_seq_b = unex_seq_tab[b.astype(jnp.int32)]
    if seq_type == C.SEQ_TYPE_TEXT:
        keep_gt = b == _GT
        unex_seq_b = unex_seq_b & ~keep_gt
    else:
        unex_seq_b = unex_seq_b

    id_unex = in_id & unex_text
    id_keep = in_id & ~unex_text
    com_unex = in_comment & unex_com
    com_keep = in_comment

    seq_keep = in_seq & ~is_space
    seq_unex = seq_keep & unex_seq_b
    repl = jnp.uint8(C.REPLACEMENT_SEQ[seq_type])
    seq_val = jnp.where(seq_unex, repl, b)

    stream_keep = seq_keep | id_unex
    stream_val = jnp.where(id_unex, jnp.uint8(C.REPLACEMENT_NAME), seq_val)

    def hist(mask):
        return jnp.zeros(256, jnp.int32).at[
            jnp.where(mask, b.astype(jnp.int32), 256)
        ].add(1, mode="drop")

    return dict(
        rec_start=rec_start,
        rec_id=rec_id,
        region=region,
        stream_keep=stream_keep,
        stream_val=stream_val,
        seq_keep=seq_keep,
        is_eol=is_eol,
        id_keep=id_keep,
        id_unex=id_unex,
        com_keep=com_keep,
        com_unex=com_unex,
        com_val=jnp.where(com_unex, jnp.uint8(C.REPLACEMENT_NAME), b),
        hist_id=hist(id_unex),
        hist_comment=hist(com_unex),
        hist_seq=hist(seq_unex),
    )


@functools.partial(jax.jit, static_argnames=("seq_type",))
def scan_fastq_block(block: jnp.ndarray, prev_byte: jnp.ndarray,
                     seq_type: int = C.SEQ_TYPE_DNA) -> dict:
    """Classify every byte of a regular-grid FASTQ block.

    Preconditions (validated by the host reader, parallel/block.py
    make_blocks_fastq): LF-only line ends, non-empty lines, strict 4-line
    records ('@header', seq, '+', qual), blocks cut at record starts, '\\n'
    padding.  block: u8[B]; prev_byte: u8[] ('@' for the very first block —
    its record-0 header starts at byte 0 with the marker stripped; an EOL
    otherwise).

    Parity target: the robust FASTQ parser (ennaf/src/process.c:477-544 and
    pipeline/parser.py _parse_fastq_lines): id to first space-class byte,
    comment to EOL, spaces dropped from seq/qual, unexpected chars replaced
    (seq by type table, qual by '!'), the FIRST byte of each quality line
    kept verbatim, unexpected id chars inject '?' into the sequence stream.
    """
    B = block.shape[0]
    b = block
    is_eol = b == jnp.uint8(ord("\n"))
    is_space = jnp.asarray(T.IS_SPACE)[b.astype(jnp.int32)]

    prev_is_eol = jnp.concatenate(
        [jnp.asarray(T.IS_EOL)[prev_byte.astype(jnp.int32)].reshape(1),
         is_eol[:-1]]
    )
    # byte's own line index (EOL byte belongs to the line it terminates)
    line_id = _cumsum_i32(is_eol) - is_eol.astype(jnp.int32)
    lane = line_id % 4          # 0 header, 1 seq, 2 '+', 3 qual

    rec_start = (b == jnp.uint8(ord("@"))) & prev_is_eol & (lane == 0)

    pos = jnp.arange(B, dtype=jnp.int32)
    rec_marker = _prev_true_pos(rec_start, pos, _cumsum_i32(rec_start))

    next_eol_incl = _next_true_pos(is_eol, pos, _cumsum_i32(is_eol))
    next_space_incl = _next_true_pos(is_space, pos, _cumsum_i32(is_space))

    def at_or_b(arr, idx):
        safe = jnp.minimum(idx, B - 1)
        return jnp.where(idx >= B, B, arr[safe])

    m1 = jnp.clip(rec_marker + 1, 0, B)
    header_end = at_or_b(next_eol_incl, m1)
    id_end = at_or_b(next_space_incl, m1)

    in_hdr = (lane == 0) & ~rec_start & ~is_eol
    in_id = in_hdr & (pos >= m1) & (pos < id_end)
    in_comment = in_hdr & (pos > id_end) & (pos < header_end) & (id_end < header_end)

    unex_text = jnp.asarray(T.IS_UNEXPECTED_TEXT)[b.astype(jnp.int32)]
    unex_com = jnp.asarray(T.IS_UNEXPECTED_COMMENT)[b.astype(jnp.int32)]
    unex_seq_b = jnp.asarray(T.UNEXPECTED_BY_TYPE[seq_type])[b.astype(jnp.int32)]
    unex_qual_b = jnp.asarray(T.IS_UNEXPECTED_QUAL)[b.astype(jnp.int32)]

    id_unex = in_id & unex_text
    id_keep = in_id & ~unex_text
    com_unex = in_comment & unex_com
    com_keep = in_comment

    in_seq = (lane == 1) & ~is_eol
    seq_keep = in_seq & ~is_space
    seq_unex = seq_keep & unex_seq_b
    repl = jnp.uint8(C.REPLACEMENT_SEQ[seq_type])
    seq_val = jnp.where(seq_unex, repl, b)

    qual_first = (lane == 3) & prev_is_eol & ~is_eol
    qual_rest = (lane == 3) & ~is_eol & ~qual_first
    qual_unex = qual_rest & ~is_space & unex_qual_b
    qual_keep = (qual_rest & ~is_space) | qual_first
    qual_val = jnp.where(qual_unex, jnp.uint8(C.REPLACEMENT_QUAL), b)

    stream_keep = seq_keep | id_unex
    stream_val = jnp.where(id_unex, jnp.uint8(C.REPLACEMENT_NAME), seq_val)

    def hist(mask):
        return jnp.zeros(256, jnp.int32).at[
            jnp.where(mask, b.astype(jnp.int32), 256)
        ].add(1, mode="drop")

    return dict(
        rec_start=rec_start,
        stream_keep=stream_keep,
        stream_val=stream_val,
        seq_keep=seq_keep,
        is_eol=is_eol,
        id_keep=id_keep,
        id_unex=id_unex,
        com_keep=com_keep,
        com_unex=com_unex,
        com_val=jnp.where(com_unex, jnp.uint8(C.REPLACEMENT_NAME), b),
        qual_keep=qual_keep,
        qual_unex=qual_unex,
        qual_val=qual_val,
        hist_id=hist(id_unex),
        hist_comment=hist(com_unex),
        hist_seq=hist(seq_unex),
        hist_qual=hist(qual_unex),
    )


@jax.jit
def compact(mask: jnp.ndarray, values: jnp.ndarray):
    """Stable compaction: kept values move to the front; returns (out, count).

    out has the same (static) length as values; positions >= count are zero.
    """
    idx = _cumsum_i32(mask) - 1
    B = values.shape[0]
    out = jnp.zeros(B, values.dtype).at[
        jnp.where(mask, idx, B)
    ].set(values, mode="drop")
    return out, jnp.sum(mask.astype(jnp.int32))


@jax.jit
def pack_even(seq_padded: jnp.ndarray) -> jnp.ndarray:
    """Pack a compacted (padded) char block at even alignment: u8[B] -> u8[B/2].

    Boundary nibbles across blocks are fixed up by the caller using the
    per-block counts (see parallel/block.py).
    """
    codes = jnp.take(T.NUC_CODE, seq_padded.astype(jnp.int32))
    return codes[0::2] | (codes[1::2] << 4)


@jax.jit
def longest_line_block(seq_keep: jnp.ndarray, is_eol: jnp.ndarray) -> jnp.ndarray:
    """Max kept-chars between EOLs within the block (line-length reduce)."""
    B = seq_keep.shape[0]
    line_id = _cumsum_i32(is_eol)
    counts = jnp.zeros(B + 1, jnp.int32).at[line_id].add(seq_keep.astype(jnp.int32))
    return jnp.max(counts)
