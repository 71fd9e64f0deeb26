"""Block-parallel encode step over a device mesh (shard_map).

The distributed design (greenfield — the reference is single-threaded;
SURVEY.md §2.4):

  * the host reader splits the input byte stream into fixed-size blocks
    aligned to record starts ('>' markers), sharded over the mesh's
    `blocks` axis;
  * every device scans its block (ops.scan), compacts the sequence stream,
    and 4-bit packs it — all local VPU work, no communication;
  * the only cross-device traffic is O(1) per block: an `all_gather` of
    per-block char counts (to compute nibble-parity offsets) and `psum`s of
    the unexpected-char histograms and line-length max — these ride ICI;
  * the packed payloads return to host sharded; the host stitches boundary
    nibbles (one OR per block edge) and streams them into the zstd section
    writer.

The same step serves sequence parallelism: a single giant record spanning
all blocks works because the carry state (parity nibble, mask runs) is
associative across block boundaries.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..format import constants as C
from ..ops import scan as S
from .mesh import BLOCK_AXIS


def _device_block_fn(block, prev_byte, *, seq_type: int):
    """Per-device work: scan + compact + pack one block. Runs inside shard_map.

    block: u8[1, B] (this device's slice), prev_byte: u8[1].
    """
    b = block[0]
    s = S.scan_fasta_block(b, prev_byte[0], seq_type=seq_type)
    seq, count = S.compact(s["stream_keep"], s["stream_val"])

    # nibble-parity alignment: this block's first char pairs with the last
    # char of the previous blocks iff the prefix char count is odd
    counts = jax.lax.all_gather(count, BLOCK_AXIS)              # i32[D]
    my = jax.lax.axis_index(BLOCK_AXIS)
    prefix = jnp.sum(jnp.where(jnp.arange(counts.shape[0]) < my, counts, 0))
    odd = (prefix % 2) == 1
    # when odd, pack chars[1:] and emit chars[0]'s code separately
    shifted = jnp.where(odd, jnp.roll(seq, -1), seq)
    packed = S.pack_even(shifted)
    first_code = jnp.take(jnp.take(S.T.NUC_CODE, seq.astype(jnp.int32)), 0)

    is_lower = (seq >= 96) & (jnp.arange(seq.shape[0]) < count)

    hist_seq = jax.lax.psum(s["hist_seq"], BLOCK_AXIS)
    hist_id = jax.lax.psum(s["hist_id"], BLOCK_AXIS)
    hist_comment = jax.lax.psum(s["hist_comment"], BLOCK_AXIS)
    longest = jax.lax.pmax(
        S.longest_line_block(s["seq_keep"], s["is_eol"]), BLOCK_AXIS
    )

    n_rec = jax.lax.psum(jnp.sum(s["rec_start"].astype(jnp.int32)), BLOCK_AXIS)

    return (
        packed[None], count[None], first_code[None], odd[None],
        is_lower[None], s["region"][None].astype(jnp.uint8),
        s["rec_start"][None],
        hist_seq[None], hist_id[None], hist_comment[None],
        longest[None], n_rec[None],
    )


@functools.partial(jax.jit, static_argnames=("seq_type", "mesh"))
def encode_blocks_sharded(blocks: jnp.ndarray, prev_bytes: jnp.ndarray, *,
                          seq_type: int = C.SEQ_TYPE_DNA, mesh: Mesh):
    """blocks: u8[D, B] sharded over the mesh; prev_bytes: u8[D].

    Returns per-block packed payloads + counts + carry info + reductions.
    """
    fn = shard_map(
        functools.partial(_device_block_fn, seq_type=seq_type),
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=(
            P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS),
            P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS),
            P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS),
            P(BLOCK_AXIS), P(BLOCK_AXIS),
        ),
    )
    return fn(blocks, prev_bytes)


@dataclass
class ShardedEncodeResult:
    packed: np.ndarray       # u8[D, B/2] per-block packed (even-aligned)
    counts: np.ndarray       # i32[D] chars per block
    first_codes: np.ndarray  # u8[D] first char's 4-bit code per block
    odd: np.ndarray          # bool[D] block started at odd nibble offset
    is_lower: np.ndarray     # bool[D, B]
    region: np.ndarray       # u8[D, B]
    rec_start: np.ndarray    # bool[D, B]
    hist_seq: np.ndarray
    hist_id: np.ndarray
    hist_comment: np.ndarray
    longest_line: int
    n_records_after_first: int


def stitch_packed(res: ShardedEncodeResult) -> np.ndarray:
    """Merge per-block even-aligned payloads into one nibble stream.

    For a block whose prefix parity is odd, its first char's code was left
    out of its packed payload; it belongs in the high nibble of the previous
    byte of the stream.  That is one OR per block edge on host.
    """
    pieces: list[np.ndarray] = []
    total = 0
    pending_low: int | None = None
    for d in range(res.counts.shape[0]):
        cnt = int(res.counts[d])
        if cnt == 0:
            continue
        odd = (total % 2) == 1
        if odd:
            assert pending_low is not None
            pieces.append(np.asarray(
                [pending_low | (int(res.first_codes[d]) << 4)], dtype=np.uint8))
            pending_low = None
            packed_chars = cnt - 1
        else:
            packed_chars = cnt
        nbytes = packed_chars // 2
        body = res.packed[d, :nbytes]
        pieces.append(np.ascontiguousarray(body))
        if packed_chars % 2:
            pending_low = int(res.packed[d, nbytes]) & 0x0F
        total += cnt
    if pending_low is not None:
        pieces.append(np.asarray([pending_low], dtype=np.uint8))
    if not pieces:
        return np.zeros(0, dtype=np.uint8)
    return np.concatenate(pieces)


def make_blocks(data: np.ndarray, n_blocks: int) -> tuple[np.ndarray, np.ndarray]:
    """Split bytes (already past the first '>') into record-aligned blocks.

    Returns (blocks u8[n_blocks, B], prev_bytes u8[n_blocks]).  Block 0's
    prev byte is '>' (scan starts after the first marker); later blocks
    start exactly at a '>' marker, so their prev byte is the EOL before it.
    Blocks are padded with '\n' (EOL padding parses as empty lines).
    """
    n = data.size
    if n == 0:
        blocks = np.full((n_blocks, 2), ord("\n"), dtype=np.uint8)
        prev = np.full(n_blocks, ord("\n"), dtype=np.uint8)
        prev[0] = ord(">")
        return blocks, prev

    # candidate split points: '>' preceded by EOL
    is_eol = C.IS_EOL[:256][data]
    rec_start = np.zeros(n, dtype=bool)
    rec_start[1:] = (data[1:] == ord(">")) & is_eol[:-1]
    starts = np.flatnonzero(rec_start)

    targets = (np.arange(1, n_blocks) * n) // n_blocks
    idx = np.searchsorted(starts, targets)
    cuts = [0]
    for i in idx:
        cut = int(starts[i]) if i < starts.size else n
        if cut > cuts[-1]:
            cuts.append(cut)
    while len(cuts) < n_blocks + 1:
        cuts.append(n)
    cuts = cuts[: n_blocks + 1]
    cuts[-1] = n

    B = max(max(e - s for s, e in zip(cuts[:-1], cuts[1:])), 2)
    B += B % 2
    blocks = np.full((n_blocks, B), ord("\n"), dtype=np.uint8)
    prev = np.full(n_blocks, ord("\n"), dtype=np.uint8)
    prev[0] = ord(">")
    for k, (s, e) in enumerate(zip(cuts[:-1], cuts[1:])):
        blocks[k, : e - s] = data[s:e]
        if k > 0 and s > 0:
            prev[k] = data[s - 1]
    return blocks, prev
