"""End-to-end sharded encode: bytes -> device mesh -> NAF archive.

This is the BASELINE north star: data-parallel sharded block compression
over a ``jax.sharding.Mesh``, merged into a spec-conformant archive that the
reference ``unnaf`` decodes.  Produces *byte-identical* archives to the host
pipeline (``naf_tpu.pipeline.encoder.encode``) because the two share
``build_archive``.

Division of labor:
  * device (shard_map over the ``blocks`` axis, see block.py): per-byte
    classification + replacement, sequence-stream compaction, 4-bit packing,
    unexpected-char histograms (psum), longest-line (pmax), record counting
    — all the per-byte work;
  * host: record-aligned block splitting, boundary stitching (nibble parity
    OR at block edges, mask-run carry), '\0'-terminated id/comment blob
    assembly, zstd section framing, container write.

Multi-host note: with ``jax.distributed`` initialized, the same step runs
with per-host input shards; the host-side gather becomes
``multihost_utils.process_allgather`` of the per-block byte counts and
payloads (O(compressed bytes) traffic to host 0 only).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..format import constants as C
from ..pipeline import parser as P
from ..pipeline.encoder import EncodeOptions, EncodeStats, build_archive
from .block import encode_blocks_sharded, make_blocks, stitch_packed


def _units_from_bool(lower: np.ndarray) -> np.ndarray:
    """Case-mask RLE units from a boolean is-lower vector.

    Same semantics as ops.mask.mask_units_from_bytes (initial state
    unmasked, 255-continuation, trailing run flushed).
    """
    n = lower.size
    if n == 0:
        return np.zeros(0, np.uint8)
    change = np.flatnonzero(lower[1:] != lower[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [n]])
    runs = (ends - starts).astype(np.int64)
    if lower[0]:
        runs = np.concatenate([[0], runs])   # leading masked run
    from ..ops.mask import runs_to_units

    return runs_to_units(runs)


def encode_sharded(data: bytes, opts: Optional[EncodeOptions] = None, *,
                   mesh=None, n_blocks: Optional[int] = None
                   ) -> tuple[bytes, EncodeStats]:
    """Sharded FASTA encode over a device mesh.

    Nucleotide FASTA runs the device pipeline; other inputs (FASTQ,
    protein/text, strict/well-formed modes) currently take the host path —
    same archive bytes either way.
    """
    import jax
    import jax.numpy as jnp

    from .mesh import block_mesh, block_sharding

    opts = opts or EncodeOptions()
    from ..pipeline.encoder import encode as host_encode

    fmt, marker = P.detect_format(data)
    if (opts.in_format != C.IN_FORMAT_UNKNOWN and fmt != C.IN_FORMAT_UNKNOWN
            and opts.in_format != fmt):
        raise P.InputError(
            "input format is different from format specified in the command line")

    device_path = (
        fmt == C.IN_FORMAT_FASTA
        and opts.seq_type <= C.SEQ_TYPE_RNA
        and not opts.strict and not opts.well_formed
    )
    if not device_path:
        return host_encode(data, opts)

    if mesh is None:
        mesh = block_mesh(n_blocks)
    D = mesh.devices.size

    body = np.frombuffer(data, np.uint8)[marker + 1:]
    blocks, prev = make_blocks(body, D)

    sharding = block_sharding(mesh)
    blocks_d = jax.device_put(jnp.asarray(blocks), sharding)
    prev_d = jax.device_put(jnp.asarray(prev), sharding)

    outs = encode_blocks_sharded(blocks_d, prev_d, seq_type=opts.seq_type,
                                 mesh=mesh)
    outs_np = [np.asarray(o) for o in outs]
    return _host_stitch(blocks, outs_np, opts, fmt)


def _host_stitch(blocks: np.ndarray, outs_np: list, opts: EncodeOptions,
                 fmt: int) -> tuple[bytes, EncodeStats]:
    """Boundary stitching + blob assembly + container from device outputs."""
    D = blocks.shape[0]
    (packed, counts, first_codes, odd, is_lower, region, rec_start,
     hist_seq, hist_id, hist_comment, longest, n_rec) = outs_np

    from .block import ShardedEncodeResult

    sres = ShardedEncodeResult(
        packed=packed, counts=counts, first_codes=first_codes, odd=odd,
        is_lower=is_lower, region=region, rec_start=rec_start,
        hist_seq=hist_seq[0], hist_id=hist_id[0], hist_comment=hist_comment[0],
        longest_line=int(longest[0]), n_records_after_first=int(n_rec[0]),
    )

    # ---- host stitching ---------------------------------------------------
    # flatten [D, B] device outputs; padding bytes ('\n') classify as
    # nothing, so flattening is equivalent to the unpadded byte stream
    flat_b = blocks.reshape(-1)
    flat_region = region.reshape(-1)
    flat_rec_start = rec_start.reshape(-1).astype(bool)
    n_rec_total = int(flat_rec_start.sum()) + 1
    flat_rec_id = np.cumsum(flat_rec_start.astype(np.int32))

    in_id = flat_region == 1
    in_com = flat_region == 2
    unex_text = C.IS_UNEXPECTED_TEXT[:256][flat_b]
    unex_com = C.IS_UNEXPECTED_COMMENT[:256][flat_b]
    id_keep = in_id & ~unex_text
    com_vals = np.where(in_com & unex_com, np.uint8(C.REPLACEMENT_NAME), flat_b)

    res = P.ParseResult()
    res.n_sequences = n_rec_total
    res.ids_blob = P._blob_with_terminators(flat_b, id_keep, flat_rec_id, n_rec_total)
    res.comments_blob = P._blob_with_terminators(com_vals, in_com, flat_rec_id, n_rec_total)

    is_space = C.IS_SPACE[:256][flat_b]
    seq_keep = (flat_region == 3) & ~is_space
    res.lengths = np.bincount(flat_rec_id[seq_keep],
                              minlength=n_rec_total).astype(np.uint64)
    res.longest_line = sres.longest_line

    # stream chars (for size + mask): per-block compacted is_lower
    lower_flat = np.concatenate(
        [is_lower[d, : int(counts[d])] for d in range(D)]
    ) if D else np.zeros(0, bool)
    res.seq = np.zeros(lower_flat.size, np.uint8)  # only .size is used (packed set)
    res.packed = stitch_packed(sres)
    store_mask = not opts.no_mask
    if store_mask:
        res.mask_units = _units_from_bool(lower_flat)

    h257 = np.zeros(257, np.uint64)
    res.unexpected_id = h257.copy(); res.unexpected_id[:256] = sres.hist_id
    res.unexpected_comment = h257.copy(); res.unexpected_comment[:256] = sres.hist_comment
    res.unexpected_seq = h257.copy(); res.unexpected_seq[:256] = sres.hist_seq

    stats = EncodeStats(
        n_sequences=res.n_sequences, longest_line=res.longest_line,
        seq_size_original=int(lower_flat.size),
        unexpected_id=res.unexpected_id,
        unexpected_comment=res.unexpected_comment,
        unexpected_seq=res.unexpected_seq,
        unexpected_qual=np.zeros(257, np.uint64),
        in_format=fmt,
    )
    return build_archive(res, opts, stats)
