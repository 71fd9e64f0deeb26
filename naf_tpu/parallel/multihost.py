"""Multi-host (multi-process) sharded encode.

Runs the same two-pass device block-encode as ``pipeline.encode_sharded``,
but over a *global* mesh spanning every process started under
``jax.distributed.initialize`` (a TPU pod slice, or multi-process CPU in
tests).  Each process feeds only the block shards its addressable devices
own; the collectives inside pass 1 (psum histograms, pmax line length,
all_gather counts) ride ICI/DCN; pass 2's *compacted* per-block payloads
are gathered with ``multihost_utils.process_allgather`` — O(payload)
traffic, never per-input-byte metadata — and stitched with the same carry
algebra as the single-process path, so the archive is byte-identical to
``encoder.encode`` on one host.

For production-scale archives, ``encode_multihost_extended`` goes further:
every host zstd-compresses its own blocks and ships only the compressed
frames to process 0 (the extended blocked format, O(compressed) traffic).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..format import constants as C
from ..pipeline import parser as P
from ..pipeline.encoder import EncodeOptions, EncodeStats
from .mesh import BLOCK_AXIS


def _gather_rows(garr, D: int):
    """Gather a [D, ...] global array's rows to every process, in order.

    Robust to uneven/multi-row/reordered shards: every shard travels with
    its explicit (start, length) span, and full coverage is asserted.
    """
    from jax.experimental import multihost_utils

    shards = sorted(garr.addressable_shards, key=lambda s: s.index[0].start)
    starts = [int(s.index[0].start) for s in shards]
    lens = [int(s.data.shape[0]) for s in shards]
    local = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    spans = np.asarray([starts, lens])                     # (2, n_shards)
    all_spans = multihost_utils.process_allgather(spans)   # (P, 2, n_shards)
    all_val = multihost_utils.process_allgather(local)     # (P, rows, ...)
    out = np.empty((D,) + local.shape[1:], local.dtype)
    seen = np.zeros(D, bool)
    for p in range(all_spans.shape[0]):
        off = 0
        for start, ln in zip(all_spans[p, 0], all_spans[p, 1]):
            start, ln = int(start), int(ln)
            out[start:start + ln] = all_val[p, off:off + ln]
            seen[start:start + ln] = True
            off += ln
    assert seen.all(), "gather missed block rows"
    return out


def encode_multihost(data: bytes, opts: Optional[EncodeOptions] = None
                     ) -> tuple[bytes, EncodeStats]:
    """Collective: every process calls with the same input bytes.

    Returns the archive (identical on every process).
    """
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

    from .block import make_blocks, make_blocks_fastq
    from . import pipeline as PL

    opts = opts or EncodeOptions()
    fmt, marker = P.detect_format(data)
    if opts.seq_type > C.SEQ_TYPE_RNA or opts.strict or opts.well_formed:
        raise ValueError("multihost path currently covers nucleotide inputs")

    devices = jax.devices()
    D = len(devices)
    mesh = Mesh(np.asarray(devices), (BLOCK_AXIS,))
    sharding = NamedSharding(mesh, PS(BLOCK_AXIS))

    fastq = fmt == C.IN_FORMAT_FASTQ
    body = np.frombuffer(data, np.uint8)[marker + 1:]
    if fastq:
        mb = make_blocks_fastq(body, D)
        if mb is None:
            raise ValueError("multihost FASTQ path needs the regular 4-line grid")
        blocks, _ = mb
    else:
        blocks = make_blocks(body, D)

    def to_global(arr):
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])

    blocks_d = to_global(blocks.data)
    prev_d = to_global(blocks.prev)
    sis_d = to_global(blocks.starts_in_seq)

    from .block import emit_blocks_sharded, stats_blocks_sharded

    st = stats_blocks_sharded(blocks_d, prev_d, sis_d,
                              seq_type=opts.seq_type, fastq=fastq, mesh=mesh)
    st_np = [_gather_rows(o, D) for o in st]
    (counts, odd, id_bytes, com_bytes, qual_bytes, n_rec, n_runs,
     first_lower, longest) = st_np[:9]
    hists = st_np[9:]

    p_cap = PL._bucket(int((counts + 1).max(initial=2) // 2) + 1)
    id_cap = PL._bucket(max(int(id_bytes.max(initial=1)), 1))
    com_cap = PL._bucket(max(int(com_bytes.max(initial=1)), 1))
    r_cap = PL._bucket(int(n_rec.max(initial=0)) + 1)
    m_cap = PL._bucket(max(int(n_runs.max(initial=2)), 2))
    q_cap = PL._bucket(max(int(qual_bytes.max(initial=1)), 1)) if fastq else 16

    em = emit_blocks_sharded(
        blocks_d, prev_d, sis_d, st[1],
        seq_type=opts.seq_type, fastq=fastq, mesh=mesh,
        p_cap=p_cap, id_cap=id_cap, com_cap=com_cap, r_cap=r_cap,
        m_cap=m_cap, q_cap=q_cap)
    em_np = [_gather_rows(o, D) for o in em]

    return PL._stitch_and_build(
        D, fmt, opts, counts, id_bytes, com_bytes, qual_bytes, n_rec,
        n_runs, first_lower, longest, hists, em_np,
        fallback=lambda: (_ for _ in ()).throw(
            P.InputError("quality/sequence length mismatch")))
