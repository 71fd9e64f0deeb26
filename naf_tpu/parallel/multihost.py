"""Multi-host (multi-process) sharded encode.

Runs the same device block-encode step as ``pipeline.encode_sharded``, but
over a *global* mesh spanning every process started under
``jax.distributed.initialize`` (a TPU pod slice, or multi-process CPU in
tests).  Each process feeds only the block shards its addressable devices
own; the collectives inside the step (psum histograms, pmax line length,
all_gather counts) ride ICI/DCN; the per-block outputs are then gathered to
every host with ``multihost_utils.process_allgather`` and stitched with the
same carry algebra as the single-process path — so the archive is
byte-identical to ``encoder.encode`` on one host.

Traffic note: this demonstration path gathers the *uncompressed* per-block
outputs (O(input) over DCN); the production-scale optimization is the
extended format with char-aligned blocks, where each host compresses its own
blocks and only O(compressed) bytes move to host 0.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..format import constants as C
from ..pipeline import parser as P
from ..pipeline.encoder import EncodeOptions, EncodeStats
from .block import encode_blocks_sharded, make_blocks
from .mesh import BLOCK_AXIS


def encode_multihost(data: bytes, opts: Optional[EncodeOptions] = None
                     ) -> tuple[bytes, EncodeStats]:
    """Collective: every process calls with the same input bytes.

    Returns the archive (identical on every process).
    """
    import jax
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

    from .pipeline import _host_stitch

    opts = opts or EncodeOptions()
    fmt, marker = P.detect_format(data)
    if fmt != C.IN_FORMAT_FASTA or opts.seq_type > C.SEQ_TYPE_RNA:
        raise ValueError("multihost path currently covers nucleotide FASTA")

    devices = jax.devices()
    D = len(devices)
    mesh = Mesh(np.asarray(devices), (BLOCK_AXIS,))
    sharding = NamedSharding(mesh, PS(BLOCK_AXIS))

    body = np.frombuffer(data, np.uint8)[marker + 1:]
    blocks, prev = make_blocks(body, D)

    def to_global(arr):
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])

    outs = encode_blocks_sharded(to_global(blocks), to_global(prev),
                                 seq_type=opts.seq_type, mesh=mesh)

    # gather per-block rows to every process, preserving block order
    def gather_rows(garr) -> np.ndarray:
        shards = sorted(garr.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        idx = np.asarray([s.index[0].start or 0 for s in shards])
        local = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        all_idx = multihost_utils.process_allgather(idx)      # (P, local_D)
        all_val = multihost_utils.process_allgather(local)    # (P, local_D, ...)
        out = np.empty((D,) + local.shape[1:], local.dtype)
        for p in range(all_idx.shape[0]):
            for j, row in enumerate(all_idx[p]):
                out[int(row)] = all_val[p, j]
        return out

    outs_np = [gather_rows(o) for o in outs]
    return _host_stitch(blocks, outs_np, opts, fmt)
