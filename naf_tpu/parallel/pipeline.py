"""End-to-end sharded encode: bytes -> device mesh -> NAF archive.

This is the BASELINE north star: data-parallel sharded block compression
over a ``jax.sharding.Mesh``, merged into a spec-conformant archive that the
reference ``unnaf`` decodes.  Produces *byte-identical* archives to the host
pipeline (``naf_tpu.pipeline.encoder.encode``) because the two share
``build_archive``.

Division of labor (pod-shaped — see parallel/block.py):
  * device pass 1: per-block scan + O(1) stats; psum/pmax/all_gather
    collectives ride ICI;
  * device pass 2: compacted section payloads (packed 4-bit seq, id/comment
    bytes, per-record lengths, mask runs, FASTQ quality) — device->host
    traffic ~= payload bytes, never per-input-byte metadata;
  * host: line/record-aligned block splitting, O(blocks + records + runs)
    carry stitching, zstd section framing, container write.

FASTA nucleotide inputs shard even when one giant record spans every device
(blocks cut at line starts — the sequence-parallel case).  FASTQ shards on
the regular 4-line grid; irregular inputs and protein/text/strict/
well-formed modes take the host path (same archive bytes either way).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..format import constants as C
from ..pipeline import parser as P
from ..pipeline.encoder import EncodeOptions, EncodeStats, build_archive
from .block import (
    blob_from_lens, emit_blocks_packed, fused_blocks_fastq_sharded,
    fused_blocks_sharded, make_blocks, make_blocks_fastq,
    stats_blocks_packed, stitch_lengths, stitch_packed, stitch_runs,
    unpack_emit, unpack_stats,
)


def _bucket(n: int, align: int = 16) -> int:
    m = align
    while m < n:
        m *= 2
    return m


def _wf_device_safe(body: np.ndarray, fastq: bool) -> bool:
    """True when --well-formed parsing provably equals robust parsing.

    The wf fast path (ennaf/src/process.c:314-355, tables.c:46-69) treats
    only LF and ' ' as whitespace and skips char validation.  Robust
    classification produces identical bytes iff the input contains no
    TAB/VT/FF/CR and no ' ' outside header lines (spaces ON header lines
    behave identically: the first ends the id, the rest are comment bytes
    under both tables).  Char validation differences surface as nonzero
    unexpected-char histograms and are caught after pass 1.
    """
    if body.size == 0:
        return True
    if np.any((body == 9) | (body == 11) | (body == 12) | (body == 13)):
        return False
    sp = np.flatnonzero(body == 32)
    if sp.size == 0:
        return True
    eol = np.flatnonzero(body == 10)
    line_id = np.searchsorted(eol, sp)        # line index of each space
    if fastq:
        return bool(np.all(line_id % 4 == 0))
    starts = np.concatenate([[0], eol + 1])   # start byte of each line
    first = body[np.minimum(starts[line_id], body.size - 1)]
    # line 0 is record 0's header (its '>' was stripped by the caller)
    return bool(np.all((line_id == 0) | (first == ord(">"))))


def _merge_hist(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """u32 (lo16, hi16) psum halves -> u64[257] histogram."""
    h = np.zeros(257, np.uint64)
    h[:256] = (hi.astype(np.uint64) << 16) + lo.astype(np.uint64)
    return h


def _try_encode_fused(blocks_dev, opts, mesh, fmt, fallback):
    """Single-pass fused device encode (nucleotide FASTA, plain sections).

    ``blocks_dev`` = (blocks_d, prev_d, sis_d) already on the mesh — the
    caller uploads once and the two-pass fallback reuses the same arrays
    (a second full-input upload through the ~MB/s tunnel would dominate).
    Returns the (blob, stats) tuple, or None when the input needs the
    two-pass path: a tile overflowed the sparse cap (mask-run changes /
    header bytes denser than ~1 per 32 input bytes) or unexpected
    characters exist (their histograms come from the two-pass stats).
    """
    import jax.numpy as jnp

    D = mesh.devices.size
    interpret = mesh.devices.flat[0].platform != "tpu"
    blocks_d, prev_d, sis_d = blocks_dev

    packed_d, scal_d, tv_d, a_d = fused_blocks_sharded(
        blocks_d, prev_d, sis_d, jnp.zeros(1, jnp.int32),
        seq_type=opts.seq_type, mesh=mesh, interpret=interpret)
    parsed = parse_fused_fasta(D, np.asarray(scal_d), packed_d, tv_d, a_d)
    if parsed is None:
        return None                               # overflow / unexpected
    zero_hists = [np.zeros((1, 256), np.uint32) for _ in range(8)]
    return _stitch_and_build(
        D, fmt, opts, parsed["counts"], parsed["id_bytes"],
        parsed["com_bytes"], np.zeros(D, np.int64), parsed["n_rec"],
        parsed["n_runs"], parsed["first_lower"], parsed["longest"],
        zero_hists, parsed["em_np"], fallback=fallback)


def _pad2d(D, rows, dtype=np.int32):
    w = max(max((r.size for r in rows), default=0), 1)
    out = np.zeros((D, w), dtype)
    for k, r in enumerate(rows):
        out[k, :r.size] = r
    return out


def parse_fused_fasta(D, scal, packed_d, tv_d, a_d):
    """Host parse of the fused FASTA outputs -> the em_np layout of the
    two-pass protocol (shared by encode_sharded and the streaming engine).
    Returns None when a tile overflowed the sparse cap or unexpected
    characters exist (their histograms need the stats pass)."""
    if not scal[:, 3].all() or scal[:, 4:7].any():
        return None

    counts = scal[:, 0].astype(np.int64)
    cnt_seq = scal[:, 1].astype(np.int64)
    n_sp = scal[:, 2].astype(np.int64)
    longest = np.full(D, int(scal[:, 7].max()))
    first_lower = scal[:, 8] == 2
    from ..ops import tables as T

    first_codes = np.asarray(T.NUC_CODE)[scal[:, 9]]

    # sliced fetches: only used prefixes cross the host<->device link
    p_used = max(int((counts.max(initial=1) + 1) // 2) + 1, 1)
    packed = np.asarray(packed_d[:, :p_used])
    m_sp = max(int(n_sp.max(initial=1)), 1)
    tv = np.asarray(tv_d[:, :m_sp])
    av = np.asarray(a_d[:, :m_sp])

    # host-side sparse parse: O(records + runs + header bytes)
    id_vals_l, com_vals_l = [], []
    seq_lens_l, id_lens_l, com_lens_l, run_lens_l = [], [], [], []
    n_rec = np.zeros(D, np.int64)
    n_runs = np.zeros(D, np.int64)
    for k in range(D):
        t = tv[k, :n_sp[k]] >> 8
        v = (tv[k, :n_sp[k]] & 0xFF).astype(np.uint8)
        a = av[k, :n_sp[k]].astype(np.int64)
        id_vals_l.append(v[t == 0])
        com_vals_l.append(v[t == 1])
        rec = t == 2
        n_rec[k] = int(rec.sum())
        bounds = np.concatenate([[0], a[rec], [cnt_seq[k]]])
        seq_lens_l.append(np.diff(bounds))
        at = np.flatnonzero(rec)
        for tag, sink in ((0, id_lens_l), (1, com_lens_l)):
            c = np.cumsum(t == tag)
            mid = c[at] if at.size else np.zeros(0, np.int64)
            sink.append(np.diff(np.concatenate(
                [[0], mid, [int((t == tag).sum())]])))
        j = a[t == 3]
        run_lens_l.append(np.diff(np.concatenate([[0], j, [counts[k]]]))
                          if counts[k] > 0 else np.zeros(0, np.int64))
        n_runs[k] = (j.size + 1) if counts[k] > 0 else 0

    em_np = [packed, first_codes, counts,
             _pad2d(D, id_vals_l, np.uint8), _pad2d(D, com_vals_l, np.uint8),
             np.zeros((D, 1), np.uint8),
             _pad2d(D, seq_lens_l), _pad2d(D, id_lens_l),
             _pad2d(D, com_lens_l),
             np.zeros((D, int(n_rec.max()) + 1), np.int64),
             _pad2d(D, run_lens_l, np.int64)]
    return dict(
        counts=counts,
        id_bytes=np.array([r.size for r in id_vals_l], np.int64),
        com_bytes=np.array([r.size for r in com_vals_l], np.int64),
        n_rec=n_rec, n_runs=n_runs, first_lower=first_lower,
        longest=longest, em_np=em_np)


def _try_encode_fused_fastq(blocks_dev, opts, mesh, fmt, fallback):
    """Single-pass fused FASTQ device encode; None -> two-pass path.
    ``blocks_dev`` as in _try_encode_fused (sis unused here)."""
    import jax.numpy as jnp

    D = mesh.devices.size
    interpret = mesh.devices.flat[0].platform != "tpu"
    blocks_d, prev_d, _sis_d = blocks_dev

    outs = fused_blocks_fastq_sharded(
        blocks_d, prev_d, jnp.zeros(1, jnp.int32),
        seq_type=opts.seq_type, mesh=mesh, interpret=interpret)
    parsed = parse_fused_fastq(D, np.asarray(outs[3]), outs)
    if parsed is None:
        return None                           # overflow / unexpected
    zero_hists = [np.zeros((1, 256), np.uint32) for _ in range(8)]
    return _stitch_and_build(
        D, fmt, opts, parsed["counts"], parsed["id_bytes"],
        parsed["com_bytes"], parsed["qual_bytes"], parsed["n_rec"],
        parsed["n_runs"], parsed["first_lower"], parsed["longest"],
        zero_hists, parsed["em_np"], fallback=fallback)


def parse_fused_fastq(D, scal, outs):
    """Host parse of the fused FASTQ outputs (shared with the streaming
    engine); None on sparse-cap overflow or unexpected characters."""
    packed_d, qv_d, iv_d, _scal_d, tv_d, a_d, b_d, c_d = outs
    if not scal[:, 3].all() or scal[:, 4:7].any() or scal[:, 12].any():
        return None

    counts = scal[:, 0].astype(np.int64)
    cnt_seq = scal[:, 1].astype(np.int64)
    n_sp = scal[:, 2].astype(np.int64)
    longest = np.full(D, int(scal[:, 7].max()))
    first_lower = scal[:, 8] == 2
    from ..ops import tables as T

    first_codes = np.asarray(T.NUC_CODE)[scal[:, 9]]
    qual_bytes = scal[:, 10].astype(np.int64)
    id_bytes = scal[:, 11].astype(np.int64)

    p_used = max(int((counts.max(initial=1) + 1) // 2) + 1, 1)
    packed = np.asarray(packed_d[:, :p_used])
    qual_vals = np.asarray(qv_d[:, :max(int(qual_bytes.max(initial=1)), 1)])
    id_vals = np.asarray(iv_d[:, :max(int(id_bytes.max(initial=1)), 1)])
    m_sp = max(int(n_sp.max(initial=1)), 1)
    tv = np.asarray(tv_d[:, :m_sp])
    av = np.asarray(a_d[:, :m_sp])
    bv = np.asarray(b_d[:, :m_sp])
    cv = np.asarray(c_d[:, :m_sp])

    com_vals_l = []
    seq_lens_l, qual_lens_l, id_lens_l, com_lens_l, run_lens_l = \
        [], [], [], [], []
    n_rec = np.zeros(D, np.int64)
    n_runs = np.zeros(D, np.int64)
    for k in range(D):
        t = tv[k, :n_sp[k]] >> 8
        v = (tv[k, :n_sp[k]] & 0xFF).astype(np.uint8)
        com_vals_l.append(v[t == 1])
        rec = t == 2
        n_rec[k] = int(rec.sum())
        for arr, total, sink in (
                (av, cnt_seq[k], seq_lens_l),
                (bv, qual_bytes[k], qual_lens_l),
                (cv, id_bytes[k], id_lens_l)):
            x = arr[k, :n_sp[k]].astype(np.int64)
            sink.append(np.diff(np.concatenate([[0], x[rec], [total]])))
        at = np.flatnonzero(rec)
        ccom = np.cumsum(t == 1)
        mid = ccom[at] if at.size else np.zeros(0, np.int64)
        com_lens_l.append(np.diff(np.concatenate(
            [[0], mid, [int((t == 1).sum())]])))
        j = av[k, :n_sp[k]].astype(np.int64)[t == 3]
        run_lens_l.append(np.diff(np.concatenate([[0], j, [counts[k]]]))
                          if counts[k] > 0 else np.zeros(0, np.int64))
        n_runs[k] = (j.size + 1) if counts[k] > 0 else 0

    em_np = [packed, first_codes, counts,
             id_vals, _pad2d(D, com_vals_l, np.uint8), qual_vals,
             _pad2d(D, seq_lens_l), _pad2d(D, id_lens_l),
             _pad2d(D, com_lens_l), _pad2d(D, qual_lens_l),
             _pad2d(D, run_lens_l, np.int64)]
    return dict(
        counts=counts,
        id_bytes=id_bytes,
        com_bytes=np.array([r.size for r in com_vals_l], np.int64),
        qual_bytes=qual_bytes, n_rec=n_rec, n_runs=n_runs,
        first_lower=first_lower, longest=longest, em_np=em_np)


def encode_sharded(data: bytes, opts: Optional[EncodeOptions] = None, *,
                   mesh=None, n_blocks: Optional[int] = None
                   ) -> tuple[bytes, EncodeStats]:
    """Sharded FASTA/FASTQ encode over a device mesh.

    Nucleotide inputs run the device pipeline; protein/text, strict and
    well-formed modes, and irregular FASTQ take the host path — same
    archive bytes either way.
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

    device_path = fmt in (C.IN_FORMAT_FASTA, C.IN_FORMAT_FASTQ)
    if not device_path:
        return host_encode(data, opts)

    fastq = fmt == C.IN_FORMAT_FASTQ
    body = np.frombuffer(data, np.uint8)[marker + 1:]

    # --well-formed parses with the reduced space table (LF/' ' only,
    # tables.c:46-69) and skips replacement: on inputs where that regime
    # actually holds — no TAB/VT/FF/CR anywhere, no ' ' inside sequence or
    # quality lines — the robust classification the device runs is
    # byte-identical, so the archive is too.  Inputs outside the regime
    # (where wf semantics diverge byte-for-byte) take the host wf parser.
    if opts.well_formed and not _wf_device_safe(body, fastq):
        return host_encode(data, opts)

    if mesh is None:
        mesh = block_mesh(n_blocks)
    D = mesh.devices.size

    if fastq:
        mb = make_blocks_fastq(body, D)
        if mb is None:                      # irregular grid -> host parser
            return host_encode(data, opts)
        blocks, _ = mb
    else:
        blocks = make_blocks(body, D)

    # single-pass fused path (ops.emit_fused): nucleotide plain-format FASTA
    # on a real TPU mesh (or under NAF_TPU_FUSED=1 for interpret-mode CPU
    # tests).  Returns None -> two-pass path (sparse-cap overflow, or
    # unexpected chars whose histograms need the stats pass).
    import os as _os

    text_like = opts.seq_type >= C.SEQ_TYPE_PROTEIN
    fused_on = _os.environ.get("NAF_TPU_NO_FUSED") != "1" and (
        mesh.devices.flat[0].platform == "tpu"
        or _os.environ.get("NAF_TPU_FUSED") == "1")
    # ONE host->device upload shared by the fused attempt and the two-pass
    # fallback (a second full-input transfer through the ~MB/s tunnel would
    # dominate any fallback's cost)
    sharding = block_sharding(mesh)
    blocks_d = jax.device_put(jnp.asarray(blocks.data), sharding)
    prev_d = jax.device_put(jnp.asarray(blocks.prev), sharding)
    sis_d = jax.device_put(jnp.asarray(blocks.starts_in_seq), sharding)

    if fused_on and not text_like:
        try:
            attempt = (_try_encode_fused_fastq if fastq
                       else _try_encode_fused)
            out = attempt((blocks_d, prev_d, sis_d), opts, mesh, fmt,
                          fallback=lambda: host_encode(data, opts))
            if out is not None:
                return out
        except P.InputError:
            raise
        except Exception as e:
            import warnings

            if _os.environ.get("NAF_TPU_NO_FALLBACK") == "1":
                raise
            warnings.warn(
                f"naf_tpu: fused device encode failed ({type(e).__name__}: "
                f"{e}); falling back to the two-pass pipeline")

    try:

        st_packed, odd_d = stats_blocks_packed(
            blocks_d, prev_d, sis_d, seq_type=opts.seq_type, fastq=fastq,
            mesh=mesh)
        scalars, hists = unpack_stats(st_packed)   # ONE tunnel fetch
        (counts, odd, id_bytes, com_bytes, qual_bytes, n_rec, n_runs,
         first_lower, longest) = scalars

        # --strict dies at the FIRST unexpected char with its exact
        # position-dependent message (process.c:121-129): pass-1 histograms
        # prove cleanliness for free; any hit re-parses on the host, which
        # raises the reference-exact error text
        if opts.strict and any(int(h.sum()) for h in hists):
            return host_encode(data, opts)

        text_like = opts.seq_type >= C.SEQ_TYPE_PROTEIN
        if text_like:
            p_cap = _bucket(int(counts.max(initial=2)) + 1)
        else:
            p_cap = _bucket(int((counts + 1).max(initial=2) // 2) + 1)
        id_cap = _bucket(max(int(id_bytes.max(initial=1)), 1))
        com_cap = _bucket(max(int(com_bytes.max(initial=1)), 1))
        r_cap = _bucket(int(n_rec.max(initial=0)) + 1)
        m_cap = (2 if text_like
                 else _bucket(max(int(n_runs.max(initial=2)), 2)))
        q_cap = (_bucket(max(int(qual_bytes.max(initial=1)), 1))
                 if fastq else 16)

        caps = dict(p_cap=p_cap, id_cap=id_cap, com_cap=com_cap,
                    r_cap=r_cap, m_cap=m_cap, q_cap=q_cap)
        pay, meta = emit_blocks_packed(
            blocks_d, prev_d, sis_d, odd_d,
            seq_type=opts.seq_type, fastq=fastq, mesh=mesh,
            pack_nibbles=not text_like, **caps)
        # fetch only the USED prefix of each payload segment: the caps are
        # power-of-2 buckets (up to 2x padding), and through the dev tunnel
        # the padding bytes cost real transfer time.  Slicing on device
        # first keeps every fetched byte meaningful; consumers only index
        # within the used ranges.
        if text_like:
            p_used = max(int(counts.max(initial=1)), 1)
        else:
            p_used = max(int((counts.max(initial=1) + 1) // 2) + 1, 1)
        p_used = min(p_used, p_cap)
        id_used = max(min(int(id_bytes.max(initial=1)), id_cap), 1)
        com_used = max(min(int(com_bytes.max(initial=1)), com_cap), 1)
        q_used = max(min(int(qual_bytes.max(initial=1)), q_cap), 1)
        o0, o1, o2 = p_cap, p_cap + id_cap, p_cap + id_cap + com_cap
        o3 = o2 + q_cap
        meta_np = np.asarray(meta)
        em_np = [np.asarray(pay[:, :p_used]),
                 np.asarray(pay[:, o3]),              # first_code
                 meta_np[:, 0],                       # cnt
                 np.asarray(pay[:, o0:o0 + id_used]),
                 np.asarray(pay[:, o1:o1 + com_used]),
                 np.asarray(pay[:, o2:o2 + q_used])]
        rc = r_cap
        em_np += [meta_np[:, 1:1 + rc], meta_np[:, 1 + rc:1 + 2 * rc],
                  meta_np[:, 1 + 2 * rc:1 + 3 * rc],
                  meta_np[:, 1 + 3 * rc:1 + 4 * rc],
                  meta_np[:, 1 + 4 * rc:1 + 4 * rc + m_cap]]
    except P.InputError:
        raise                               # user-facing parse errors
    except Exception as e:
        # failure detection (SURVEY §5): a device fault mid-encode requeues
        # the work to the host pipeline instead of aborting — the archive is
        # byte-identical either way, so retry is free correctness-wise.
        # NAF_TPU_NO_FALLBACK=1 re-raises instead (CI/debug: a silent retry
        # would otherwise hide real device-path regressions behind a
        # still-correct archive)
        import os
        import warnings

        if os.environ.get("NAF_TPU_NO_FALLBACK") == "1":
            raise
        warnings.warn(
            f"naf_tpu: device encode failed ({type(e).__name__}: {e}); "
            "falling back to the host pipeline")
        return host_encode(data, opts)

    return _stitch_and_build(
        D, fmt, opts, counts, id_bytes, com_bytes, qual_bytes, n_rec,
        n_runs, first_lower, longest, hists, em_np,
        fallback=lambda: host_encode(data, opts))


def _stitch_and_build(D, fmt, opts, counts, id_bytes, com_bytes, qual_bytes,
                      n_rec, n_runs, first_lower, longest, hists, em_np,
                      fallback, prebuilt=None):
    """Host carry stitching (O(blocks + records + runs)) + container.

    ``prebuilt`` injects ready SEQ/QUAL sections (multi-host extended path:
    payloads were compressed on their owning hosts; em_np then carries
    zero-width packed/qual arrays).
    """
    fastq = fmt == C.IN_FORMAT_FASTQ
    (packed, first_codes, cnt2, id_vals, com_vals, qual_vals,
     seq_lens, id_lens, com_lens, qual_lens, run_lens) = em_np

    def trim(arr2d):
        return [arr2d[k, : int(n_rec[k]) + 1] for k in range(D)]

    g_seq_lens = stitch_lengths(trim(seq_lens))
    g_id_lens = stitch_lengths(trim(id_lens))
    g_com_lens = stitch_lengths(trim(com_lens))
    n_records = int(n_rec.sum()) + 1
    assert g_seq_lens.size == n_records

    if fastq:
        g_qual_lens = stitch_lengths(trim(qual_lens))
        if not np.array_equal(g_qual_lens, g_seq_lens):
            # exact error text (record index, counts) comes from the host
            # parser, which scans sequentially like the reference
            return fallback()

    res = P.ParseResult()
    res.n_sequences = n_records
    res.ids_blob = blob_from_lens(
        np.concatenate([id_vals[k, : int(id_bytes[k])] for k in range(D)]),
        g_id_lens)
    res.comments_blob = blob_from_lens(
        np.concatenate([com_vals[k, : int(com_bytes[k])] for k in range(D)]),
        g_com_lens)
    res.lengths = g_seq_lens.astype(np.uint64)
    res.longest_line = int(longest[0])

    total_chars = int(counts.sum())
    text_like = opts.seq_type >= C.SEQ_TYPE_PROTEIN
    if text_like:
        # protein/text archives store raw bytes: per-block compacted char
        # streams concatenate directly (no nibble parity); build_archive
        # upper-cases under --no-mask
        res.seq = (np.concatenate(
            [packed[k, : int(counts[k])] for k in range(D)])
            if total_chars else np.zeros(0, np.uint8)).astype(np.uint8)
        res.packed = None
    else:
        res.seq = np.zeros(total_chars, np.uint8)    # only .size is used
        if prebuilt is None:
            res.packed = stitch_packed(packed, counts, first_codes)
        else:
            res.packed = np.zeros(0, np.uint8)   # payload arrives prebuilt

    store_mask = not opts.no_mask and not text_like
    if store_mask:
        from ..ops.mask import runs_to_units

        runs, state_first = stitch_runs(
            [run_lens[k, : int(n_runs[k])] for k in range(D)],
            [bool(first_lower[k]) for k in range(D)])
        if state_first and runs.size:
            runs = np.concatenate([[0], runs])   # leading masked run
        res.mask_units = runs_to_units(runs)

    if fastq and prebuilt is None:
        res.qual = np.concatenate(
            [qual_vals[k, : int(qual_bytes[k])] for k in range(D)])
    elif fastq:
        res.qual = np.zeros(int(counts.sum()), np.uint8)   # size only

    res.unexpected_id = _merge_hist(hists[0][0], hists[1][0])
    res.unexpected_comment = _merge_hist(hists[2][0], hists[3][0])
    res.unexpected_seq = _merge_hist(hists[4][0], hists[5][0])
    res.unexpected_qual = _merge_hist(hists[6][0], hists[7][0])

    stats = EncodeStats(
        n_sequences=res.n_sequences, longest_line=res.longest_line,
        seq_size_original=total_chars,
        unexpected_id=res.unexpected_id,
        unexpected_comment=res.unexpected_comment,
        unexpected_seq=res.unexpected_seq,
        unexpected_qual=res.unexpected_qual,
        in_format=fmt,
    )
    return build_archive(res, opts, stats, prebuilt=prebuilt)


def device_to_host_bytes(D: int, caps: dict) -> int:
    """Accounting helper for tests/bench: bytes shipped device->host by
    pass 2 (payloads only; pass 1 is O(1) scalars + histograms)."""
    per_block = (caps["p_cap"] + caps["id_cap"] + caps["com_cap"]
                 + caps["q_cap"] + 4 * 4 * caps["r_cap"] + 4 * caps["m_cap"])
    return D * per_block
