"""Fused single-pass sharded encode vs the host encoder (byte identity).

Runs the ops.emit_fused path on the virtual CPU mesh in interpret mode
(NAF_TPU_FUSED=1); archives must equal naf_tpu.pipeline.encoder.encode
byte-for-byte, which the golden suite pins against the reference decoder.
"""

from __future__ import annotations

import numpy as np
import pytest

pytest.importorskip("jax")

from naf_tpu.format import constants as C
from naf_tpu.parallel import pipeline as PL
from naf_tpu.parallel.block import make_blocks
from naf_tpu.parallel.mesh import block_mesh
from naf_tpu.pipeline.encoder import EncodeOptions, encode


def _gen(total=200_000, rec_len=20_000, seed=0, mask=True):
    rng = np.random.default_rng(seed)
    rows = []
    made = 0
    i = 0
    while made < total:
        n = min(rec_len, total - made)
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n)
        if mask:
            for s in rng.integers(0, max(1, n - 300), size=max(1, n // 4000)):
                seq[s:s + 300] |= 32
        body = b"\n".join(seq[j:j + 70].tobytes()
                          for j in range(0, n, 70))
        rows.append(b">rec%d c%d\n" % (i, i) + body + b"\n")
        made += n
        i += 1
    return b"".join(rows)


def _fused_direct(data: bytes, opts=None, D=4):
    """Call the fused path directly so a silent two-pass fallback cannot
    mask a coverage gap; returns None exactly when the path declines."""
    opts = opts or EncodeOptions()
    mesh = block_mesh(D)
    fmt, marker = (C.IN_FORMAT_FASTA, data.index(b">"[0]))
    import jax
    import jax.numpy as jnp

    from naf_tpu.parallel.mesh import block_sharding

    body = np.frombuffer(data, np.uint8)[marker + 1:]
    blocks = make_blocks(body, D)
    sh = block_sharding(mesh)
    dev = (jax.device_put(jnp.asarray(blocks.data), sh),
           jax.device_put(jnp.asarray(blocks.prev), sh),
           jax.device_put(jnp.asarray(blocks.starts_in_seq), sh))
    return PL._try_encode_fused(dev, opts, mesh, fmt,
                                fallback=lambda: encode(data, opts))


def test_multirecord_masked(monkeypatch):
    monkeypatch.setenv("NAF_TPU_FUSED", "1")
    data = _gen()
    host, _ = encode(data, EncodeOptions())
    out = _fused_direct(data)
    assert out is not None
    assert out[0] == host


def test_giant_record_spans_blocks(monkeypatch):
    monkeypatch.setenv("NAF_TPU_FUSED", "1")
    data = _gen(total=150_000, rec_len=150_000, seed=1)
    host, _ = encode(data, EncodeOptions())
    out = _fused_direct(data)
    assert out is not None
    assert out[0] == host


def test_unmasked_no_mask_flag(monkeypatch):
    monkeypatch.setenv("NAF_TPU_FUSED", "1")
    data = _gen(total=100_000, seed=2, mask=False)
    opts = EncodeOptions(no_mask=True)
    host, _ = encode(data, opts)
    out = _fused_direct(data, opts)
    assert out is not None
    assert out[0] == host


def test_unexpected_chars_decline(monkeypatch):
    monkeypatch.setenv("NAF_TPU_FUSED", "1")
    data = b">r1\nACGTZZACGT\n" + _gen(total=60_000, seed=3)[:]
    assert _fused_direct(data) is None       # hists need the stats pass


def test_encode_sharded_routes_fused(monkeypatch):
    monkeypatch.setenv("NAF_TPU_FUSED", "1")
    monkeypatch.setenv("NAF_TPU_NO_FALLBACK", "1")
    data = _gen(total=120_000, seed=4)
    host, _ = encode(data, EncodeOptions())
    blob, _ = PL.encode_sharded(data, EncodeOptions(), mesh=block_mesh(4))
    assert blob == host


def _gen_fq(n_reads=400, read_len=100, seed=5):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_reads):
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=read_len)
        if i % 3 == 0:
            seq[10:60] |= 32
        qual = rng.integers(35, 74, size=read_len, dtype=np.uint8)
        com = b" x" if i % 4 else b""
        out.append(b"@read%04d/1%s\n%s\n+\n%s\n"
                   % (i, com, seq.tobytes(), qual.tobytes()))
    return b"".join(out)


def _fused_fastq_direct(data: bytes, opts=None, D=4):
    from naf_tpu.parallel.block import make_blocks_fastq

    opts = opts or EncodeOptions()
    mesh = block_mesh(D)
    import jax
    import jax.numpy as jnp

    from naf_tpu.parallel.mesh import block_sharding

    body = np.frombuffer(data, np.uint8)[1:]
    mb = make_blocks_fastq(body, D)
    assert mb is not None
    blocks, _ = mb
    sh = block_sharding(mesh)
    dev = (jax.device_put(jnp.asarray(blocks.data), sh),
           jax.device_put(jnp.asarray(blocks.prev), sh),
           jax.device_put(jnp.asarray(blocks.starts_in_seq), sh))
    return PL._try_encode_fused_fastq(
        dev, opts, mesh, C.IN_FORMAT_FASTQ,
        fallback=lambda: encode(data, opts))


def test_fastq_fused_pipeline(monkeypatch):
    monkeypatch.setenv("NAF_TPU_FUSED", "1")
    data = _gen_fq()
    host, _ = encode(data, EncodeOptions())
    out = _fused_fastq_direct(data)
    assert out is not None
    assert out[0] == host


def test_fastq_fused_varied_reads(monkeypatch):
    monkeypatch.setenv("NAF_TPU_FUSED", "1")
    rng = np.random.default_rng(6)
    out = []
    for i in range(300):
        ln = int(rng.integers(1, 250))
        seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=ln)
        qual = rng.integers(33, 100, size=ln, dtype=np.uint8)
        out.append(b"@v%d\n%s\n+\n%s\n" % (i, seq.tobytes(),
                                           qual.tobytes()))
    data = b"".join(out)
    host, _ = encode(data, EncodeOptions())
    r = _fused_fastq_direct(data)
    assert r is not None
    assert r[0] == host


def test_fastq_encode_sharded_routes_fused(monkeypatch):
    monkeypatch.setenv("NAF_TPU_FUSED", "1")
    monkeypatch.setenv("NAF_TPU_NO_FALLBACK", "1")
    data = _gen_fq(n_reads=600, read_len=64, seed=7)
    host, _ = encode(data, EncodeOptions())
    blob, _ = PL.encode_sharded(data, EncodeOptions(), mesh=block_mesh(4))
    assert blob == host
