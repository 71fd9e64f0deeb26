"""Uniform-record-group device render vs the host renderer (byte identity).

parallel/decode.render_regular turns rendering into pure reshape/concat
layout ops when record shapes repeat; these tests pin byte identity against
Decoder.fasta()/fastq() on a 1-device mesh (the path's activation domain)
and that ragged archives decline to the gather path.
"""

from __future__ import annotations

import io

import numpy as np
import pytest

pytest.importorskip("jax")

from naf_tpu.parallel import decode as DV
from naf_tpu.parallel.mesh import block_mesh
from naf_tpu.pipeline.decoder import DecodeOptions, Decoder
from naf_tpu.pipeline.encoder import EncodeOptions, encode


def _mesh1():
    return block_mesh(1)


def _dec(blob):
    return Decoder(io.BytesIO(blob), DecodeOptions())


def _check_fasta(data: bytes, used_regular=True, monkeypatch=None):
    blob, _ = encode(data, EncodeOptions())
    host = _dec(blob).fasta()
    called = []
    orig = DV.render_regular

    def spy(plan, seq, qual, *, mesh):
        out = orig(plan, seq, qual, mesh=mesh)
        called.append(out is not None)
        return out

    DV.render_regular, _saved = spy, orig
    try:
        dev = _dec(blob).fasta_device(mesh=_mesh1())
    finally:
        DV.render_regular = _saved
    assert dev == host
    if called:                      # device path reached the renderer
        assert called[0] == used_regular


def test_uniform_masked_fasta():
    rng = np.random.default_rng(0)
    rows = []
    for i in range(12):
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=5000)
        for s in rng.integers(0, 4500, size=6):
            seq[s:s + 200] |= 32
        body = b"\n".join(seq[j:j + 70].tobytes() for j in range(0, 5000, 70))
        rows.append(b">r%02d\n" % i + body + b"\n")     # equal header len
    _check_fasta(b"".join(rows))


def test_groups_by_header_and_length():
    rng = np.random.default_rng(1)
    rows = []
    for i in range(30):
        n = 3000 if i < 15 else 4100
        seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=n)
        body = b"\n".join(seq[j:j + 60].tobytes() for j in range(0, n, 60))
        rows.append(b">rec%d\n" % i + body + b"\n")      # 1/2-digit groups
    _check_fasta(b"".join(rows))


def test_single_giant_record():
    rng = np.random.default_rng(2)
    seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=300_000)
    seq[1000:40_000] |= 32
    body = b"\n".join(seq[j:j + 80].tobytes()
                      for j in range(0, seq.size, 80))
    _check_fasta(b">chr1 assembled\n" + body + b"\n")


def test_ragged_declines_to_gather_path():
    rng = np.random.default_rng(3)
    rows = []
    for i in range(64):
        n = int(rng.integers(10, 500))
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n)
        rows.append(b">%s%d\n" % (b"x" * int(rng.integers(1, 9)), i)
                    + seq.tobytes() + b"\n")
    _check_fasta(b"".join(rows), used_regular=False)


def test_uniform_fastq():
    rng = np.random.default_rng(4)
    out = []
    for i in range(500):
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=100)
        qual = rng.integers(35, 74, size=100, dtype=np.uint8)
        out.append(b"@read%03d/1\n%s\n+\n%s\n"
                   % (i, seq.tobytes(), qual.tobytes()))
    data = b"".join(out)
    blob, _ = encode(data, EncodeOptions())
    host = _dec(blob).fastq()
    dev = _dec(blob).fastq_device(mesh=_mesh1())
    assert dev == host


def test_fastq_header_length_groups():
    rng = np.random.default_rng(5)
    out = []
    for i in range(120):                 # 1-3 digit ids: 3 groups
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=64)
        qual = rng.integers(35, 74, size=64, dtype=np.uint8)
        out.append(b"@r%d\n%s\n+\n%s\n"
                   % (i, seq.tobytes(), qual.tobytes()))
    data = b"".join(out)
    blob, _ = encode(data, EncodeOptions())
    host = _dec(blob).fastq()
    dev = _dec(blob).fastq_device(mesh=_mesh1())
    assert dev == host
