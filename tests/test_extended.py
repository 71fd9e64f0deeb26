"""tnaf extended format (flag bit 0x80): blocked SEQ/QUAL sections.

Extended archives trade reference-tool compatibility (the bit marks them)
for parallel compress/decompress and block-level seekability.
"""

import io
import subprocess
import sys

import numpy as np
import pytest

from naf_tpu.format import constants as C
from naf_tpu.pipeline.decoder import Decoder, DecodeOptions
from naf_tpu.pipeline.encoder import EncodeOptions, encode

sys.path.insert(0, "tests")
from test_stream import _fasta, _fastq  # noqa: E402


def test_extended_roundtrip_fasta():
    data = _fasta(20, n_rec=30, max_len=40_000)
    plain, _ = encode(data, EncodeOptions())
    ext, _ = encode(data, EncodeOptions(extended=True, block_bytes=1 << 16))
    # header flag set
    assert ext[4] & 0x80
    assert not plain[4] & 0x80
    out_plain = Decoder(io.BytesIO(plain), DecodeOptions()).fasta()
    out_ext = Decoder(io.BytesIO(ext), DecodeOptions()).fasta()
    assert out_ext == out_plain


def test_extended_roundtrip_fastq():
    data = _fastq(21, n_rec=400)
    ext, _ = encode(data, EncodeOptions(extended=True, block_bytes=1 << 14))
    plain, _ = encode(data, EncodeOptions())
    assert (Decoder(io.BytesIO(ext), DecodeOptions()).fastq()
            == Decoder(io.BytesIO(plain), DecodeOptions()).fastq())


@pytest.mark.parametrize("seq_type", [C.SEQ_TYPE_PROTEIN, C.SEQ_TYPE_TEXT])
def test_extended_text_like(seq_type):
    data = _fasta(22, n_rec=8, max_len=9_000)
    ext, _ = encode(data, EncodeOptions(seq_type=seq_type, extended=True,
                                        block_bytes=1 << 13))
    plain, _ = encode(data, EncodeOptions(seq_type=seq_type))
    assert (Decoder(io.BytesIO(ext), DecodeOptions()).fasta()
            == Decoder(io.BytesIO(plain), DecodeOptions()).fasta())


def test_extended_partial_outputs():
    data = _fasta(23, n_rec=12, max_len=2000)
    ext, _ = encode(data, EncodeOptions(extended=True, block_bytes=1 << 12))
    plain, _ = encode(data, EncodeOptions())
    for meth in ("ids", "names", "lengths", "sequences", "seq_concat",
                 "charcount", "four_bit"):
        a = getattr(Decoder(io.BytesIO(ext), DecodeOptions()), meth)()
        b = getattr(Decoder(io.BytesIO(plain), DecodeOptions()), meth)()
        assert a == b, meth


def test_extended_ratio_overhead_small():
    data = _fasta(24, n_rec=20, max_len=50_000)
    plain, _ = encode(data, EncodeOptions())
    ext, _ = encode(data, EncodeOptions(extended=True))  # default 4 MB blocks
    assert len(ext) < len(plain) * 1.02


def test_extended_cli_roundtrip(tmp_path):
    data = _fasta(25, n_rec=10, max_len=5000)
    p = subprocess.run([sys.executable, "-m", "naf_tpu.cli.tnaf",
                        "--extended", "--block-size", "1", "-c"],
                       input=data, capture_output=True)
    assert p.returncode == 0, p.stderr
    q = subprocess.run([sys.executable, "-m", "naf_tpu.cli.untnaf", "-c"],
                       input=p.stdout, capture_output=True)
    assert q.returncode == 0, q.stderr
    ref = subprocess.run([sys.executable, "-m", "naf_tpu.cli.tnaf", "-c"],
                         input=data, capture_output=True)
    r2 = subprocess.run([sys.executable, "-m", "naf_tpu.cli.untnaf", "-c"],
                        input=ref.stdout, capture_output=True)
    assert q.stdout == r2.stdout


def test_fasta_range():
    data = _fasta(26, n_rec=20, max_len=4000)
    for extended in (False, True):
        blob, _ = encode(data, EncodeOptions(extended=extended,
                                             block_bytes=1 << 12))
        full = Decoder(io.BytesIO(blob), DecodeOptions()).fasta()
        recs = [b">" + r for r in full.split(b">")[1:]]
        for r0, r1 in ((0, 3), (5, 11), (17, 20), (0, 20), (8, 8)):
            got = Decoder(io.BytesIO(blob),
                          DecodeOptions()).fasta_range(r0, r1)
            assert got == b"".join(recs[r0:r1]), (extended, r0, r1)


def test_fasta_range_cli():
    data = _fasta(27, n_rec=10, max_len=800)
    p = subprocess.run([sys.executable, "-m", "naf_tpu.cli.tnaf",
                        "--extended", "-c"], input=data, capture_output=True)
    q = subprocess.run([sys.executable, "-m", "naf_tpu.cli.untnaf",
                        "--range", "2:5", "-c"], input=p.stdout,
                       capture_output=True)
    assert q.returncode == 0, q.stderr
    full = subprocess.run([sys.executable, "-m", "naf_tpu.cli.untnaf", "-c"],
                          input=p.stdout, capture_output=True).stdout
    recs = [b">" + r for r in full.split(b">")[1:]]
    assert q.stdout == b"".join(recs[2:5])


def test_fastq_range():
    data = _fastq(28, n_rec=300)
    for extended in (False, True):
        blob, _ = encode(data, EncodeOptions(extended=extended,
                                             block_bytes=1 << 12))
        full = Decoder(io.BytesIO(blob), DecodeOptions()).fastq()
        lines = full.split(b"\n")[:-1]
        recs = [b"\n".join(lines[i:i + 4]) + b"\n"
                for i in range(0, len(lines), 4)]
        for r0, r1 in ((0, 5), (7, 40), (290, 300), (0, 300), (9, 9)):
            got = Decoder(io.BytesIO(blob),
                          DecodeOptions()).fastq_range(r0, r1)
            assert got == b"".join(recs[r0:r1]), (extended, r0, r1)


def test_fastq_range_cli():
    data = _fastq(29, n_rec=60)
    p = subprocess.run([sys.executable, "-m", "naf_tpu.cli.tnaf", "--fastq",
                        "--extended", "--block-size", "1", "-c"],
                       input=data, capture_output=True)
    assert p.returncode == 0, p.stderr
    q = subprocess.run([sys.executable, "-m", "naf_tpu.cli.untnaf",
                        "--range", "10:25", "-c"], input=p.stdout,
                       capture_output=True)
    assert q.returncode == 0, q.stderr
    full = subprocess.run([sys.executable, "-m", "naf_tpu.cli.untnaf",
                           "--fastq", "-c"], input=p.stdout,
                          capture_output=True).stdout
    lines = full.split(b"\n")[:-1]
    recs = [b"\n".join(lines[i:i + 4]) + b"\n"
            for i in range(0, len(lines), 4)]
    assert q.stdout == b"".join(recs[10:25])
