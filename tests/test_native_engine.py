"""The native entropy engine (naf_zstd.cpp): our own RFC 8878 encoder.

Archives compressed with engine="native" must decode with BOTH the
reference unnaf (library zstd decoder) and our own decoder, byte-identical
to plain-engine output.
"""

import io
import sys

import numpy as np
import pytest

from naf_tpu import native
from naf_tpu.codec import compress_section_native, decompress_section
from naf_tpu.pipeline.decoder import Decoder, DecodeOptions
from naf_tpu.pipeline.encoder import EncodeOptions, encode

sys.path.insert(0, "tests")
from conftest import run_ref  # noqa: E402
from test_stream import _fasta, _fastq  # noqa: E402

pytestmark = pytest.mark.skipif(not native.available(), reason="no native lib")


@pytest.mark.parametrize("seed,kind", [(0, "rand4"), (1, "rand256"),
                                       (2, "runs"), (3, "empty")])
def test_section_roundtrip(seed, kind):
    rng = np.random.default_rng(seed)
    if kind == "rand4":
        data = rng.integers(0, 4, 300000, dtype=np.uint8).tobytes()
    elif kind == "rand256":
        data = rng.integers(0, 256, 100000, dtype=np.uint8).tobytes()
    elif kind == "runs":
        data = (rng.integers(0, 256, 2000, dtype=np.uint8).tobytes() * 100)
    else:
        data = b""
    payload = compress_section_native(data)
    assert decompress_section(payload, len(data)) == data


def test_fuzz_sections():
    rng = np.random.default_rng(77)
    for trial in range(60):
        n = int(rng.integers(0, 200000))
        k = int(rng.integers(2, 257))
        data = rng.integers(0, k, n, dtype=np.uint8).tobytes()
        payload = compress_section_native(data)
        assert decompress_section(payload, n) == data, trial


def test_archive_native_engine_fasta(ref_bin):
    data = _fasta(40, n_rec=30, max_len=8000)
    blob, _ = encode(data, EncodeOptions(engine="native"))
    plain, _ = encode(data, EncodeOptions())
    out_plain = Decoder(io.BytesIO(plain), DecodeOptions()).fasta()
    # our decoder reads it
    assert Decoder(io.BytesIO(blob), DecodeOptions()).fasta() == out_plain
    # the REFERENCE decoder reads our own entropy encoder's archive
    q = run_ref([ref_bin["unnaf"], "-c"], blob)
    assert q.returncode == 0, q.stderr
    assert q.stdout == out_plain


def test_archive_native_engine_fastq(ref_bin):
    data = _fastq(41, n_rec=400)
    blob, _ = encode(data, EncodeOptions(engine="native"))
    plain, _ = encode(data, EncodeOptions())
    want = Decoder(io.BytesIO(plain), DecodeOptions()).fastq()
    assert Decoder(io.BytesIO(blob), DecodeOptions()).fastq() == want
    q = run_ref([ref_bin["unnaf"], "-c"], blob)
    assert q.returncode == 0
    assert q.stdout == want


def test_native_engine_ratio_close_to_zstd1():
    data = _fasta(42, n_rec=40, max_len=50_000)
    blob_n, _ = encode(data, EncodeOptions(engine="native"))
    blob_z, _ = encode(data, EncodeOptions(level=1))
    assert len(blob_n) < len(blob_z) * 1.10   # within 10% of library zstd-1


def test_device_scored_compression():
    """Device match-candidate kernel + host serializer round trip."""
    from naf_tpu.codec import compress_section_device

    rng = np.random.default_rng(50)
    base = rng.integers(0, 256, 3000, dtype=np.uint8).tobytes()
    data = (base * 40) + rng.integers(0, 4, 50000, dtype=np.uint8).tobytes()
    payload = compress_section_device(data)
    assert decompress_section(payload, len(data)) == data
    # matches found: repetitive prefix should compress hard
    assert len(payload) < len(data) // 3


def test_device_scored_matches_quality():
    """Device-scored ratio is comparable to the host hash-chain ratio."""
    from naf_tpu.codec import compress_section_device

    rng = np.random.default_rng(51)
    chunks = []
    for _ in range(30):
        c = rng.integers(0, 250, int(rng.integers(500, 3000)),
                         dtype=np.uint8).tobytes()
        chunks.append(c * int(rng.integers(1, 5)))
    data = b"".join(chunks)
    dev = compress_section_device(data)
    host = compress_section_native(data)
    assert decompress_section(dev, len(data)) == data
    assert len(dev) <= len(host) * 1.25


def test_extended_plus_native_engine():
    data = _fasta(43, n_rec=15, max_len=6000)
    blob, _ = encode(data, EncodeOptions(engine="native", extended=True,
                                         block_bytes=1 << 13))
    plain, _ = encode(data, EncodeOptions())
    assert (Decoder(io.BytesIO(blob), DecodeOptions()).fasta()
            == Decoder(io.BytesIO(plain), DecodeOptions()).fasta())
