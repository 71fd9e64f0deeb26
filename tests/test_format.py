"""Unit tests: VLE codec, container header/section framing, zstd sections."""

import io

import numpy as np
import pytest

from naf_tpu.codec import compress_section, decompress_section
from naf_tpu.format import (
    NafArchive, NafHeader, NafReader, Section, naf_bytes,
    SEQ_TYPE_PROTEIN, VleError, decode_vle, encode_vle, read_vle,
)


@pytest.mark.parametrize("v", [0, 1, 127, 128, 129, 300, 2**14, 2**21 - 1,
                               2**32, 2**63 - 1, 123456789012345])
def test_vle_roundtrip(v):
    b = encode_vle(v)
    got, pos = decode_vle(b)
    assert got == v and pos == len(b)
    assert read_vle(io.BytesIO(b)) == v


def test_vle_minimal_length():
    assert encode_vle(0) == b"\x00"
    assert encode_vle(127) == b"\x7f"
    assert encode_vle(128) == b"\x81\x00"     # MSB-limb-first base 128


def test_vle_rejects_leading_0x80():
    with pytest.raises(VleError):
        decode_vle(b"\x80\x01")


def test_vle_overflow():
    with pytest.raises(VleError):
        decode_vle(b"\xff" * 10 + b"\x7f")


def test_zstd_section_roundtrip():
    data = b"ACGT" * 1000
    payload = compress_section(data, level=3)
    assert decompress_section(payload, len(data)) == data
    # magic is stripped
    assert not payload.startswith(bytes((0x28, 0xB5, 0x2F, 0xFD)))


def test_container_roundtrip():
    secs = {
        k: Section(uncompressed_size=10, payload=compress_section(b"x" * 10))
        for k in ("ids", "comments", "lengths", "mask", "sequence")
    }
    h = NafHeader(line_length=80, n_sequences=3)
    blob = naf_bytes(NafArchive(header=h, sections=secs))
    r = NafReader(io.BytesIO(blob))
    assert r.header.seq_type == 0
    assert r.header.has_mask and not r.header.has_quality
    assert r.line_length == 80 and r.n_sequences == 3
    u, payload = r.load_section("lengths")     # skips ids+comments
    assert u == 10
    assert decompress_section(payload, 10) == b"x" * 10
    u2, _ = r.load_section("sequence")         # skips mask
    assert u2 == 10


def test_container_v2_seq_type():
    secs = {k: Section(10, compress_section(b"y" * 10))
            for k in ("ids", "comments", "lengths", "sequence")}
    h = NafHeader(format_version=2, seq_type=SEQ_TYPE_PROTEIN, has_mask=False)
    blob = naf_bytes(NafArchive(header=h, sections=secs))
    r = NafReader(io.BytesIO(blob))
    assert r.header.seq_type == SEQ_TYPE_PROTEIN
    assert r.header.format_version == 2


# ---------------------------------------------------------------------------
# system-libzstd encode backend (codec/syszstd.py)
# ---------------------------------------------------------------------------

def _have_syszstd():
    from naf_tpu.codec import syszstd

    return syszstd.load() is not None


@pytest.mark.skipif(not _have_syszstd(), reason="no system libzstd")
@pytest.mark.parametrize("level", [-131072, -5, 1, 9, 19, 22])
def test_syszstd_levels_roundtrip(level):
    """Every CLI-reachable level produces a frame zstandard decodes."""
    from naf_tpu.codec import decompress_section

    data = (b"ACGTacgtNRYKM" * 5000)[: 60_001]
    payload = compress_section(data, level=level)
    assert decompress_section(payload, len(data)) == data


@pytest.mark.skipif(not _have_syszstd(), reason="no system libzstd")
def test_syszstd_streaming_matches_oneshot_rule():
    """Payload size alone decides the frame (in-memory == many tiny writes),
    on both sides of the one-shot/streaming cutover."""
    from naf_tpu.codec import SectionCompressor

    rng = np.random.default_rng(3)
    for n in (1 << 16, (4 << 20) + 4096):     # below / above the cutover
        data = rng.integers(0, 16, n, dtype=np.uint8)
        a = SectionCompressor(19, threads=2)
        a.write(data)
        one = a.finish()
        b = SectionCompressor(19, threads=2)
        for off in range(0, n, 65537):
            b.write(data[off:off + 65537])
        many = b.finish()
        assert one == many


@pytest.mark.skipif(not _have_syszstd(), reason="no system libzstd")
def test_syszstd_ldm_window_roundtrip():
    """--long path: LDM + explicit windowLog through the system library."""
    from naf_tpu.codec import decompress_section

    rng = np.random.default_rng(4)
    unit = rng.integers(0, 256, 1 << 20, dtype=np.uint8).tobytes()
    data = unit + b"\x00" * (1 << 20) + unit      # long-range repeat
    payload = compress_section(data, level=19, window_log=24, threads=2)
    assert decompress_section(payload, len(data)) == data
    assert len(payload) < len(unit) * 1.2         # the repeat was found
