"""Streaming encoder == in-memory encoder, byte-identical archives."""

import io

import numpy as np
import pytest

from naf_tpu.format import constants as C
from naf_tpu.pipeline.encoder import EncodeOptions, encode
from naf_tpu.pipeline.parser import InputError
from naf_tpu.pipeline.stream import encode_stream


def _stream(data: bytes, opts=None, chunk=1 << 16):
    out = io.BytesIO()
    stats = encode_stream(io.BytesIO(data), out, opts, chunk_size=chunk)
    return out.getvalue(), stats


def _fasta(seed=0, n_rec=30, max_len=5000):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n_rec):
        ln = int(rng.integers(0, max_len))
        seq = rng.choice(np.frombuffer(b"ACGTacgtNnRy-", np.uint8), size=ln)
        body = seq.tobytes()
        lines = [body[k:k + 61] for k in range(0, len(body), 61)] or [b""]
        recs.append(b">rec%d some description %d\n" % (i, i)
                    + b"\n".join(lines) + b"\n")
    return b"".join(recs)


def _fastq(seed=0, n_rec=500):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n_rec):
        ln = int(rng.integers(1, 400))
        seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=ln).tobytes()
        qual = rng.choice(np.frombuffer(b"IJ#F~!", np.uint8), size=ln).tobytes()
        recs.append(b"@read%d c%d\n%s\n+\n%s\n" % (i, i, seq, qual))
    return b"".join(recs)


@pytest.mark.parametrize("chunk", [1 << 12, 1 << 16, 1 << 22])
def test_fasta_stream_identical(chunk):
    data = _fasta(0)
    blob, stats = encode(data, EncodeOptions())
    sblob, sstats = _stream(data, EncodeOptions(), chunk=chunk)
    assert sblob == blob
    assert sstats.n_sequences == stats.n_sequences
    assert sstats.longest_line == stats.longest_line
    assert np.array_equal(sstats.unexpected_seq, stats.unexpected_seq)


def test_fasta_stream_masked_runs():
    # long case runs spanning chunk boundaries stress the mask carry
    recs = []
    for i in range(20):
        ch = b"acgt" if i % 2 else b"ACGT"
        recs.append(b">m%d\n" % i + (ch * 5000) + b"\n")
    data = b"".join(recs)
    blob, _ = encode(data, EncodeOptions())
    sblob, _ = _stream(data, chunk=1 << 13)
    assert sblob == blob


def test_fasta_giant_record_cont():
    # one record much larger than the chunk: CONT_SEQ path
    rng = np.random.default_rng(5)
    seq = rng.choice(np.frombuffer(b"ACGTacgtNn", np.uint8), size=300_000)
    body = seq.tobytes()
    lines = b"\n".join(body[k:k + 70] for k in range(0, len(body), 70))
    data = b">giant chromosome\n" + lines + b"\n>tail\nACGT\n"
    blob, stats = encode(data, EncodeOptions())
    sblob, sstats = _stream(data, chunk=1 << 14)
    assert sblob == blob
    assert sstats.n_sequences == stats.n_sequences == 2
    assert sstats.longest_line == stats.longest_line


def test_fasta_giant_record_odd_parity():
    # odd-length lines force the nibble carry across CONT chunks
    rng = np.random.default_rng(6)
    seq = rng.choice(np.frombuffer(b"ACGTacgt", np.uint8), size=100_001)
    body = seq.tobytes()
    lines = b"\n".join(body[k:k + 61] for k in range(0, len(body), 61))
    data = b">odd\n" + lines + b"\n"
    blob, _ = encode(data, EncodeOptions())
    sblob, _ = _stream(data, chunk=1 << 13)
    assert sblob == blob


@pytest.mark.parametrize("seq_type,no_mask", [
    (C.SEQ_TYPE_DNA, True), (C.SEQ_TYPE_RNA, False),
    (C.SEQ_TYPE_PROTEIN, False), (C.SEQ_TYPE_TEXT, True),
])
def test_fasta_stream_modes(seq_type, no_mask):
    data = _fasta(1, n_rec=10, max_len=3000)
    opts = EncodeOptions(seq_type=seq_type, no_mask=no_mask)
    blob, _ = encode(data, opts)
    opts2 = EncodeOptions(seq_type=seq_type, no_mask=no_mask)
    sblob, _ = _stream(data, opts2, chunk=1 << 13)
    assert sblob == blob


@pytest.mark.parametrize("chunk", [1 << 12, 1 << 15])
def test_fastq_stream_identical(chunk):
    data = _fastq(2)
    blob, stats = encode(data, EncodeOptions())
    sblob, sstats = _stream(data, chunk=chunk)
    assert sblob == blob
    assert sstats.n_sequences == stats.n_sequences


def test_fastq_stream_unexpected_chars():
    data = b"".join(
        b"@r%d\nAC\x05GT\n+\nII\x02II\n" % i for i in range(2000))
    blob, stats = encode(data, EncodeOptions())
    sblob, sstats = _stream(data, chunk=1 << 12)
    assert sblob == blob
    assert np.array_equal(sstats.unexpected_seq, stats.unexpected_seq)
    assert np.array_equal(sstats.unexpected_qual, stats.unexpected_qual)


def test_fastq_stream_error_record_offset():
    good = b"".join(b"@r%d\nACGT\n+\nIIII\n" % i for i in range(1000))
    bad = good + b"@oops\nACGT\n+\nII\n"
    with pytest.raises(InputError) as ei:
        encode(bad, EncodeOptions())
    with pytest.raises(InputError) as es:
        _stream(bad, chunk=1 << 12)
    assert str(es.value) == str(ei.value)
    assert "1001" in str(es.value)


def test_fastq_truncation_error_matches():
    data = b"".join(b"@r%d\nACGT\n+\nIIII\n" % i for i in range(500))
    for tail in (b"@last\nACGT\n", b"@last\nACGT\n+\n", b"@last\n"):
        bad = data + tail
        with pytest.raises(InputError) as ei:
            encode(bad, EncodeOptions())
        with pytest.raises(InputError) as es:
            _stream(bad, chunk=1 << 12)
        assert str(es.value) == str(ei.value)


def test_empty_input():
    blob, _ = encode(b"", EncodeOptions())
    sblob, _ = _stream(b"")
    assert sblob == blob


def test_stream_decodes_with_reference(ref_bin):
    from conftest import run_ref
    data = _fasta(7)
    sblob, _ = _stream(data, chunk=1 << 14)
    q = run_ref([ref_bin["unnaf"], "-c"], sblob)
    assert q.returncode == 0
    from naf_tpu.pipeline.decoder import Decoder, DecodeOptions
    assert Decoder(io.BytesIO(sblob), DecodeOptions()).fasta() == q.stdout


# ---------------------------------------------------------------------------
# streaming decode == whole-buffer decode
# ---------------------------------------------------------------------------

def _roundtrip_stream_fasta(data, batch, use_mask=True, line_length=None):
    from naf_tpu.pipeline.decoder import Decoder, DecodeOptions
    blob, _ = encode(data, EncodeOptions())
    opts = DecodeOptions(use_mask=use_mask, line_length=line_length)
    whole = Decoder(io.BytesIO(blob), opts).fasta()
    out = io.BytesIO()
    Decoder(io.BytesIO(blob), opts).stream_fasta(out, batch_chars=batch)
    return whole, out.getvalue()


@pytest.mark.parametrize("batch", [100, 4096, 1 << 22])
def test_stream_decode_fasta(batch):
    data = _fasta(10, n_rec=40, max_len=3001)   # odd lengths: nibble offsets
    whole, streamed = _roundtrip_stream_fasta(data, batch)
    assert streamed == whole


def test_stream_decode_fasta_masked_spans():
    recs = []
    for i in range(30):
        ch = b"acgt" if i % 2 else b"ACGT"
        recs.append(b">m%d\n" % i + ch * 701 + b"\n")   # odd char counts
    data = b"".join(recs)
    for batch in (64, 997, 1 << 20):
        whole, streamed = _roundtrip_stream_fasta(data, batch)
        assert streamed == whole


def test_stream_decode_fasta_no_mask():
    data = _fasta(11, n_rec=10, max_len=500)
    whole, streamed = _roundtrip_stream_fasta(data, 512, use_mask=False)
    assert streamed == whole


def test_stream_decode_fasta_empty_records():
    data = b">a\n>b\nACGT\n>c\n>d\nGG\n"
    whole, streamed = _roundtrip_stream_fasta(data, 2)
    assert streamed == whole


@pytest.mark.parametrize("batch", [97, 8192])
def test_stream_decode_fastq(batch):
    from naf_tpu.pipeline.decoder import Decoder, DecodeOptions
    data = _fastq(12, n_rec=300)
    blob, _ = encode(data, EncodeOptions())
    whole = Decoder(io.BytesIO(blob), DecodeOptions()).fastq()
    out = io.BytesIO()
    Decoder(io.BytesIO(blob), DecodeOptions()).stream_fastq(
        out, batch_chars=batch)
    assert out.getvalue() == whole


def test_spill_to_temp_dir(tmp_path):
    """Sections beyond the spill threshold stream through temp files."""
    from naf_tpu.pipeline.encoder import EncodeOptions, encode

    data = _fasta(60, n_rec=20, max_len=30_000)
    opts = EncodeOptions(temp_dir=str(tmp_path), temp_name="t")
    # tiny threshold forces every section through the spill path
    from naf_tpu.pipeline import stream as S
    from naf_tpu.codec import SpillingSectionCompressor

    orig = S._SectionSet.__init__

    def patched(self, o):
        lvl, th = o.level, o.threads

        def make(section, window_log=0):
            return SpillingSectionCompressor(
                lvl, window_log=window_log, threads=th,
                temp_dir=str(tmp_path), name="t", section=section,
                threshold=64)
        self.ids = make("ids"); self.comments = make("comm")
        self.lengths = make("len"); self.mask = make("mask")
        self.seq = make("seq", o.long_window_log); self.qual = make("qual")

    S._SectionSet.__init__ = patched
    try:
        out = io.BytesIO()
        S.encode_stream(io.BytesIO(data), out, opts, chunk_size=1 << 14)
        sblob = out.getvalue()
    finally:
        S._SectionSet.__init__ = orig
    blob, _ = encode(data, EncodeOptions())
    assert sblob == blob
    # spill files were cleaned up after assembly
    assert not list(tmp_path.glob("t.*"))


def test_keep_temp_files(tmp_path):
    from naf_tpu.codec import SpillingSectionCompressor, decompress_section

    sc = SpillingSectionCompressor(1, temp_dir=str(tmp_path), name="x",
                                   section="seq", threshold=16, keep=True)
    # payloads under one staging unit (4 MB) compress one-shot in RAM like
    # the reference's lazy temp files ("small data never touches disk",
    # compressor.c:51-61); incompressible data past it must spill
    data = np.random.default_rng(0).integers(
        0, 256, 6 << 20, dtype=np.uint8).tobytes()
    sc.write(data)
    payload = sc.finish()
    assert (tmp_path / "x.seq").exists()
    buf = io.BytesIO()
    payload.copy_into(buf)
    assert decompress_section(buf.getvalue(), len(data)) == data
    assert (tmp_path / "x.seq").exists()   # kept


def test_mt_byte_identity_giant_record_across_chunk_sizes():
    """zstd MT frames must not depend on feed granularity: a single record
    larger than the chunk produces one-big-write vs chunked-write feed
    patterns, which raw zstd MT encodes differently; the SectionCompressor
    staging normalizes this (in-memory == streaming at every chunk size)."""
    import io

    import numpy as np

    from naf_tpu.pipeline.encoder import EncodeOptions, encode
    from naf_tpu.pipeline.stream import encode_stream

    rng = np.random.default_rng(3)
    seq = rng.choice(np.frombuffer(b"ACGTacgt", np.uint8),
                     size=(6 << 20) - ((6 << 20) % 80))
    body = seq.reshape(-1, 80)
    out = np.concatenate(
        [body, np.full((body.shape[0], 1), 10, np.uint8)], axis=1)
    data = b">chr1 test\n" + out.tobytes()

    blobs = []
    for cs in (1 << 20, 4 << 20):
        o = io.BytesIO()
        encode_stream(io.BytesIO(data), o,
                      EncodeOptions(level=1, threads=2), chunk_size=cs)
        blobs.append(o.getvalue())
    mem, _ = encode(data, EncodeOptions(level=1, threads=2))
    assert blobs[0] == blobs[1] == mem
