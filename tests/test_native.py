"""Property tests: native C++ scanner == numpy parser (the oracle).

The fused native scanner (naf_tpu/native/naf_native.cpp) must reproduce the
vectorized numpy parse bit-for-bit on every field, including the quirky
reference semantics (id '?'-to-seq, mask RLE framing, FASTQ error ordering).
"""

import os

import numpy as np
import pytest

from naf_tpu import native
from naf_tpu.format import constants as C
from naf_tpu.ops.mask import mask_units_from_bytes
from naf_tpu.ops.pack import pack_4bit
from naf_tpu.pipeline import parser as P

pytestmark = pytest.mark.skipif(not native.available(), reason="no native lib")


def _numpy_parse(data, fastq, seq_type, strict=False, well_formed=False):
    os.environ["NAF_TPU_NO_NATIVE"] = "1"
    try:
        native._lib_save = native._lib
        native._lib = None
        native._tried_save = native._tried
        native._tried = True  # force unavailable
        fn = P.parse_fastq if fastq else P.parse_fasta
        return fn(data, seq_type, strict=strict, well_formed=well_formed)
    finally:
        native._lib = native._lib_save
        native._tried = native._tried_save
        del os.environ["NAF_TPU_NO_NATIVE"]


def _native_parse(data, fastq, seq_type, strict=False, well_formed=False):
    fn = P.parse_fastq if fastq else P.parse_fasta
    return fn(data, seq_type, strict=strict, well_formed=well_formed,
              want_mask=True)


def _assert_equal(data, fastq, seq_type, strict=False, well_formed=False):
    err_np = err_nat = None
    try:
        a = _numpy_parse(data, fastq, seq_type, strict, well_formed)
    except P.InputError as e:
        err_np = str(e)
    try:
        b = _native_parse(data, fastq, seq_type, strict, well_formed)
    except P.InputError as e:
        err_nat = str(e)
    assert err_np == err_nat, (err_np, err_nat, data[:200])
    if err_np is not None:
        return
    assert a.n_sequences == b.n_sequences, data[:200]
    assert a.ids_blob == b.ids_blob, data[:200]
    assert a.comments_blob == b.comments_blob, data[:200]
    assert a.seq.tobytes() == b.seq.tobytes(), data[:200]
    assert a.qual.tobytes() == b.qual.tobytes(), data[:200]
    assert np.array_equal(a.lengths, b.lengths), data[:200]
    assert a.longest_line == b.longest_line, data[:200]
    for f in ("unexpected_id", "unexpected_comment", "unexpected_seq",
              "unexpected_qual"):
        assert np.array_equal(getattr(a, f), getattr(b, f)), (f, data[:200])
    # packed / mask vs the op-level oracles over the parsed stream
    if seq_type <= C.SEQ_TYPE_RNA and b.packed is not None:
        packed, carry = pack_4bit(a.seq)
        if carry is not None:
            packed = np.concatenate([packed, np.asarray([carry], np.uint8)])
        assert packed.tobytes() == b.packed.tobytes(), data[:200]
    if b.mask_units is not None:
        assert mask_units_from_bytes(a.seq).tobytes() == b.mask_units.tobytes()


FASTA_CASES = [
    b">a\nACGT\n",
    b">a desc here\nacgtACGT\nNNNN\n>b\n\n>c x\nTTTT",
    b">\n\n",
    b">a\r\nAC GT\r\n>b\tcomment\nacgt",
    b">x\nACGT\n>y\n>z\nA",
    b">m\naaaaAAAAaaaa\n",
    b">weird\x01id\nACGT\n",          # unexpected char in id -> '?' to seq
    b">a\nAC>GT\n",                   # mid-line '>'
    b">a\nACGT\n\n\n>b\nGG\n",
]


@pytest.mark.parametrize("seq_type", [0, 1, 2, 3])
@pytest.mark.parametrize("i", range(len(FASTA_CASES)))
def test_fasta_cases(i, seq_type):
    _assert_equal(FASTA_CASES[i], False, seq_type)


@pytest.mark.parametrize("wf", [False, True])
def test_fasta_wf(wf):
    _assert_equal(b">a x\nACGT\nGGGG\n>b\nTT\n", False, 0, well_formed=wf)


FASTQ_CASES = [
    b"@r1\nACGT\n+\nIIII\n",
    b"@r1 c\nACGT\n+junk\nII!I\n@r2\nGG\n+\nII\n",
    b"@r1\nACGT\n+\nII\n",             # length mismatch
    b"@r1\nACGT\n+\n",                 # truncated: no quality
    b"@r1\nACGT\n",                    # truncated: no '+' line
    b"@r1\n",                          # truncated: no sequence data
    b"@r1\nACGT\nIIII\nIIII\n",        # missing '+'
    b"@r1\nACGT\n+\nIIII\nX",          # junk instead of '@'
    b"@r1\nAC GT\n+\nII II\n",         # spaces dropped in robust mode
    b"@r1\r\nACGT\r\n+\r\nIIII\r\n",
    b"@r1\nACGT\n+\n!!!!\n\n\n@r2\nA\n+\nJ\n",
]


@pytest.mark.parametrize("i", range(len(FASTQ_CASES)))
def test_fastq_cases(i):
    _assert_equal(FASTQ_CASES[i], True, 0)


@pytest.mark.parametrize("i", [0, 1])
def test_fastq_wf(i):
    _assert_equal(FASTQ_CASES[i], True, 0, well_formed=True)


def test_fastq_wf_rejects_sloppy():
    _assert_equal(b"@r1\nACGT\n+x\nIIII\n", True, 0, well_formed=True)


@pytest.mark.parametrize("strict", [False, True])
@pytest.mark.parametrize("seq_type", [0, 2])
def test_strict(strict, seq_type):
    _assert_equal(b">a\x02b\nAC\x7fGT\n", False, seq_type, strict=strict)
    _assert_equal(b"@a\nAC\x7fG\n+\nI\x03II\n", True, seq_type, strict=strict)


def test_fuzz_fasta():
    rng = np.random.default_rng(7)
    alphabet = np.frombuffer(
        b"ACGTacgtNnRYKM->\n\r \t@+IX\x01\xff", np.uint8)
    for trial in range(40):
        n = int(rng.integers(0, 400))
        body = rng.choice(alphabet, size=n).tobytes()
        data = b">" + body
        for st in (0, 3):
            _assert_equal(data, False, st)


def test_fuzz_fastq():
    rng = np.random.default_rng(11)
    for trial in range(40):
        recs = []
        for r in range(int(rng.integers(1, 6))):
            ln = int(rng.integers(0, 30))
            seq = rng.choice(np.frombuffer(b"ACGTacgtN \x05", np.uint8),
                             size=ln).tobytes()
            qlen = ln if rng.random() < 0.8 else int(rng.integers(0, 30))
            qual = rng.choice(np.frombuffer(b"IJK!~ \x02", np.uint8),
                              size=qlen).tobytes()
            recs.append(b"@r%d some c\n%s\n+\n%s\n" % (r, seq, qual))
        _assert_equal(b"".join(recs), True, 0)


def test_fuzz_random_bytes():
    rng = np.random.default_rng(13)
    for trial in range(30):
        n = int(rng.integers(1, 300))
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        for prefix, fastq in ((b">", False), (b"@", True)):
            _assert_equal(prefix + data, fastq, 0)


# ---------------------------------------------------------------------------
# multithreaded paths == sequential paths on large inputs
# ---------------------------------------------------------------------------

def _big_fasta(seed=0, mb=4, rec_kb=64, line=61):
    rng = np.random.default_rng(seed)
    total = mb << 20
    out = []
    i = 0
    made = 0
    while made < total:
        ln = min(rec_kb << 10, total - made)
        seq = rng.choice(np.frombuffer(b"ACGTacgtNnRyKm-", np.uint8), size=ln)
        pad = (-ln) % line
        seq2 = np.concatenate([seq, np.full(pad, ord("A"), np.uint8)])
        body = seq2.reshape(-1, line)
        wrapped = np.concatenate(
            [body, np.full((body.shape[0], 1), ord("\n"), np.uint8)], axis=1
        ).reshape(-1)
        out.append(b">r%d comment here\n" % i + wrapped.tobytes())
        made += ln
        i += 1
    return b"".join(out)


def _scan(data, threads):
    return native.scan(data, fastq=False, seq_type=0, strict=False,
                       well_formed=False, do_mask=True, do_upper=False,
                       marker_pos=0, threads=threads)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_scan_mt_matches_st(seed):
    data = _big_fasta(seed)
    a = _scan(data, 1)
    b = _scan(data, 4)
    assert a.seq.tobytes() == b.seq.tobytes()
    assert a.packed.tobytes() == b.packed.tobytes()
    assert a.ids_blob == b.ids_blob
    assert a.comments_blob == b.comments_blob
    assert np.array_equal(a.lengths, b.lengths)
    assert a.mask_units.tobytes() == b.mask_units.tobytes()
    assert a.longest_line == b.longest_line
    assert np.array_equal(a.unexpected_seq, b.unexpected_seq)


def test_scan_mt_masked_boundaries():
    # long all-lowercase and all-uppercase records force carry coalescing
    recs = []
    for i in range(40):
        ch = b"acgt" if i % 2 else b"ACGT"
        recs.append(b">x%d\n" % i + ch * 30000 + b"\n")
    data = b"".join(recs)
    a, b = _scan(data, 1), _scan(data, 6)
    assert a.mask_units.tobytes() == b.mask_units.tobytes()
    assert a.packed.tobytes() == b.packed.tobytes()


def _render_args(scan, line_len=70, mode=native.MODE_FASTA):
    lengths = scan.lengths.astype(np.uint64)
    # convert scan outputs to decode inputs: ids/comments blobs as produced
    total = int(scan.seq.size)
    return dict(
        seq_data=scan.packed, total_chars=total, is_packed=True,
        is_rna=False, do_upper=False, mask_units=scan.mask_units,
        lengths=lengths, ids_blob=scan.ids_blob,
        comments_blob=scan.comments_blob, qual=None, name_sep=32,
        line_len=line_len,
        out_capacity=total * 2 + len(scan.ids_blob) + len(scan.comments_blob)
        + (1 << 20),
    )


@pytest.mark.parametrize("mode", [native.MODE_FASTA, native.MODE_SEQUENCES,
                                  native.MODE_SEQ])
@pytest.mark.parametrize("line_len", [60, 0])
def test_render_mt_matches_st(mode, line_len):
    data = _big_fasta(3)
    s = _scan(data, 1)
    args = _render_args(s, line_len=line_len)
    a = native.render(mode, threads=1, **args)
    b = native.render(mode, threads=4, **args)
    assert a == b


def test_render_mt_charcount():
    data = _big_fasta(4)
    s = _scan(data, 1)
    args = _render_args(s)
    a = native.render(native.MODE_CHARCOUNT, threads=1, **args)
    b = native.render(native.MODE_CHARCOUNT, threads=4, **args)
    assert np.array_equal(a, b)


def test_render_mt_fastq():
    rng = np.random.default_rng(9)
    recs = []
    for i in range(3000):
        ln = int(rng.integers(50, 150))
        seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=ln).tobytes()
        qual = rng.choice(np.frombuffer(b"IJKF#", np.uint8), size=ln).tobytes()
        recs.append(b"@read%d x\n%s\n+\n%s\n" % (i, seq, qual))
    data = b"".join(recs)
    s = native.scan(data, fastq=True, seq_type=0, strict=False,
                    well_formed=False, do_mask=False, do_upper=False,
                    marker_pos=0)
    total = int(s.seq.size)
    args = dict(seq_data=s.packed, total_chars=total, is_packed=True,
                is_rna=False, do_upper=False, mask_units=None,
                lengths=s.lengths.astype(np.uint64), ids_blob=s.ids_blob,
                comments_blob=s.comments_blob, qual=s.qual, name_sep=32,
                line_len=0, out_capacity=total * 3 + (2 << 20))
    a = native.render(native.MODE_FASTQ, threads=1, **args)
    b = native.render(native.MODE_FASTQ, threads=4, **args)
    assert a == b


def _big_fastq(seed=0, n_rec=60000, with_at_in_qual=True):
    rng = np.random.default_rng(seed)
    recs = []
    qalpha = np.frombuffer(b"IJKF#@ABC!~", np.uint8) if with_at_in_qual \
        else np.frombuffer(b"IJKF#", np.uint8)
    for i in range(n_rec):
        ln = int(rng.integers(30, 120))
        seq = rng.choice(np.frombuffer(b"ACGTacgtNn", np.uint8),
                         size=ln).tobytes()
        qual = rng.choice(qalpha, size=ln).tobytes()
        recs.append(b"@read%d c%d\n%s\n+\n%s\n" % (i, i, seq, qual))
    return b"".join(recs)


@pytest.mark.parametrize("at_qual", [False, True])
def test_fastq_scan_mt_matches_st(at_qual):
    # '@' inside quality strings stresses the speculative-split verification
    data = _big_fastq(31, with_at_in_qual=at_qual)
    assert len(data) > (1 << 21)
    a = native.scan(data, fastq=True, seq_type=0, strict=False,
                    well_formed=False, do_mask=True, do_upper=False,
                    marker_pos=0, threads=1)
    b = native.scan(data, fastq=True, seq_type=0, strict=False,
                    well_formed=False, do_mask=True, do_upper=False,
                    marker_pos=0, threads=4)
    assert a.seq.tobytes() == b.seq.tobytes()
    assert a.packed.tobytes() == b.packed.tobytes()
    assert a.qual.tobytes() == b.qual.tobytes()
    assert a.ids_blob == b.ids_blob
    assert a.comments_blob == b.comments_blob
    assert np.array_equal(a.lengths, b.lengths)
    assert a.mask_units.tobytes() == b.mask_units.tobytes()
    assert a.longest_line == b.longest_line
    for f in ("unexpected_id", "unexpected_comment", "unexpected_seq",
              "unexpected_qual"):
        assert np.array_equal(getattr(a, f), getattr(b, f))


def test_fastq_scan_mt_qual_line_starting_with_at():
    # a quality line whose FIRST byte is '@' after an EOL is a false
    # candidate cut: verification must reject it and fall back
    rec = b"@r%d\n" + b"ACGT" * 20 + b"\n+\n" + b"@" + b"I" * 79 + b"\n"
    data = b"".join(rec % i for i in range(40000))
    assert len(data) > (1 << 21)
    a = native.scan(data, fastq=True, seq_type=0, strict=False,
                    well_formed=False, do_mask=False, do_upper=False,
                    marker_pos=0, threads=1)
    b = native.scan(data, fastq=True, seq_type=0, strict=False,
                    well_formed=False, do_mask=False, do_upper=False,
                    marker_pos=0, threads=4)
    assert a.qual.tobytes() == b.qual.tobytes()
    assert np.array_equal(a.lengths, b.lengths)
    assert a.ids_blob == b.ids_blob


def test_fastq_scan_mt_errors_match():
    data = _big_fastq(33, n_rec=40000)
    bad = data + b"@oops\nACGT\n+\nII\n"
    for threads in (1, 4):
        with pytest.raises(native.NativeScanError) as e:
            native.scan(bad, fastq=True, seq_type=0, strict=False,
                        well_formed=False, do_mask=False, do_upper=False,
                        marker_pos=0, threads=threads)
        assert e.value.code == 14
        assert e.value.record == 40001


# ---------------------------------------------------------------------------
# Tiled render (exact-size path): edge semantics and tile-boundary crossing
# ---------------------------------------------------------------------------

def test_render_tiled_masked_roundtrip():
    """Masked records spanning several 256 KB render tiles round-trip exactly."""
    import io

    from naf_tpu.pipeline.decoder import DecodeOptions, Decoder
    from naf_tpu.pipeline.encoder import EncodeOptions, encode

    rng = np.random.default_rng(11)
    recs = []
    for i in range(3):
        ln = 700_007  # > 2 tiles per record, odd (nibble parity)
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=ln)
        for s in rng.integers(0, ln - 500, size=400):
            seq[s:s + 500] |= 32  # soft-masked runs crossing tile edges
        body = seq.tobytes()
        wrapped = b"\n".join(body[j:j + 80] for j in range(0, ln, 80))
        recs.append(b">rec%d tile crossing\n%s\n" % (i, wrapped))
    data = b"".join(recs)
    blob, _ = encode(data, EncodeOptions(level=1))
    out = Decoder(io.BytesIO(blob), DecodeOptions()).fasta()
    assert out == data


@pytest.mark.parametrize("line_len", [0, 5, 70])
def test_render_size_spill_and_clamp(line_len):
    """naf_render's internal exact-size precomputation must survive the spill
    (sum(lengths) < total) and clamp (sum(lengths) > total) quirks; render
    asserts w == naf_render_size, so a mismatch raises."""
    seq = np.frombuffer(b"ACGTACGTACGTACGTACGTA", np.uint8)  # 21 chars (odd)
    packed, carry = pack_4bit(seq)
    if carry is not None:
        packed = np.concatenate([packed, [np.uint8(carry)]])
    ids = b"a\0b\0c\0"
    comments = b"x\0\0y\0"
    for lengths in ([7, 7, 7], [5, 5, 5], [10, 10, 10], [0, 21, 0], [21, 0, 0]):
        out = native.render(
            native.MODE_FASTA, seq_data=packed, total_chars=21,
            is_packed=True, is_rna=False, do_upper=False, mask_units=None,
            lengths=np.asarray(lengths, np.uint64), ids_blob=ids,
            comments_blob=comments, qual=None, name_sep=32,
            line_len=line_len, out_capacity=4096)
        assert isinstance(out, bytes) and out.count(b">") == 3


def test_render_size_fastq_short_quality():
    seq = np.frombuffer(b"ACGTACGT", np.uint8)
    packed, carry = pack_4bit(seq)
    assert carry is None
    out = native.render(
        native.MODE_FASTQ, seq_data=packed, total_chars=8,
        is_packed=True, is_rna=False, do_upper=False, mask_units=None,
        lengths=np.asarray([4, 4], np.uint64), ids_blob=b"r1\0r2\0",
        comments_blob=b"\0\0", qual=np.frombuffer(b"IIIII", np.uint8),
        name_sep=32, line_len=0, out_capacity=4096)
    # quality exhausted after 5 chars: second record's qual line is short
    assert out == b"@r1\nACGT\n+\nIIII\n@r2\nACGT\n+\nI\n"
