"""Cross-validation against the reference ennaf/unnaf binaries.

For every (fixture, encode options, output type) combination from the
reference's own golden suites (tests/alphabet, tests/charcount, tests/small)
plus randomized inputs, we assert:

  A. the reference `unnaf` decodes OUR archive to the same bytes as it
     decodes its own archive (format compatibility + normalization parity);
  B. our decoder on the REFERENCE archive matches reference output;
  C. our decoder on our own archive matches too (round trip);
  D. our unexpected-character stderr report matches the reference's.
"""

from __future__ import annotations

import io
import subprocess
from pathlib import Path

import numpy as np
import pytest

from naf_tpu.format import constants as C
from naf_tpu.ops.histogram import format_unexpected_report
from naf_tpu.pipeline.decoder import Decoder, DecodeOptions
from naf_tpu.pipeline.encoder import EncodeOptions, encode
from naf_tpu.pipeline.parser import InputError

from conftest import REF, run_ref

ALPHABET_FA = (REF / "tests/alphabet/a.fa").read_bytes() if (REF / "tests/alphabet/a.fa").exists() else b""

SMALL = REF / "tests" / "small"

TYPE_FLAG = {
    C.SEQ_TYPE_DNA: "--dna", C.SEQ_TYPE_RNA: "--rna",
    C.SEQ_TYPE_PROTEIN: "--protein", C.SEQ_TYPE_TEXT: "--text",
}


def ref_encode(ref_bin, data: bytes, args: list[str]):
    return run_ref([ref_bin["ennaf"], *args, "-c"], data)


def ref_decode(ref_bin, archive: bytes, args: list[str]):
    return run_ref([ref_bin["unnaf"], *args, "-c"], archive)


def our_decode(archive: bytes, out: str, use_mask=True) -> bytes:
    d = Decoder(io.BytesIO(archive), DecodeOptions(use_mask=use_mask))
    return getattr(d, out)()


def report_from_stats(stats, seq_type) -> str:
    chunks = []
    for counts, name in (
        (stats.unexpected_id, "id"),
        (stats.unexpected_comment, "comment"),
        (stats.unexpected_seq, C.SEQ_TYPE_NAMES[seq_type]),
        (stats.unexpected_qual, "quality"),
    ):
        if counts is not None:
            chunks.append(format_unexpected_report(counts, name))
    return "".join(chunks)


def check_parity(ref_bin, data: bytes, seq_type=C.SEQ_TYPE_DNA, *,
                 enc_extra: list[str] = [], no_mask_enc=False,
                 out_flag="", out_method="fasta", use_mask=True,
                 well_formed=False, fastq=False):
    enc_args = [TYPE_FLAG[seq_type], *enc_extra]
    if no_mask_enc:
        enc_args.append("--no-mask")
    if well_formed:
        enc_args.append("--well-formed")
    rp = ref_encode(ref_bin, data, enc_args)
    opts = EncodeOptions(seq_type=seq_type, no_mask=no_mask_enc,
                         well_formed=well_formed)
    if rp.returncode != 0:
        # reference died: our encoder must die with the same message
        with pytest.raises(InputError) as ei:
            encode(data, opts)
        ref_msg = rp.stderr.decode("latin-1").replace("ennaf error: ", "").strip()
        assert str(ei.value) == ref_msg
        return
    ref_archive = rp.stdout

    our_archive, stats = encode(data, opts)

    dec_args = [out_flag] if out_flag else []
    if not use_mask:
        dec_args.append("--no-mask")
    expected = ref_decode(ref_bin, ref_archive, dec_args)
    assert expected.returncode == 0, expected.stderr

    # A: reference decodes our archive identically
    got_a = ref_decode(ref_bin, our_archive, dec_args)
    assert got_a.returncode == 0, got_a.stderr
    assert got_a.stdout == expected.stdout, f"ref-decode-of-ours mismatch ({out_flag})"

    # B/C: our decoder on both archives
    got_b = our_decode(ref_archive, out_method, use_mask=use_mask)
    assert got_b == expected.stdout, f"our-decode-of-ref mismatch ({out_method})"
    got_c = our_decode(our_archive, out_method, use_mask=use_mask)
    assert got_c == expected.stdout, f"our-decode-of-ours mismatch ({out_method})"

    # D: stderr report parity
    if not well_formed:
        ours_err = report_from_stats(stats, seq_type)
        ref_err = rp.stderr.decode("latin-1")
        assert ours_err == ref_err, f"stderr mismatch:\nref={ref_err!r}\nours={ours_err!r}"


# ---------------------------------------------------------------------------
# alphabet suite: every byte class crossed over types/outputs/masking
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seq_type", list(TYPE_FLAG))
@pytest.mark.parametrize("out_flag,out_method", [
    ("", "fasta"), ("--seq", "seq_concat"), ("--sequences", "sequences"),
    ("--charcount", "charcount"),
])
@pytest.mark.parametrize("masking", ["masked", "no-mask-enc", "no-mask-dec"])
def test_alphabet_grid(ref_bin, seq_type, out_flag, out_method, masking):
    check_parity(
        ref_bin, ALPHABET_FA, seq_type,
        no_mask_enc=(masking == "no-mask-enc"),
        out_flag=out_flag, out_method=out_method,
        use_mask=(masking != "no-mask-dec"),
    )


@pytest.mark.parametrize("seq_type", list(TYPE_FLAG))
@pytest.mark.parametrize("out_flag,out_method", [
    ("--ids", "ids"), ("--names", "names"), ("--lengths", "lengths"),
    ("--total-length", "total_length"), ("--number", "number"),
    ("--part-list", "part_list"), ("--sizes", "part_sizes"),
    ("--format", "format_name"), ("--total-mask-length", "total_mask_length"),
])
def test_alphabet_metadata(ref_bin, seq_type, out_flag, out_method):
    check_parity(ref_bin, ALPHABET_FA, seq_type,
                 out_flag=out_flag, out_method=out_method)


@pytest.mark.parametrize("out_flag,out_method", [
    ("--mask", "mask"), ("--4bit", "four_bit"),
])
def test_alphabet_mask_and_4bit(ref_bin, out_flag, out_method):
    check_parity(ref_bin, ALPHABET_FA, C.SEQ_TYPE_DNA,
                 out_flag=out_flag, out_method=out_method)


# ---------------------------------------------------------------------------
# small suite fixtures
# ---------------------------------------------------------------------------

SMALL_FIXTURES = ["1.fa", "empty.fa", "nodata1.fa", "nodata2.fa", "nodata3.fa",
                  "nodata4.fa", "noname.fa"]


@pytest.mark.parametrize("fixture", SMALL_FIXTURES)
@pytest.mark.parametrize("out_flag,out_method", [
    ("", "fasta"), ("--seq", "seq_concat"), ("--sequences", "sequences"),
    ("--ids", "ids"), ("--names", "names"), ("--lengths", "lengths"),
])
def test_small_fixtures(ref_bin, fixture, out_flag, out_method):
    path = SMALL / fixture
    if not path.exists():
        pytest.skip(f"{fixture} missing")
    check_parity(ref_bin, path.read_bytes(), C.SEQ_TYPE_DNA,
                 out_flag=out_flag, out_method=out_method)


def test_small_no_mask(ref_bin):
    check_parity(ref_bin, (SMALL / "1.fa").read_bytes(), C.SEQ_TYPE_DNA,
                 no_mask_enc=True)


def test_small_text(ref_bin):
    check_parity(ref_bin, (SMALL / "1.fa").read_bytes(), C.SEQ_TYPE_TEXT,
                 no_mask_enc=True)


def test_empty_fastq_error(ref_bin):
    data = (SMALL / "empty.fa").read_bytes()
    # reference: empty input + --fastq flag -> empty archive, no quality
    rp = ref_encode(ref_bin, data, ["--fastq"])
    ours, _ = encode(data, EncodeOptions(in_format=C.IN_FORMAT_FASTQ))
    exp = ref_decode(ref_bin, rp.stdout, [])
    got = ref_decode(ref_bin, ours, [])
    assert got.stdout == exp.stdout


# ---------------------------------------------------------------------------
# randomized FASTA fuzz
# ---------------------------------------------------------------------------

def random_fasta(rng: np.random.Generator, n_rec: int, *, charset=b"ACGTacgtNn-",
                 max_len=200, line_len=60, comments=True, weird=False) -> bytes:
    out = []
    for i in range(n_rec):
        name = f"seq{i}".encode()
        hdr = b">" + name
        if comments and rng.random() < 0.5:
            hdr += b" comment " + str(i).encode()
        out.append(hdr + b"\n")
        ln = int(rng.integers(0, max_len))
        seq = rng.choice(np.frombuffer(charset, np.uint8), size=ln).tobytes()
        for j in range(0, ln, line_len):
            out.append(seq[j:j + line_len] + b"\n")
        if weird and rng.random() < 0.3:
            out.append(b"\n")          # stray blank line
    return b"".join(out)


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_fasta_roundtrip(ref_bin, seed):
    rng = np.random.default_rng(seed)
    data = random_fasta(rng, int(rng.integers(1, 40)), weird=(seed % 2 == 0))
    for out_flag, meth in [("", "fasta"), ("--sequences", "sequences"),
                           ("--lengths", "lengths"), ("--charcount", "charcount")]:
        check_parity(ref_bin, data, C.SEQ_TYPE_DNA, out_flag=out_flag, out_method=meth)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_fasta_binary_junk(ref_bin, seed):
    """Inputs with every byte value in sequences (validation/replacement path)."""
    rng = np.random.default_rng(100 + seed)
    rows = []
    for i in range(8):
        rows.append(b">r%d x y\n" % i)
        data = rng.integers(1, 256, size=120, dtype=np.uint8)
        # avoid '>' at line starts (they'd begin new records, fine either way)
        row = data.tobytes().replace(b"\n>", b"\nx")
        rows.append(row + b"\n")
    data = b"".join(rows)
    check_parity(ref_bin, data, C.SEQ_TYPE_DNA, out_method="fasta")
    check_parity(ref_bin, data, C.SEQ_TYPE_PROTEIN, out_method="fasta")


# ---------------------------------------------------------------------------
# FASTQ
# ---------------------------------------------------------------------------

def random_fastq(rng: np.random.Generator, n_rec: int, *, max_len=150) -> bytes:
    out = []
    for i in range(n_rec):
        ln = int(rng.integers(0, max_len))
        seq = rng.choice(np.frombuffer(b"ACGTacgtn", np.uint8), size=ln).tobytes()
        qual = rng.integers(33, 74, size=ln, dtype=np.uint8).tobytes()
        out.append(b"@read%d c%d\n" % (i, i) + seq + b"\n+\n" + qual + b"\n")
    return b"".join(out)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_fastq_roundtrip(ref_bin, seed):
    rng = np.random.default_rng(200 + seed)
    data = random_fastq(rng, int(rng.integers(1, 30)))
    for out_flag, meth in [("", "fastq"), ("--fasta", "fasta"),
                           ("--ids", "ids"), ("--lengths", "lengths")]:
        check_parity(ref_bin, data, C.SEQ_TYPE_DNA, out_flag=out_flag,
                     out_method=meth, fastq=True)


def test_fastq_quality_mismatch_dies(ref_bin):
    data = b"@r1\nACGT\n+\nIII\n"
    rp = ref_encode(ref_bin, data, ["--dna"])
    assert rp.returncode != 0
    with pytest.raises(InputError) as ei:
        encode(data, EncodeOptions())
    assert str(ei.value).encode() in rp.stderr


# ---------------------------------------------------------------------------
# well-formed mode
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(2))
def test_well_formed_fasta(ref_bin, seed):
    rng = np.random.default_rng(300 + seed)
    data = random_fasta(rng, 10, charset=b"ACGTacgt", weird=False)
    check_parity(ref_bin, data, C.SEQ_TYPE_DNA, well_formed=True)


def test_well_formed_fastq(ref_bin):
    rng = np.random.default_rng(400)
    data = random_fastq(rng, 12)
    check_parity(ref_bin, data, C.SEQ_TYPE_DNA, well_formed=True,
                 out_method="fastq", fastq=True)
