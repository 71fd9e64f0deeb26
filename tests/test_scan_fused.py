"""Fused Pallas classify kernel vs the XLA-formulation oracle.

The kernel runs in interpret mode on CPU (same dataflow as the Mosaic
build; tests/test_real_tpu.py covers the compiled path on a real chip).
Every comparison is bit-exact against ops.scan.scan_fasta_block — which is
itself fuzzed against the host numpy parser (test_parallel.py), which is
fuzzed against the reference C scanner (test_native.py).
"""

from __future__ import annotations

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from naf_tpu.format import constants as C
from naf_tpu.ops import scan as S
from naf_tpu.ops import scan_fused as F

KEYS = ("rec_start", "stream_keep", "stream_val", "seq_keep", "is_eol",
        "id_keep", "id_unex", "com_keep", "com_unex", "com_val",
        "hist_id", "hist_comment", "hist_seq")


def _assert_match(body: np.ndarray, prev: int, seq_type: int = 0,
                  sis: bool = False):
    o = S.scan_fasta_block(jnp.asarray(body), jnp.asarray(np.uint8(prev)),
                           seq_type=seq_type, starts_in_seq=sis)
    f = F.scan_fasta_fused(jnp.asarray(body), jnp.asarray(np.uint8(prev)),
                           seq_type=seq_type, starts_in_seq=sis,
                           interpret=True)
    for k in KEYS:
        a, b = np.asarray(o[k]), np.asarray(f[k])
        assert np.array_equal(a, b), (
            f"{k}: {int((a != b).sum())}/{a.size} mismatches "
            f"(first at {int(np.argmax(a != b))})")


def _gen_fasta(rng, n_rec=30, max_len=3000, alphabet=b"ACGTacgtNnZz \t"):
    rows = []
    for i in range(n_rec):
        com = b" comment %d" % i if i % 3 else b""
        rows.append(b">rec%d%s\n" % (i, com))
        seq = rng.choice(np.frombuffer(alphabet, np.uint8),
                         size=int(rng.integers(1, max_len)))
        rows.append(seq.tobytes() + b"\n")
    return np.frombuffer(b"".join(rows), np.uint8)


def test_structured_fasta_multi_tile():
    rng = np.random.default_rng(0)
    body = _gen_fasta(rng, n_rec=60, max_len=4000)[1:]
    _assert_match(body, ord(">"))


@pytest.mark.parametrize("seq_type", [C.SEQ_TYPE_DNA, C.SEQ_TYPE_RNA,
                                      C.SEQ_TYPE_PROTEIN, C.SEQ_TYPE_TEXT])
def test_all_seq_types(seq_type):
    rng = np.random.default_rng(seq_type)
    body = _gen_fasta(rng, n_rec=12, max_len=800,
                      alphabet=b"ACGTUacgtNnXx*?-Zz>@ \t")[1:]
    _assert_match(body, ord(">"), seq_type=seq_type)


def test_random_bytes_fuzz():
    """Arbitrary byte soup: every class transition, CR/LF variants, 8-bit."""
    rng = np.random.default_rng(7)
    for trial in range(6):
        n = int(rng.integers(100, 3 * F._TILE))
        body = rng.integers(0, 256, n, dtype=np.uint8)
        # raise the density of structural bytes
        for ch, frac in ((ord(">"), 0.02), (10, 0.1), (13, 0.02),
                         (32, 0.05), (9, 0.01)):
            idx = rng.integers(0, n, max(1, int(n * frac)))
            body[idx] = ch
        _assert_match(body, int(body[-1]) if trial % 2 else ord(">"))


def test_starts_in_seq_and_prev_byte():
    rng = np.random.default_rng(3)
    body = _gen_fasta(rng, n_rec=5)[1:]
    _assert_match(body, ord("\n"), sis=True)
    _assert_match(body, ord("A"), sis=False)
    # marker at byte 0 only counts after an EOL prev byte
    b2 = np.frombuffer(b">x c\nACGT\n", np.uint8)
    _assert_match(b2, ord("\n"))
    _assert_match(b2, ord("A"))


def test_tile_boundary_markers():
    """Records cut exactly at tile edges exercise the SMEM carry chain."""
    T = F._TILE
    line = b"A" * 63 + b"\n"
    filler = line * (T // 64)
    body = (filler[: T - 3] + b"\n>r1 c\n" + filler[: T - 10]
            + b"\n>r2\n" + b"ACGT\n")
    _assert_match(np.frombuffer(body, np.uint8), ord(">"))


def test_header_spanning_tiles():
    """A header line longer than one tile keeps the ID/COMMENT state across
    the carry (slow path on consecutive tiles)."""
    T = F._TILE
    body = b"x" * (T // 2) + b" " + b"c" * T + b"\nACGT\n"
    _assert_match(np.frombuffer(body, np.uint8), ord(">"))


def test_empty_and_tiny():
    _assert_match(np.frombuffer(b"r\nA\n", np.uint8), ord(">"))
    _assert_match(np.frombuffer(b"\n", np.uint8), ord(">"))
    _assert_match(np.frombuffer(b"A", np.uint8), ord(">"))


# ---------------------------------------------------------------------------
# FASTQ fused kernel
# ---------------------------------------------------------------------------

FQ_KEYS = ("rec_start", "stream_keep", "stream_val", "seq_keep", "is_eol",
           "id_keep", "id_unex", "com_keep", "com_unex", "com_val",
           "qual_keep", "qual_unex", "qual_val",
           "hist_id", "hist_comment", "hist_seq", "hist_qual")


def _assert_fastq_match(body: np.ndarray, prev: int, seq_type: int = 0):
    from naf_tpu.ops.scan_fused import scan_fastq_fused

    o = S.scan_fastq_block(jnp.asarray(body), jnp.asarray(np.uint8(prev)),
                           seq_type=seq_type)
    f = scan_fastq_fused(jnp.asarray(body), jnp.asarray(np.uint8(prev)),
                         seq_type=seq_type, interpret=True)
    for k in FQ_KEYS:
        a, b = np.asarray(o[k]), np.asarray(f[k])
        assert np.array_equal(a, b), (
            f"{k}: {int((a != b).sum())}/{a.size} mismatches")


def _gen_fastq(rng, n_rec, max_len=200, alphabet=b"ACGTNacgtZz "):
    rows = []
    for i in range(n_rec):
        ln = int(rng.integers(1, max_len))
        seq = rng.choice(np.frombuffer(alphabet, np.uint8), size=ln).tobytes()
        qual = rng.integers(28, 94, size=ln, dtype=np.uint8).tobytes()
        com = b" c%d @x" % i if i % 3 else b""
        rows.append(b"@read%d%s\n%s\n+\n%s\n" % (i, com, seq, qual))
    return np.frombuffer(b"".join(rows), np.uint8)[1:]


def test_fastq_multi_tile():
    rng = np.random.default_rng(11)
    _assert_fastq_match(_gen_fastq(rng, 1200), ord("@"))


def test_fastq_long_reads_span_tiles():
    """Single reads longer than a tile exercise the lane/sub carries."""
    rng = np.random.default_rng(12)
    body = _gen_fastq(rng, 4, max_len=2 * F._TILE // 3)
    _assert_fastq_match(body, ord("@"))


def test_fastq_weird_bytes():
    """'@'/'+' inside quality strings, unexpected chars everywhere."""
    rng = np.random.default_rng(13)
    body = _gen_fastq(rng, 300, alphabet=b"ACGT@+>\x01~ acgt")
    _assert_fastq_match(body, ord("@"))


def test_fastq_lf_padding_tail():
    body = np.frombuffer(b"r1\nACGT\n+\n!!!!\n" + b"\n" * 37, np.uint8)
    _assert_fastq_match(body, ord("@"))
