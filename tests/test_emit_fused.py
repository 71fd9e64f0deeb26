"""Fused single-pass emit kernel vs a numpy oracle built on ops.scan.

The kernel runs in interpret mode on CPU (same dataflow as the Mosaic
build; the real-chip path is covered by tests/test_real_tpu.py).  The
oracle recomputes every fused output — compacted stream, tagged sparse
side stream, per-tile counts, longest line, first-kept case — from
ops.scan.scan_fasta_block, which is itself fuzzed against the host numpy
parser and the reference C scanner.
"""

from __future__ import annotations

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from naf_tpu.format import constants as C
from naf_tpu.ops import emit_fused as E
from naf_tpu.ops import scan as S


def _oracle(body: np.ndarray, prev: int, seq_type: int = 0,
            sis: bool = False) -> dict:
    s = S.scan_fasta_block(jnp.asarray(body), jnp.asarray(np.uint8(prev)),
                           seq_type=seq_type, starts_in_seq=sis)
    keep = np.asarray(s["stream_keep"])
    sval = np.asarray(s["stream_val"])
    seq_keep = np.asarray(s["seq_keep"])
    id_keep = np.asarray(s["id_keep"])
    id_unex = np.asarray(s["id_unex"])
    com_keep = np.asarray(s["com_keep"])
    com_unex = np.asarray(s["com_unex"])
    com_val = np.asarray(s["com_val"])
    rec_start = np.asarray(s["rec_start"])
    is_eol = np.asarray(s["is_eol"])

    sv_c = sval[keep]
    cnt = int(keep.sum())
    lower = sv_c >= 96

    # sparse side stream: disjoint classes merged in byte order
    kept_pos = np.flatnonzero(keep)
    chg_j = (np.flatnonzero(lower[1:] != lower[:-1]) + 1
             if cnt else np.zeros(0, np.int64))
    chg_pos = kept_pos[chg_j] if cnt else chg_j
    cseq = np.cumsum(seq_keep)
    entries = []
    for p in np.flatnonzero(id_keep):
        entries.append((p, E.TAG_ID, int(body[p]), 0))
    for p in np.flatnonzero(com_keep):
        v = C.REPLACEMENT_NAME if com_unex[p] else int(body[p])
        entries.append((p, E.TAG_COM, v, 0))
    for p in np.flatnonzero(rec_start):
        entries.append((p, E.TAG_REC, 0, int(cseq[p] - seq_keep[p])))
    for p, j in zip(chg_pos, chg_j):
        entries.append((int(p), E.TAG_CHG, 0, int(j)))
    entries.sort()

    # longest kept-seq line + open tail (longest_line_block semantics)
    longest = int(np.asarray(S.longest_line_block(
        jnp.asarray(seq_keep), jnp.asarray(is_eol))))

    return dict(
        sv=sv_c, cnt=cnt, cnt_seq=int(seq_keep.sum()),
        tags=np.array([t for _, t, _, _ in entries], np.int64),
        vals=np.array([v for _, _, v, _ in entries], np.int64),
        avals=np.array([a for _, _, _, a in entries], np.int64),
        unex_id=int(id_unex.sum()),
        unex_com=int(com_unex.sum()),
        unex_seq=int(np.asarray(s["hist_seq"]).sum()),
        longest=longest,
        first_lower=(0 if cnt == 0 else (2 if lower[0] else 1)),
        first_sval=(0 if cnt == 0 else int(sv_c[0])),
    )


def _assert_match(body: np.ndarray, prev: int, seq_type: int = 0,
                  sis: bool = False):
    o = _oracle(body, prev, seq_type, sis)
    f = E.emit_fasta_fused(jnp.asarray(body), jnp.asarray(np.uint8(prev)),
                           sis, seq_type=seq_type, interpret=True)
    f = {k: np.asarray(v) for k, v in f.items()}
    if not bool(f["sp_ok"]):
        # a tile overflowed the sparse cap: the pipeline falls back to the
        # two-pass path; only legitimate overflows may trip this
        assert o["tags"].size > E._CS_CAP
        return
    cnt = int(f["cnt"])
    assert cnt == o["cnt"]
    assert int(f["cnt_seq"]) == o["cnt_seq"]
    sv = f["sv"]
    assert np.array_equal(sv[:cnt], o["sv"]), (
        f"sv mismatch at {int(np.argmax(sv[:cnt] != o['sv']))}")
    assert not sv[cnt:].any()
    n_sp = int(f["n_sp"])
    assert n_sp == o["tags"].size
    tv = f["sp_tv"][:n_sp]
    assert np.array_equal(tv >> 8, o["tags"])
    assert np.array_equal(tv & 0xFF, o["vals"])
    assert np.array_equal(f["sp_a"][:n_sp], o["avals"])
    assert int(f["unex_id"]) == o["unex_id"]
    assert int(f["unex_com"]) == o["unex_com"]
    assert int(f["unex_seq"]) == o["unex_seq"]
    assert int(f["longest"]) == o["longest"]
    assert int(f["first_lower"]) == o["first_lower"]
    if cnt:
        assert int(f["first_sval"]) == o["first_sval"]


def _gen_fasta(rng, n_rec=30, max_len=3000, alphabet=b"ACGTNn"):
    """Realistic FASTA: soft-masking in runs (per-byte random case would
    overflow the sparse cap by design and fall back to the two-pass path)."""
    rows = []
    for i in range(n_rec):
        com = b" comment %d" % i if i % 3 else b""
        rows.append(b">rec%d%s\n" % (i, com))
        seq = rng.choice(np.frombuffer(alphabet, np.uint8),
                         size=int(rng.integers(1, max_len)))
        for s in rng.integers(0, max(1, seq.size - 50),
                              size=max(1, seq.size // 500)):
            seq[s:s + 50] |= 32
        rows.append(seq.tobytes() + b"\n")
    return np.frombuffer(b"".join(rows), np.uint8)


def test_structured_fasta_multi_tile():
    rng = np.random.default_rng(0)
    body = _gen_fasta(rng, n_rec=60, max_len=4000)[1:]
    _assert_match(body, ord(">"))


def test_masked_runs_and_wrapped_lines():
    rng = np.random.default_rng(1)
    seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=120_000)
    for s in rng.integers(0, 119_000, size=60):
        seq[s:s + 400] |= 32
    wrapped = b"\n".join(seq[i:i + 70].tobytes()
                         for i in range(0, seq.size, 70))
    body = np.frombuffer(b"r1 big record\n" + wrapped + b"\n", np.uint8)
    _assert_match(body, ord(">"))


def test_unexpected_chars_counted():
    body = np.frombuffer(b"x\x01y bad\x02com\nAC!GT*acg\n>n2\nACGT\n",
                         np.uint8)
    _assert_match(body, ord(">"))


def test_mid_record_continuation():
    body = np.frombuffer(b"acGTACgt\nACGT\n>n2 c\nTTTT\n", np.uint8)
    _assert_match(body, ord("\n"), sis=True)


def test_single_char_mask_runs():
    # 799 single-char runs in one tile: dense but still under the cap
    body = np.frombuffer(b"r\n" + b"Aa" * 400 + b"\n", np.uint8)
    _assert_match(body, ord(">"))


def test_empty_and_tiny():
    _assert_match(np.frombuffer(b"r\nA\n", np.uint8), ord(">"))
    _assert_match(np.frombuffer(b"\n", np.uint8), ord(">"))


def test_tile_boundary_carries():
    rng = np.random.default_rng(2)
    # force records and case changes to straddle the 32 KiB tile boundary
    chunks = []
    for i in range(6):
        chunks.append(b">r%d\n" % i)
        n = E._TILE - 7 + int(rng.integers(0, 13))
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n)
        for s in rng.integers(0, max(1, n - 300), size=max(1, n // 800)):
            seq[s:s + 300] |= 32
        chunks.append(seq.tobytes() + b"\n")
    body = np.frombuffer(b"".join(chunks), np.uint8)[1:]
    _assert_match(body, ord(">"))


def test_sparse_overflow_flag():
    rows = [b">h%d very long comment line to overflow\nA\n" % i
            for i in range(3000)]
    body = np.frombuffer(b"".join(rows), np.uint8)[1:]
    f = E.emit_fasta_fused(jnp.asarray(body),
                           jnp.asarray(np.uint8(ord(">"))),
                           False, seq_type=0, interpret=True)
    assert not bool(np.asarray(f["sp_ok"]))


def test_fuzz_small_blocks():
    rng = np.random.default_rng(3)
    pool = np.frombuffer(b">ACGTNACGT \t\r\nacgt" + b"xyz*-", np.uint8)
    for trial in range(6):
        n = int(rng.integers(1, 1500))
        body = rng.choice(pool, size=n)
        _assert_match(body, ord(">"))


# ---------------------------------------------------------------------------
# FASTQ variant
# ---------------------------------------------------------------------------

def _oracle_fastq(body: np.ndarray, prev: int, seq_type: int = 0) -> dict:
    s = S.scan_fastq_block(jnp.asarray(body), jnp.asarray(np.uint8(prev)),
                           seq_type=seq_type)
    keep = np.asarray(s["stream_keep"])
    sval = np.asarray(s["stream_val"])
    seq_keep = np.asarray(s["seq_keep"])
    id_keep = np.asarray(s["id_keep"])
    qual_keep = np.asarray(s["qual_keep"])
    qual_val = np.asarray(s["qual_val"])
    com_keep = np.asarray(s["com_keep"])
    com_val = np.asarray(s["com_val"])
    rec_start = np.asarray(s["rec_start"])

    sv_c = sval[keep]
    cnt = int(keep.sum())
    lower = sv_c >= 96
    chg_j = (np.flatnonzero(lower[1:] != lower[:-1]) + 1
             if cnt else np.zeros(0, np.int64))
    kept_pos = np.flatnonzero(keep)
    chg_pos = kept_pos[chg_j] if cnt else chg_j
    cseq = np.cumsum(seq_keep)
    cqual = np.cumsum(qual_keep)
    cid = np.cumsum(id_keep)
    entries = []
    for p in np.flatnonzero(com_keep):
        entries.append((p, E.TAG_COM, int(com_val[p]), 0, 0, 0))
    for p in np.flatnonzero(rec_start):
        entries.append((p, E.TAG_REC, 0, int(cseq[p]), int(cqual[p]),
                        int(cid[p])))
    for p, j in zip(chg_pos, chg_j):
        entries.append((int(p), E.TAG_CHG, 0, int(j), 0, 0))
    entries.sort()
    return dict(
        sv=sv_c, qv=qual_val[qual_keep], iv=body[id_keep],
        cnt=cnt, cnt_seq=int(seq_keep.sum()),
        cnt_qual=int(qual_keep.sum()), cnt_id=int(id_keep.sum()),
        tags=np.array([e[1] for e in entries], np.int64),
        vals=np.array([e[2] for e in entries], np.int64),
        avals=np.array([e[3] for e in entries], np.int64),
        bvals=np.array([e[4] for e in entries], np.int64),
        cvals=np.array([e[5] for e in entries], np.int64),
    )


def _assert_match_fastq(body: np.ndarray, prev: int = ord("@"),
                        seq_type: int = 0):
    o = _oracle_fastq(body, prev, seq_type)
    f = E.emit_fastq_fused(jnp.asarray(body), jnp.asarray(np.uint8(prev)),
                           seq_type=seq_type, interpret=True)
    f = {k: np.asarray(v) for k, v in f.items()}
    if not bool(f["sp_ok"]):
        assert o["tags"].size > E._CS_CAP
        return
    for key in ("cnt", "cnt_seq", "cnt_qual", "cnt_id"):
        assert int(f[key]) == o[key], key
    for key in ("sv", "qv", "iv"):
        n = o[key].size
        assert np.array_equal(f[key][:n], o[key]), key
        assert not f[key][n:].any(), key
    n_sp = int(f["n_sp"])
    assert n_sp == o["tags"].size
    tv = f["sp_tv"][:n_sp]
    assert np.array_equal(tv >> 8, o["tags"])
    assert np.array_equal(tv & 0xFF, o["vals"])
    assert np.array_equal(f["sp_a"][:n_sp], o["avals"])
    assert np.array_equal(f["sp_b"][:n_sp], o["bvals"])
    assert np.array_equal(f["sp_c"][:n_sp], o["cvals"])


def _gen_fastq(rng, n_reads=300, read_len=90, masked=True):
    out = []
    for i in range(n_reads):
        seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=read_len)
        if masked and i % 3 == 0:
            seq[10:60] |= 32
        qual = rng.integers(35, 74, size=read_len, dtype=np.uint8)
        com = b" len%d" % read_len if i % 4 else b""
        out.append(b"@rd%04d%s\n%s\n+\n%s\n"
                   % (i, com, seq.tobytes(), qual.tobytes()))
    return np.frombuffer(b"".join(out), np.uint8)[1:]


def test_fastq_fused_multi_tile():
    rng = np.random.default_rng(20)
    _assert_match_fastq(_gen_fastq(rng, n_reads=900, read_len=120))


def test_fastq_fused_tiny_and_unexpected():
    body = np.frombuffer(
        b"r1 c\nACGT\n+\n!!!!\n@r2\nNNZA\n+\n!!\x7f!\n", np.uint8)
    _assert_match_fastq(body)


def test_fastq_fused_varied_lengths():
    rng = np.random.default_rng(21)
    out = []
    for i in range(200):
        ln = int(rng.integers(1, 200))
        seq = rng.choice(np.frombuffer(b"ACGTacgt", np.uint8), size=ln)
        qual = rng.integers(33, 100, size=ln, dtype=np.uint8)
        out.append(b"@x%d\n%s\n+\n%s\n" % (i, seq.tobytes(), qual.tobytes()))
    _assert_match_fastq(np.frombuffer(b"".join(out), np.uint8)[1:])


def test_apply_mask_parity_kernel():
    rng = np.random.default_rng(30)
    n = 200_000
    chars = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n)
    bounds = np.sort(rng.choice(n, size=400, replace=False))
    tog = np.zeros(n, np.uint8)
    np.add.at(tog, bounds, 1)
    parity = (np.cumsum(tog) & 1).astype(np.uint8)
    expect = chars + 32 * parity
    got = np.asarray(E.apply_mask_parity_pallas(
        jnp.asarray(chars), jnp.asarray(tog), interpret=True))
    assert np.array_equal(got, expect)
