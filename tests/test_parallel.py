"""Multi-device block pipeline tests (8 virtual CPU devices, see conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naf_tpu.format import constants as C
from naf_tpu.ops import scan as S
from naf_tpu.parallel.block import (
    ShardedEncodeResult, encode_blocks_sharded, make_blocks, stitch_packed,
)
from naf_tpu.parallel.mesh import block_mesh, block_sharding
from naf_tpu.pipeline import parser as P_

from naf_tpu.ops.pack import pack_4bit


def _fasta(rng, n_rec=40, max_len=500):
    out = []
    for i in range(n_rec):
        out.append(b">rec%d some comment %d\n" % (i, i))
        ln = int(rng.integers(0, max_len))
        seq = rng.choice(np.frombuffer(b"ACGTacgtNn-", np.uint8), size=ln).tobytes()
        for j in range(0, ln, 70):
            out.append(seq[j:j + 70] + b"\n")
    return b"".join(out)


def test_scan_block_matches_host_parser():
    rng = np.random.default_rng(0)
    data = _fasta(rng)
    host = P_.parse_fasta(data, C.SEQ_TYPE_DNA)
    body = np.frombuffer(data, np.uint8)[1:]   # after first '>'
    s = S.scan_fasta_block(jnp.asarray(body), jnp.asarray(np.uint8(ord(">"))))
    stream = np.asarray(s["stream_val"])[np.asarray(s["stream_keep"])]
    assert stream.tobytes() == host.seq.tobytes()
    assert int(np.asarray(s["rec_start"]).sum()) + 1 == host.n_sequences
    longest = int(S.longest_line_block(s["seq_keep"], s["is_eol"]))
    assert longest == host.longest_line


@pytest.mark.parametrize("n_rec", [1, 7, 40])
def test_sharded_encode_matches_host(n_rec):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    rng = np.random.default_rng(n_rec)
    data = _fasta(rng, n_rec=n_rec)
    host = P_.parse_fasta(data, C.SEQ_TYPE_DNA)

    mesh = block_mesh(8)
    body = np.frombuffer(data, np.uint8)[1:]
    blocks, prev = make_blocks(body, 8)
    sharding = block_sharding(mesh)
    blocks_d = jax.device_put(jnp.asarray(blocks), sharding)
    prev_d = jax.device_put(jnp.asarray(prev), sharding)

    outs = encode_blocks_sharded(blocks_d, prev_d, seq_type=C.SEQ_TYPE_DNA, mesh=mesh)
    (packed, counts, first_codes, odd, is_lower, region, rec_start,
     hist_seq, hist_id, hist_comment, longest, n_rec_ag) = [np.asarray(o) for o in outs]

    res = ShardedEncodeResult(
        packed=packed, counts=counts, first_codes=first_codes, odd=odd,
        is_lower=is_lower, region=region, rec_start=rec_start,
        hist_seq=hist_seq[0], hist_id=hist_id[0], hist_comment=hist_comment[0],
        longest_line=int(longest[0]), n_records_after_first=int(n_rec_ag[0]),
    )

    # packed stream matches the host single-stream pack
    expect_packed, carry = pack_4bit(host.seq, backend="numpy")
    if carry is not None:
        expect_packed = np.concatenate([expect_packed, [np.uint8(carry)]])
    got = stitch_packed(res)
    assert got.tobytes() == expect_packed.tobytes()

    # reductions match
    assert int(counts.sum()) == host.seq.size
    assert res.longest_line == host.longest_line
    assert res.n_records_after_first + 1 == host.n_sequences
    assert np.array_equal(res.hist_seq, host.unexpected_seq[:256].astype(np.int32))


def test_make_blocks_covers_all_bytes():
    rng = np.random.default_rng(5)
    data = _fasta(rng, n_rec=20)
    body = np.frombuffer(data, np.uint8)[1:]
    blocks, prev = make_blocks(body, 8)
    # reassembling non-pad content must give back the original bytes
    joined = []
    for k in range(8):
        row = blocks[k]
        joined.append(row)
    # blocks are padded with '\n'; total real bytes = body.size
    assert blocks.shape[0] == 8
    assert prev[0] == ord(">")


def test_encode_sharded_archive_matches_host():
    """End-to-end: device-sharded encode == host encode, byte-identical."""
    from naf_tpu.parallel.mesh import block_mesh
    from naf_tpu.parallel.pipeline import encode_sharded
    from naf_tpu.pipeline.encoder import EncodeOptions, encode

    rng = np.random.default_rng(3)
    data = _fasta(rng, n_rec=60, max_len=700)
    for no_mask in (False, True):
        opts = EncodeOptions(level=1, no_mask=no_mask)
        host_blob, host_stats = encode(data, opts)
        dev_blob, dev_stats = encode_sharded(data, opts, mesh=block_mesh(8))
        assert dev_blob == host_blob
        assert dev_stats.n_sequences == host_stats.n_sequences
        assert dev_stats.longest_line == host_stats.longest_line


def test_encode_sharded_decodes_with_reference(ref_bin):
    import subprocess
    from naf_tpu.parallel.mesh import block_mesh
    from naf_tpu.parallel.pipeline import encode_sharded

    rng = np.random.default_rng(5)
    data = _fasta(rng, n_rec=25, max_len=300)
    blob, _ = encode_sharded(data, mesh=block_mesh(4))
    from conftest import run_ref
    q = run_ref([ref_bin["unnaf"], "-c"], blob)
    assert q.returncode == 0
    import io
    from naf_tpu.pipeline.decoder import Decoder, DecodeOptions
    ours = Decoder(io.BytesIO(blob), DecodeOptions()).fasta()
    assert q.stdout == ours
