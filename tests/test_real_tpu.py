"""Real-chip kernel proof: compiled (non-interpret) Pallas on the TPU.

These tests run only when a TPU backend is attached AND the suite was
launched with NAF_TPU_REAL_DEVICE=1 (conftest forces CPU otherwise).  They
make Mosaic compile failures visible: every other Pallas test runs in
interpret mode or on CPU XLA.

    NAF_TPU_REAL_DEVICE=1 python -m pytest tests/test_real_tpu.py -v
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("NAF_TPU_REAL_DEVICE"),
    reason="real-device tests need NAF_TPU_REAL_DEVICE=1",
)


@pytest.fixture(scope="module")
def tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend attached")
    return jax


def test_pack_kernel_compiled_on_tpu(tpu):
    import jax.numpy as jnp

    from naf_tpu.format import constants as C
    from naf_tpu.ops.pack import pack_4bit_pallas

    rng = np.random.default_rng(0)
    n = 1 << 16
    seq = rng.choice(np.frombuffer(b"ACGTacgtNnRYKM-", np.uint8), size=n)
    out = np.asarray(pack_4bit_pallas(jnp.asarray(seq)))   # interpret=False
    codes = C.NUC_CODE[:256][seq]
    expect = codes[0::2] | (codes[1::2] << 4)
    assert out.tobytes() == expect.tobytes()


def test_unpack_kernel_compiled_on_tpu(tpu):
    import jax.numpy as jnp

    from naf_tpu.format import constants as C
    from naf_tpu.ops.unpack import unpack_4bit_pallas

    rng = np.random.default_rng(1)
    m = 1 << 15
    packed = rng.integers(0, 256, size=m, dtype=np.uint8)
    for rna in (False, True):
        out = np.asarray(unpack_4bit_pallas(jnp.asarray(packed), rna=rna))
        lut = C.CODES_TO_NUCS_RNA if rna else C.CODES_TO_NUCS_DNA
        assert out.tobytes() == lut[packed].reshape(-1).tobytes()


def test_scan_block_compiled_on_tpu(tpu):
    """The whole device encode scan jits and runs on the chip."""
    import jax.numpy as jnp

    from naf_tpu.format import constants as C
    from naf_tpu.ops import scan as S
    from naf_tpu.pipeline import parser as P_

    rng = np.random.default_rng(2)
    rows = []
    for i in range(16):
        rows.append(b">r%d c\n" % i)
        seq = rng.choice(np.frombuffer(b"ACGTacgtNn", np.uint8),
                         size=int(rng.integers(50, 300)))
        rows.append(seq.tobytes() + b"\n")
    data = b"".join(rows)
    body = np.frombuffer(data, np.uint8)[1:]
    s = S.scan_fasta_block(jnp.asarray(body), jnp.asarray(np.uint8(ord(">"))))
    host = P_.parse_fasta(data, C.SEQ_TYPE_DNA)
    stream = np.asarray(s["stream_val"])[np.asarray(s["stream_keep"])]
    assert stream.tobytes() == host.seq.tobytes()


def test_device_decode_on_tpu(tpu):
    """Sharded gather-render runs on the real chip (1-device mesh)."""
    import io

    from naf_tpu.parallel.mesh import block_mesh
    from naf_tpu.pipeline.decoder import Decoder, DecodeOptions
    from naf_tpu.pipeline.encoder import EncodeOptions, encode

    rng = np.random.default_rng(3)
    rows = []
    for i in range(20):
        rows.append(b">rec%d note\n" % i)
        seq = rng.choice(np.frombuffer(b"ACGTacgtNn", np.uint8),
                         size=int(rng.integers(10, 400)))
        rows.append(seq.tobytes() + b"\n")
    data = b"".join(rows)
    blob, _ = encode(data, EncodeOptions(level=1))
    host = Decoder(io.BytesIO(blob), DecodeOptions()).fasta()
    dev = Decoder(io.BytesIO(blob), DecodeOptions()).fasta_device(
        mesh=block_mesh(1))
    assert dev == host


def test_chunked_device_encode_on_tpu(tpu):
    """The streaming DeviceScanEngine runs on the real chip (1-device mesh)
    and matches the in-memory encoder byte-for-byte."""
    import io

    from naf_tpu.parallel.mesh import block_mesh
    from naf_tpu.parallel.stream import DeviceScanEngine
    from naf_tpu.pipeline.encoder import EncodeOptions, encode
    from naf_tpu.pipeline.stream import encode_stream

    rng = np.random.default_rng(4)
    rows = []
    for i in range(60):
        rows.append(b">rec%d note\n" % i)
        seq = rng.choice(np.frombuffer(b"ACGTacgtNn", np.uint8),
                         size=int(rng.integers(100, 900)))
        rows.append(seq.tobytes() + b"\n")
    data = b"".join(rows)
    ref, _ = encode(data, EncodeOptions())
    eng = DeviceScanEngine(mesh=block_mesh(1))
    buf = io.BytesIO()
    encode_stream(io.BytesIO(data), buf, EncodeOptions(),
                  chunk_size=8192, engine=eng)
    assert buf.getvalue() == ref
    assert eng.device_chunks > 0


def test_fused_classify_compiled_on_tpu(tpu):
    """Mosaic-compiled fused classify kernels (FASTA + FASTQ) bit-match the
    XLA oracle on the chip."""
    import jax.numpy as jnp

    from naf_tpu.ops import scan as S
    from naf_tpu.ops.scan_fused import scan_fasta_fused, scan_fastq_fused

    rng = np.random.default_rng(0)
    rows = []
    for i in range(40):
        rows.append(b">r%d c\n" % i)
        seq = rng.choice(np.frombuffer(b"ACGTacgtNnZz", np.uint8),
                         size=int(rng.integers(100, 2000)))
        rows.append(seq.tobytes() + b"\n")
    body = np.frombuffer(b"".join(rows), np.uint8)[1:(1 << 16) + 1]
    o = S.scan_fasta_block(jnp.asarray(body), jnp.asarray(np.uint8(ord(">"))))
    f = scan_fasta_fused(jnp.asarray(body), jnp.asarray(np.uint8(ord(">"))))
    for k in ("rec_start", "stream_keep", "stream_val", "seq_keep",
              "is_eol", "id_keep", "com_keep"):
        assert np.array_equal(np.asarray(o[k]), np.asarray(f[k])), k

    fq = []
    for i in range(200):
        ln = int(rng.integers(1, 150))
        s = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=ln).tobytes()
        q = rng.integers(33, 94, size=ln, dtype=np.uint8).tobytes()
        fq.append(b"@x%d c\n%s\n+\n%s\n" % (i, s, q))
    qbody = np.frombuffer(b"".join(fq), np.uint8)[1:(1 << 16) + 1]
    oq = S.scan_fastq_block(jnp.asarray(qbody),
                            jnp.asarray(np.uint8(ord("@"))))
    fqd = scan_fastq_fused(jnp.asarray(qbody),
                           jnp.asarray(np.uint8(ord("@"))))
    for k in ("rec_start", "stream_val", "seq_keep", "qual_keep",
              "qual_val", "is_eol"):
        assert np.array_equal(np.asarray(oq[k]), np.asarray(fqd[k])), k


def test_scan_and_compact_kernels_compiled_on_tpu(tpu):
    """Pallas prefix scans + dense compaction, Mosaic-compiled."""
    import jax.numpy as jnp

    from naf_tpu.ops.compact import compact_u8_dense
    from naf_tpu.ops.scan_fused import cumsum_i32_pallas, maxscan_i32_pallas

    rng = np.random.default_rng(2)
    x = rng.integers(-100, 100, 1 << 17).astype(np.int32)
    assert np.array_equal(np.asarray(cumsum_i32_pallas(jnp.asarray(x))),
                          np.cumsum(x).astype(np.int32))
    assert np.array_equal(np.asarray(maxscan_i32_pallas(jnp.asarray(x))),
                          np.maximum.accumulate(x))
    keep = rng.random(1 << 17) < 0.985
    vals = rng.integers(0, 256, 1 << 17, dtype=np.uint8)
    out, cnt = compact_u8_dense(jnp.asarray(vals), jnp.asarray(keep))
    want = vals[keep]
    assert int(cnt) == want.size
    assert np.array_equal(np.asarray(out)[:want.size], want)


def test_fused_emit_kernel_on_tpu(tpu):
    """The single-pass fused emit kernel (classify + butterfly + segment
    matmul) compiles via Mosaic and is bit-exact on chip — including the
    Precision.HIGHEST merge matmuls (the default bf16 pass corrupts 16-bit
    halves ONLY on real hardware; interpret mode can't catch it)."""
    import jax.numpy as jnp

    from naf_tpu.ops import scan as S
    from naf_tpu.ops.emit_fused import emit_fasta_fused

    rng = np.random.default_rng(7)
    rows = []
    for i in range(8):
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=40_000)
        for s in rng.integers(0, 39_000, size=12):
            seq[s:s + 500] |= 32
        body = b"\n".join(seq[j:j + 70].tobytes()
                          for j in range(0, seq.size, 70))
        rows.append(b">r%d c%d\n" % (i, i) + body + b"\n")
    body = np.frombuffer(b"".join(rows), np.uint8)[1:]
    r = emit_fasta_fused(jnp.asarray(body), jnp.asarray(np.uint8(ord(">"))),
                         False, seq_type=0)
    assert bool(np.asarray(r["sp_ok"]))
    s = S.scan_fasta_block(jnp.asarray(body),
                           jnp.asarray(np.uint8(ord(">"))))
    keep = np.asarray(s["stream_keep"])
    expect = np.asarray(s["stream_val"])[keep]
    cnt = int(np.asarray(r["cnt"]))
    assert cnt == int(keep.sum())
    assert np.array_equal(np.asarray(r["sv"])[:cnt], expect)
    # sparse coordinates: record boundaries + mask-run changes exact
    n_sp = int(np.asarray(r["n_sp"]))
    tv = np.asarray(r["sp_tv"])[:n_sp]
    assert int((tv >> 8 == 2).sum()) == int(np.asarray(
        s["rec_start"]).sum())


def test_fused_sharded_encode_on_tpu(tpu):
    """encode_sharded routes through the fused pipeline on the chip and
    produces byte-identical archives to the host encoder."""
    from naf_tpu.parallel.mesh import block_mesh
    from naf_tpu.parallel.pipeline import encode_sharded
    from naf_tpu.pipeline.encoder import EncodeOptions, encode

    rng = np.random.default_rng(8)
    seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=2_000_000)
    seq[100_000:400_000] |= 32
    data = b">chrA\n" + b"\n".join(
        seq[j:j + 80].tobytes() for j in range(0, seq.size, 80)) + b"\n"
    os.environ["NAF_TPU_NO_FALLBACK"] = "1"
    try:
        blob, _ = encode_sharded(data, EncodeOptions(level=1),
                                 mesh=block_mesh(1))
    finally:
        os.environ.pop("NAF_TPU_NO_FALLBACK", None)
    host, _ = encode(data, EncodeOptions(level=1))
    assert blob == host


def test_regular_render_fastq_on_tpu(tpu):
    """Uniform-group FASTQ decode (reshape/concat render) on the chip."""
    import io

    from naf_tpu.parallel.mesh import block_mesh
    from naf_tpu.pipeline.decoder import Decoder, DecodeOptions
    from naf_tpu.pipeline.encoder import EncodeOptions, encode

    rng = np.random.default_rng(9)
    out = []
    for i in range(2000):
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=100)
        qual = rng.integers(35, 74, size=100, dtype=np.uint8)
        out.append(b"@read%04d/1\n%s\n+\n%s\n"
                   % (i, seq.tobytes(), qual.tobytes()))
    data = b"".join(out)
    blob, _ = encode(data, EncodeOptions(level=1))
    host = Decoder(io.BytesIO(blob), DecodeOptions()).fastq()
    dev = Decoder(io.BytesIO(blob), DecodeOptions()).fastq_device(
        mesh=block_mesh(1))
    assert dev == host


def test_fastq_fused_sharded_encode_on_tpu(tpu):
    """FASTQ encode_sharded routes through the fused FASTQ kernel on the
    chip and matches the host encoder byte-for-byte."""
    from naf_tpu.parallel.mesh import block_mesh
    from naf_tpu.parallel.pipeline import encode_sharded
    from naf_tpu.pipeline.encoder import EncodeOptions, encode

    rng = np.random.default_rng(10)
    out = []
    for i in range(4000):
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=100)
        if i % 3 == 0:
            seq[20:70] |= 32
        qual = rng.integers(35, 74, size=100, dtype=np.uint8)
        out.append(b"@read%05d/1\n%s\n+\n%s\n"
                   % (i, seq.tobytes(), qual.tobytes()))
    data = b"".join(out)
    os.environ["NAF_TPU_NO_FALLBACK"] = "1"
    try:
        blob, _ = encode_sharded(data, EncodeOptions(level=1),
                                 mesh=block_mesh(1))
    finally:
        os.environ.pop("NAF_TPU_NO_FALLBACK", None)
    host, _ = encode(data, EncodeOptions(level=1))
    assert blob == host
