#!/usr/bin/env python3
"""Benchmark: FASTA compress+decompress round-trip throughput vs reference.

Prints ONE JSON line:
  {"metric": "fasta_roundtrip_MBps", "value": <ours>, "unit": "MB/s",
   "vs_baseline": <ours / reference-binary>}

The baseline is the reference C implementation (ennaf|unnaf at the same
compression level) built locally against system zstd and measured on the
same machine and input.  value = input_MB / (our_compress_s + our_decompress_s).
"""

from __future__ import annotations

import io
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
REF_BUILD = REPO / ".ref_build"
SIZE_MB = int(os.environ.get("NAF_BENCH_MB", "64"))
LEVEL = int(os.environ.get("NAF_BENCH_LEVEL", "1"))


def gen_fasta(total_mb: int, seed: int = 0) -> bytes:
    """Synthetic multi-record FASTA: DNA with soft-masked runs, 70-char lines."""
    rng = np.random.default_rng(seed)
    total = total_mb << 20
    rec_len = 1 << 20
    out = []
    made = 0
    i = 0
    bases = np.frombuffer(b"ACGT", np.uint8)
    while made < total:
        ln = min(rec_len, total - made)
        seq = rng.choice(bases, size=ln)
        # soft-mask ~20% in runs of ~300
        n_runs = max(1, ln // 1500)
        starts = rng.integers(0, max(1, ln - 300), size=n_runs)
        for s in starts:
            seq[s:s + 300] |= 32
        # occasional N runs
        for s in rng.integers(0, max(1, ln - 50), size=max(1, ln // 20000)):
            seq[s:s + 50] = ord("N")
        body = seq.reshape(-1, 70) if ln % 70 == 0 else None
        if body is None:
            pad = (-ln) % 70
            seq2 = np.concatenate([seq, np.full(pad, ord("A"), np.uint8)])
            body = seq2.reshape(-1, 70)
        wrapped = np.concatenate(
            [body, np.full((body.shape[0], 1), ord("\n"), np.uint8)], axis=1
        ).reshape(-1)
        out.append(b">contig%d synthetic test\n" % i + wrapped.tobytes())
        made += ln
        i += 1
    return b"".join(out)


def gen_fastq(n_reads: int, read_len: int = 100, seed: int = 1) -> bytes:
    """Synthetic FASTQ: fixed-length reads with realistic quality strings."""
    rng = np.random.default_rng(seed)
    seq = rng.choice(np.frombuffer(b"ACGT", np.uint8),
                     size=(n_reads, read_len))
    qual = rng.integers(35, 74, size=(n_reads, read_len), dtype=np.uint8)
    out = []
    for i in range(n_reads):
        out.append(b"@read%d/1\n%s\n+\n%s\n"
                   % (i, seq[i].tobytes(), qual[i].tobytes()))
    return b"".join(out)


def build_reference() -> bool:
    REF_BUILD.mkdir(exist_ok=True)
    for tool in ("ennaf", "unnaf"):
        exe = REF_BUILD / tool
        if exe.exists():
            continue
        src = Path("/root/reference") / tool / "src" / f"{tool}.c"
        if not src.exists():
            return False
        r = subprocess.run(["gcc", "-O3", "-march=native", "-std=gnu99",
                            "-o", str(exe), str(src), "-lzstd"], capture_output=True)
        if r.returncode != 0:
            return False
    return True


REPS = int(os.environ.get("NAF_BENCH_REPS", "15"))


def _best(fn, reps=REPS):
    """Best-of-N wall time (rejects scheduler noise on shared hosts)."""
    best = None
    result = None
    for _ in range(reps):
        t0 = time.perf_counter()
        result = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, result


def _best_interleaved(fns, reps=REPS):
    """Best-of-N for several functions, round-robin interleaved.

    On a noisy shared host a contention burst lasting several seconds would
    bias sequential best-of-N toward whichever side ran in the quiet window;
    interleaving exposes every candidate to the same conditions each round.
    Returns ([best_times], [last_results]).
    """
    bests = [None] * len(fns)
    results = [None] * len(fns)
    for _ in range(reps):
        for i, fn in enumerate(fns):
            t0 = time.perf_counter()
            results[i] = fn()
            dt = time.perf_counter() - t0
            bests[i] = dt if bests[i] is None else min(bests[i], dt)
    return bests, results


def bench_device_kernels() -> dict:
    """On-chip compiled Pallas kernel throughput (empty when no TPU).

    Data stays device-resident (the sharded pipeline's regime); steady-state
    best-of-N with block_until_ready.
    """
    try:
        import jax
        import jax.numpy as jnp
    except Exception:
        return {}
    if jax.default_backend() != "tpu":
        return {}
    from naf_tpu.ops.pack import pack_4bit_pallas
    from naf_tpu.ops.unpack import unpack_4bit_pallas

    rng = np.random.default_rng(0)
    n = 1 << 26                       # 64 MB on device
    seq = rng.choice(np.frombuffer(b"ACGTacgtNn", np.uint8), size=n)
    x = jnp.asarray(seq)
    packed = pack_4bit_pallas(x)
    packed.block_until_ready()        # compile (persistent-cached)

    def t_best(fn, reps=10):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().block_until_ready()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    tp = t_best(lambda: pack_4bit_pallas(x))
    up = unpack_4bit_pallas(packed)
    up.block_until_ready()
    tu = t_best(lambda: unpack_4bit_pallas(packed))
    return {
        "device_pack_GBps": round(n / tp / 1e9, 2),
        "device_unpack_GBps": round(n / tu / 1e9, 2),
        "device": str(jax.devices()[0]),
    }


def scaling_mode() -> None:
    """1->N virtual-device scaling of the sharded encode (BASELINE north
    star).  Run as: NAF_BENCH_SCALING=1 python bench.py

    Prints one JSON line per mesh size with the device-pass throughput and
    scaling efficiency vs 1 device.  On this 2-core host the virtual CPU
    mesh measures the pipeline's balance/overhead, not real chip scaling —
    wall clock saturates at the core count.
    """
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from naf_tpu.parallel.mesh import block_mesh
    from naf_tpu.parallel.pipeline import encode_sharded
    from naf_tpu.pipeline.encoder import EncodeOptions, encode

    data = gen_fasta(int(os.environ.get("NAF_BENCH_SCALING_MB", "32")))
    mb = len(data) / (1 << 20)
    opts = EncodeOptions(level=1)
    host_blob, _ = encode(data, opts)
    base = None
    for D in (1, 2, 4, 8):
        mesh = block_mesh(D)
        blob, _ = encode_sharded(data, opts, mesh=mesh)   # warm-up/compile
        assert blob == host_blob, "sharded archive != host archive"
        t, _ = _best(lambda: encode_sharded(data, opts, mesh=mesh), reps=5)
        mbps = mb / t
        if base is None:
            base = mbps
        print(json.dumps({
            "metric": "sharded_encode_MBps", "devices": D,
            "value": round(mbps, 2), "unit": "MB/s",
            "scaling_vs_1dev": round(mbps / base / D, 3),
            "note": "virtual CPU mesh on 2 cores",
        }))


def main() -> None:
    if os.environ.get("NAF_BENCH_SCALING"):
        scaling_mode()
        return
    from naf_tpu.pipeline.decoder import Decoder, DecodeOptions
    from naf_tpu.pipeline.encoder import EncodeOptions

    data = gen_fasta(SIZE_MB)
    mb = len(data) / (1 << 20)
    opts = EncodeOptions(level=LEVEL, threads=os.cpu_count() or 0)
    env = dict(os.environ, TMPDIR="/tmp")

    from naf_tpu.pipeline.encoder import encode

    def compress():
        return encode(data, opts)[0]

    def decompress():
        return Decoder(io.BytesIO(blob), DecodeOptions()).fasta()

    blob = compress()    # warm-up (page cache, lazy inits)
    out = decompress()

    vs = 0.0
    if build_reference():
        # correctness gate: reference decodes our archive to our own output
        q = subprocess.run([str(REF_BUILD / "unnaf"), "-c"], input=blob,
                           capture_output=True, env=env)
        assert q.returncode == 0 and q.stdout == out, "round-trip mismatch vs reference"

        def ref_compress():
            return subprocess.run(
                [str(REF_BUILD / "ennaf"), f"-{LEVEL}", "-c"],
                input=data, capture_output=True, env=env).stdout

        ref_archive = ref_compress()   # warm-up

        def ref_decompress():
            return subprocess.run([str(REF_BUILD / "unnaf"), "-c"],
                                  input=ref_archive, capture_output=True, env=env)

        (t_c, rc), _ = _best_interleaved([compress, ref_compress])
        (t_d, rd), (out2, q) = _best_interleaved([decompress, ref_decompress])
        assert q.returncode == 0 and out2 == out
        ours = mb / (t_c + t_d)
        vs = ours / (mb / (rc + rd))
        extra = dict(our_compress_s=round(t_c, 3), our_decompress_s=round(t_d, 3),
                     ref_compress_s=round(rc, 3), ref_decompress_s=round(rd, 3),
                     our_archive_bytes=len(blob), ref_archive_bytes=len(ref_archive))
        print(json.dumps(extra), file=sys.stderr)

        # secondary metric (BASELINE.md config 3): FASTQ round trip
        fq = gen_fastq(int(os.environ.get("NAF_BENCH_FASTQ_READS", "250000")))
        fq_mb = len(fq) / (1 << 20)

        def fq_compress():
            return encode(fq, opts)[0]

        def fq_ref_compress():
            return subprocess.run(
                [str(REF_BUILD / "ennaf"), f"-{LEVEL}", "--fastq", "-c"],
                input=fq, capture_output=True, env=env).stdout

        fq_blob = fq_compress()          # warm-ups
        fq_ref_blob = fq_ref_compress()

        def fq_decompress():
            return Decoder(io.BytesIO(fq_blob), DecodeOptions()).fastq()

        def fq_ref_decompress():
            return subprocess.run([str(REF_BUILD / "unnaf"), "-c"],
                                  input=fq_ref_blob, capture_output=True, env=env)

        (tqc, rqc), _ = _best_interleaved([fq_compress, fq_ref_compress])
        (tqd, rqd), (fq_out, q) = _best_interleaved(
            [fq_decompress, fq_ref_decompress])
        assert q.returncode == 0
        qq = subprocess.run([str(REF_BUILD / "unnaf"), "-c"], input=fq_blob,
                            capture_output=True, env=env)
        assert qq.returncode == 0 and qq.stdout == fq_out, "FASTQ mismatch"
        print(json.dumps(dict(
            metric="fastq_roundtrip_MBps",
            value=round(fq_mb / (tqc + tqd), 2),
            vs_baseline=round((fq_mb / (tqc + tqd)) / (fq_mb / (rqc + rqd)), 3),
            our_s=[round(tqc, 3), round(tqd, 3)],
            ref_s=[round(rqc, 3), round(rqd, 3)])), file=sys.stderr)
    else:
        t_c, blob = _best(compress)
        t_d, out = _best(decompress)
        ours = mb / (t_c + t_d)

    line = {
        "metric": "fasta_roundtrip_MBps",
        "value": round(ours, 2),
        "unit": "MB/s",
        "vs_baseline": round(vs, 3),
    }
    if not os.environ.get("NAF_BENCH_NO_DEVICE"):
        line.update(bench_device_kernels())
    print(json.dumps(line))


if __name__ == "__main__":
    main()
