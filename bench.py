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


REPS = int(os.environ.get("NAF_BENCH_REPS", "5"))


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


def time_reference(data: bytes) -> tuple[float, float, int]:
    env = dict(os.environ, TMPDIR="/tmp")
    t_c, p = _best(lambda: subprocess.run(
        [str(REF_BUILD / "ennaf"), f"-{LEVEL}", "-c"],
        input=data, capture_output=True, env=env))
    archive = p.stdout
    t_d, q = _best(lambda: subprocess.run(
        [str(REF_BUILD / "unnaf"), "-c"],
        input=archive, capture_output=True, env=env))
    assert q.returncode == 0
    return t_c, t_d, len(archive)


def main() -> None:
    from naf_tpu.pipeline.decoder import Decoder, DecodeOptions
    from naf_tpu.pipeline.encoder import EncodeOptions

    data = gen_fasta(SIZE_MB)
    mb = len(data) / (1 << 20)
    opts = EncodeOptions(level=LEVEL, threads=os.cpu_count() or 0)

    from naf_tpu.pipeline.encoder import encode

    def compress():
        return encode(data, opts)[0]

    def decompress():
        return Decoder(io.BytesIO(blob), DecodeOptions()).fasta()

    blob = compress()    # warm-up (page cache, lazy inits)
    t_c, blob = _best(compress)
    decompress()
    t_d, out = _best(decompress)

    ours = mb / (t_c + t_d)

    vs = 0.0
    if build_reference():
        # correctness gate: reference decodes our archive to our own output
        q = subprocess.run([str(REF_BUILD / "unnaf"), "-c"], input=blob,
                           capture_output=True, env=dict(os.environ, TMPDIR="/tmp"))
        assert q.returncode == 0 and q.stdout == out, "round-trip mismatch vs reference"
        rc, rd, ref_size = time_reference(data)
        ref = mb / (rc + rd)
        vs = ours / ref
        extra = dict(our_compress_s=round(t_c, 3), our_decompress_s=round(t_d, 3),
                     ref_compress_s=round(rc, 3), ref_decompress_s=round(rd, 3),
                     our_archive_bytes=len(blob), ref_archive_bytes=ref_size)
        print(json.dumps(extra), file=sys.stderr)

        # secondary metric (BASELINE.md config 3): FASTQ round trip
        fq = gen_fastq(int(os.environ.get("NAF_BENCH_FASTQ_READS", "250000")))
        fq_mb = len(fq) / (1 << 20)

        def fq_compress():
            return encode(fq, opts)[0]

        fq_blob = fq_compress()
        tqc, fq_blob = _best(fq_compress)
        tqd, fq_out = _best(
            lambda: Decoder(io.BytesIO(fq_blob), DecodeOptions()).fastq())
        env = dict(os.environ, TMPDIR="/tmp")
        rqc, p = _best(lambda: subprocess.run(
            [str(REF_BUILD / "ennaf"), f"-{LEVEL}", "--fastq", "-c"],
            input=fq, capture_output=True, env=env))
        rqd, q = _best(lambda: subprocess.run(
            [str(REF_BUILD / "unnaf"), "-c"], input=p.stdout,
            capture_output=True, env=env))
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

    print(json.dumps({
        "metric": "fasta_roundtrip_MBps",
        "value": round(ours, 2),
        "unit": "MB/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
