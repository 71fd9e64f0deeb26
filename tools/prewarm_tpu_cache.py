#!/usr/bin/env python3
"""Pre-warm the persistent JAX compile cache for TPU kernels — chipless.

Compiles the bench/production kernel shapes ahead-of-time against a local
v5e topology description (libtpu's AOT compiler; no chip, no tunnel) with
the persistent compilation cache enabled.  A later run on the real chip
then *loads* the cached executable instead of paying the remote compile —
the axon tunnel's compile helper is both slow and a shared resource, so
every compile moved here is latency (and a wedge risk) removed from the
driver's benchmark run.

Usage:  python tools/prewarm_tpu_cache.py [--e2e]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def source_hash() -> str:
    """md5 over every source the compiled shapes depend on (same list the
    e2e meta cache uses)."""
    import hashlib
    import os
    from pathlib import Path

    repo = Path(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    h = hashlib.md5()
    for f in ("naf_tpu/parallel/block.py", "naf_tpu/parallel/pipeline.py",
              "naf_tpu/parallel/decode.py", "naf_tpu/ops/scan.py",
              "naf_tpu/ops/scan_fused.py", "naf_tpu/ops/compact.py",
              "naf_tpu/ops/pack.py", "naf_tpu/ops/emit_fused.py",
              "bench.py", "tools/prewarm_tpu_cache.py"):
        h.update((repo / f).read_bytes())
    return h.hexdigest()


def _marker_path():
    import os
    from pathlib import Path

    return Path(os.path.expanduser(os.environ.get(
        "NAF_TPU_JAX_CACHE", "~/.cache/naf_tpu_jax"))) / "prewarm_ok"


def main() -> int:
    # marker fast path: a full prewarm against the CURRENT sources already
    # succeeded into this cache — the AOT compiles themselves are NOT
    # cache-loadable on this build (each run recompiles ~3.5 min), so the
    # marker is what makes the bench's budgeted prewarm subprocess cheap
    if "--force" not in sys.argv:
        try:
            if _marker_path().read_text().strip() == source_hash():
                print("prewarm current (marker matches source hash)")
                return 0
        except Exception:
            pass

    import jax

    jax.config.update("jax_platforms", "cpu")   # never touch the tunnel
    from naf_tpu.utils.jaxenv import setup_jax

    setup_jax()
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc(
        "v5e:1x1x1", "tpu", chips_per_host_bounds=(1, 1, 1))
    mesh = topologies.make_mesh(topo, (1,), ("x",))
    sh = NamedSharding(mesh, P())

    def compile_one(label, fn, *avals):
        t0 = time.time()
        try:
            jax.jit(fn).lower(*avals).compile()
            print(f"  {label}: {time.time() - t0:.1f}s")
        except Exception as e:
            print(f"  {label}: FAILED {type(e).__name__}: {str(e)[:90]}")

    u8 = jnp.uint8

    def aval(shape, dtype=u8):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sh)

    # ---- bench_device_kernels (bench.py) — exact loop bodies/shapes -------
    from naf_tpu.ops.pack import pack_4bit_pallas
    from naf_tpu.ops.unpack import unpack_4bit_pallas_u16
    from naf_tpu.ops import scan as S

    import os

    n = 1 << int(os.environ.get("NAF_BENCH_DEVICE_LOG2", "25"))
    K = 32
    KS = 32

    def pack_loop(x):
        def body(i, acc):
            return pack_4bit_pallas(x ^ jnp.tile(acc, 2))
        return jax.lax.fori_loop(0, K, body, jnp.zeros(n // 2, jnp.uint8))

    def unpack_loop(p0):
        def body(i, acc):
            return unpack_4bit_pallas_u16(p0 ^ (acc & 0xFF).astype(jnp.uint8))
        return jax.lax.fori_loop(0, K, body, jnp.zeros(n // 2, jnp.uint16))

    from naf_tpu.ops.scan_fused import classify_fasta_fused

    def scan_loop(x0):
        # O(1) loop glue: prev (the carried scalar) feeds the next call, so
        # iterations serialize without any n-sized xor/reduce pass that
        # would bill HBM traffic to the kernel being measured
        def body(i, carry):
            acc, prev = carry
            flags, sval = classify_fasta_fused(x0, prev, False, seq_type=0)
            return acc ^ flags[0], sval[0]
        return jax.lax.fori_loop(
            0, KS, body, (jnp.uint8(0), jnp.uint8(ord(">"))))

    print(f"bench device kernels (n={n}):")
    compile_one("pack_loop", pack_loop, aval((n,)))
    compile_one("unpack_loop", unpack_loop, aval((n // 2,)))
    compile_one("scan_loop", scan_loop, aval((n,)))

    # ---- raw per-block kernels at bucketed production sizes ---------------
    print("scan blocks:")
    from naf_tpu.ops.scan_fused import classify_fastq_fused

    for log2 in (20, 22, 24, 25):
        compile_one(
            f"classify_fused 2^{log2}",
            lambda x0: classify_fasta_fused(x0, jnp.uint8(ord(">")), False,
                                            seq_type=0),
            aval((1 << log2,)))
    for log2 in (22, 24, 25):
        compile_one(
            f"classify_fastq_fused 2^{log2}",
            lambda x0: classify_fastq_fused(x0, jnp.uint8(ord("@")),
                                            seq_type=0),
            aval((1 << log2,)))
    for log2 in (20, 22, 24, 25, 26):
        compile_one(
            f"scan_fasta 2^{log2}",
            lambda x0: S.scan_fasta_block(x0, jnp.uint8(ord(">"))),
            aval((1 << log2,)))
    for log2 in (22, 24, 25):
        compile_one(
            f"scan_fastq 2^{log2}",
            lambda x0: S.scan_fastq_block(x0, jnp.uint8(ord("@"))),
            aval((1 << log2,)))

    if "--e2e" in sys.argv:
        prewarm_e2e(topo)
        try:
            mp = _marker_path()
            mp.parent.mkdir(parents=True, exist_ok=True)
            mp.write_text(source_hash())
        except Exception:
            pass
    return 0


def prewarm_e2e(topo) -> None:
    """AOT-compile the bench's end-to-end encode_sharded passes.

    The stats/emit shard_map HLOs depend on the exact bench input shapes
    and the runtime-derived emit capacities; a CPU trial run reproduces the
    caps, then both passes compile against the TPU topology so the real
    chip run is a pure cache load.
    """
    import os
    import time

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import gen_fasta
    from naf_tpu.parallel import pipeline as PL
    from naf_tpu.parallel.block import (BLOCK_AXIS, make_blocks,
                                        emit_blocks_packed,
                                        stats_blocks_packed,
                                        stats_blocks_sharded, unpack_stats)
    from naf_tpu.pipeline import parser as PP

    mb = int(os.environ.get("NAF_BENCH_DEVICE_E2E_MB", "16"))

    # ---- shape/caps metadata cache: the CPU trial + decode replay cost
    # ~60 s on this 2-core host, which starved the bench child's budget in
    # rehearsal.  Shapes and caps are pure functions of (source, mb), so a
    # source-hashed JSON makes warm reruns pure compile-cache validations.
    import hashlib
    import json
    from pathlib import Path

    repo = Path(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    h = hashlib.md5()
    for f in ("naf_tpu/parallel/block.py", "naf_tpu/parallel/pipeline.py",
              "naf_tpu/parallel/decode.py", "naf_tpu/ops/scan.py",
              "naf_tpu/ops/scan_fused.py", "naf_tpu/ops/compact.py",
              "naf_tpu/ops/pack.py", "naf_tpu/ops/emit_fused.py",
              "bench.py", "tools/prewarm_tpu_cache.py"):
        h.update((repo / f).read_bytes())
    meta_key = f"{mb}:{h.hexdigest()}"
    meta_path = Path(os.path.expanduser("~/.cache/naf_tpu_jax")) /         "prewarm_meta.json"
    meta = None
    try:
        m = json.loads(meta_path.read_text())
        if m.get("key") == meta_key:
            meta = m
    except Exception:
        pass

    cmesh = Mesh(np.asarray(jax.devices("cpu")[:1]), (BLOCK_AXIS,))
    if meta is None:
        data = gen_fasta(mb)
        fmt, marker = PP.detect_format(data)
        body = np.frombuffer(data, np.uint8)[marker + 1:]
        blocks = make_blocks(body, 1)

        # caps via a CPU trial of pass 1 (same math as encode_sharded)
        st_packed, odd_d = stats_blocks_packed(
            jnp.asarray(blocks.data), jnp.asarray(blocks.prev),
            jnp.asarray(blocks.starts_in_seq),
            seq_type=0, fastq=False, mesh=cmesh)
        (counts, odd, id_bytes, com_bytes, qual_bytes, n_rec, n_runs,
         _fl, _lg), _h = unpack_stats(st_packed)
        caps = dict(
            p_cap=PL._bucket(int((counts + 1).max(initial=2) // 2) + 1),
            id_cap=PL._bucket(max(int(id_bytes.max(initial=1)), 1)),
            com_cap=PL._bucket(max(int(com_bytes.max(initial=1)), 1)),
            r_cap=PL._bucket(int(n_rec.max(initial=0)) + 1),
            m_cap=PL._bucket(max(int(n_runs.max(initial=2)), 2)),
            q_cap=16)
        shapes_meta = dict(
            key=meta_key, caps=caps,
            blocks=[list(blocks.data.shape), "uint8"],
            prev=[list(blocks.prev.shape), str(blocks.prev.dtype)],
            sis=[list(blocks.starts_in_seq.shape),
                 str(blocks.starts_in_seq.dtype)],
            odd=[list(np.asarray(odd_d).shape),
                 str(np.asarray(odd_d).dtype)])
    else:
        caps = meta["caps"]
        shapes_meta = meta
    print(f"e2e caps: {caps}")

    tmesh = topologies.make_mesh(topo, (1,), (BLOCK_AXIS,))
    shd = NamedSharding(tmesh, P(BLOCK_AXIS))

    def sds(entry):
        shape, dtype = entry
        return jax.ShapeDtypeStruct(tuple(shape), jnp.dtype(dtype),
                                    sharding=shd)

    a_blocks = sds(shapes_meta["blocks"])
    a_prev = sds(shapes_meta["prev"])
    a_sis = sds(shapes_meta["sis"])
    a_odd = sds(shapes_meta["odd"])
    t0 = time.time()
    stats_blocks_packed.lower(a_blocks, a_prev, a_sis, seq_type=0,
                              fastq=False, mesh=tmesh).compile()
    print(f"  e2e stats pass: {time.time() - t0:.1f}s")
    t0 = time.time()
    emit_blocks_packed.lower(a_blocks, a_prev, a_sis, a_odd, seq_type=0,
                             fastq=False, mesh=tmesh, **caps).compile()
    print(f"  e2e emit pass: {time.time() - t0:.1f}s")

    from naf_tpu.parallel.block import fused_blocks_sharded

    repl_sh = NamedSharding(tmesh, P())
    a_pbase = jax.ShapeDtypeStruct((1,), jnp.int32, sharding=repl_sh)
    t0 = time.time()
    fused_blocks_sharded.lower(a_blocks, a_prev, a_sis, a_pbase, seq_type=0,
                               mesh=tmesh, interpret=False).compile()
    print(f"  e2e fused pass: {time.time() - t0:.1f}s")

    # ---- FASTQ e2e passes (bench device child's last row) ----------------
    from bench import gen_fastq
    from naf_tpu.parallel.block import make_blocks_fastq

    fq_meta = meta.get("fastq") if meta else None
    if fq_meta is None:
        fq = gen_fastq(int(os.environ.get("NAF_BENCH_FASTQ_E2E_READS",
                                          "40000")))
        fqbody = np.frombuffer(fq, np.uint8)[1:]
        mb2 = make_blocks_fastq(fqbody, 1)
        assert mb2 is not None
        fqblocks, _ = mb2
        st2, _odd2 = stats_blocks_packed(
            jnp.asarray(fqblocks.data), jnp.asarray(fqblocks.prev),
            jnp.asarray(fqblocks.starts_in_seq),
            seq_type=0, fastq=True, mesh=cmesh)
        (c2, _o2, i2, m2, q2, n2, r2, _f2, _l2), _h2 = unpack_stats(
            np.asarray(st2))
        fq_caps = dict(
            p_cap=PL._bucket(int((c2 + 1).max(initial=2) // 2) + 1),
            id_cap=PL._bucket(max(int(i2.max(initial=1)), 1)),
            com_cap=PL._bucket(max(int(m2.max(initial=1)), 1)),
            r_cap=PL._bucket(int(n2.max(initial=0)) + 1),
            m_cap=PL._bucket(max(int(r2.max(initial=2)), 2)),
            q_cap=PL._bucket(max(int(q2.max(initial=1)), 1)))
        fq_meta = dict(caps=fq_caps,
                       blocks=[list(fqblocks.data.shape), "uint8"],
                       prev=[list(fqblocks.prev.shape),
                             str(fqblocks.prev.dtype)],
                       sis=[list(fqblocks.starts_in_seq.shape),
                            str(fqblocks.starts_in_seq.dtype)],
                       odd=[list(np.asarray(_odd2).shape),
                            str(np.asarray(_odd2).dtype)])
        shapes_meta["fastq"] = fq_meta
    print(f"fastq e2e caps: {fq_meta['caps']}")
    fa_blocks = sds(fq_meta["blocks"])
    fa_prev = sds(fq_meta["prev"])
    fa_sis = sds(fq_meta["sis"])
    fa_odd = sds(fq_meta["odd"])
    t0 = time.time()
    stats_blocks_packed.lower(fa_blocks, fa_prev, fa_sis, seq_type=0,
                              fastq=True, mesh=tmesh).compile()
    print(f"  fastq stats pass: {time.time() - t0:.1f}s")
    t0 = time.time()
    emit_blocks_packed.lower(fa_blocks, fa_prev, fa_sis, fa_odd, seq_type=0,
                             fastq=True, mesh=tmesh,
                             **fq_meta["caps"]).compile()
    print(f"  fastq emit pass: {time.time() - t0:.1f}s")

    from naf_tpu.parallel.block import fused_blocks_fastq_sharded

    t0 = time.time()
    fused_blocks_fastq_sharded.lower(fa_blocks, fa_prev, a_pbase,
                                     seq_type=0, mesh=tmesh,
                                     interpret=False).compile()
    print(f"  fastq fused pass: {time.time() - t0:.1f}s")

    # ---- device decode (render) buckets: replay on CPU, compile on topo ---
    from naf_tpu.parallel import decode as DD

    if meta is None:
        import io

        from naf_tpu.pipeline.decoder import DecodeOptions, Decoder
        from naf_tpu.pipeline.encoder import EncodeOptions, encode

        blob, _ = encode(data, EncodeOptions(level=1))
        fqblob, _ = encode(gen_fastq(int(os.environ.get(
            "NAF_BENCH_FASTQ_E2E_READS", "40000"))), EncodeOptions(level=1))
        DD._COMPILE_LOG = log = []
        try:
            Decoder(io.BytesIO(blob),
                    DecodeOptions()).fasta_device(mesh=cmesh)
            Decoder(io.BytesIO(fqblob),
                    DecodeOptions()).fastq_device(mesh=cmesh)
        finally:
            DD._COMPILE_LOG = None
        entries = list(dict.fromkeys(log))
        shapes_meta["render"] = [
            [list(key), [[list(s), d] for s, d in shapes]]
            for key, shapes in entries]
        try:
            meta_path.parent.mkdir(parents=True, exist_ok=True)
            meta_path.write_text(json.dumps(shapes_meta))
        except Exception:
            pass
    else:
        entries = [(tuple(key), tuple((tuple(s), d) for s, d in shapes))
                   for key, shapes in meta["render"]]
    shard = NamedSharding(tmesh, P(BLOCK_AXIS))
    repl = NamedSharding(tmesh, P())
    for key, shapes in entries:
        t0 = time.time()
        if key[0] == "prep":
            # regular-path char prep: compile the pallas=True (TPU) variant
            fn = DD._prep_chars_step(*(bool(k) for k in key[1:]), True)
            avals = [jax.ShapeDtypeStruct(tuple(s), jnp.dtype(d),
                                          sharding=repl)
                     for s, d in shapes]
            fn.lower(*avals).compile()
        elif key[0] == "regular":
            fn = DD._regular_group_step(*(int(k) for k in key[1:]))
            avals = [jax.ShapeDtypeStruct(tuple(s), jnp.dtype(d),
                                          sharding=repl)
                     for s, d in shapes]
            sc = jax.ShapeDtypeStruct((), jnp.int32, sharding=repl)
            fn.lower(*avals, sc, sc).compile()
        else:
            avals = [jax.ShapeDtypeStruct(tuple(s), jnp.dtype(d),
                                          sharding=shard if i < 3 else repl)
                     for i, (s, d) in enumerate(shapes)]
            DD._compiled_step(tmesh, *key).lower(*avals).compile()
        print(f"  render bucket {tuple(key)}: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    sys.exit(main())
