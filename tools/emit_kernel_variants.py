#!/usr/bin/env python3
"""Stage-isolation microbench for the fused emit kernel.

Compiles ops.emit_fused's kernel with stage early-outs (classify / scans /
dense / full) to locate the slow phase.  Run with --aot first (chipless
v5e compile into the persistent cache), then without arguments on the real
chip (pure cache loads — never cold-compile through the tunnel).
"""

from __future__ import annotations

import sys
import time

import numpy as np

AOT = "--aot" in sys.argv

import os

if AOT:
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax

if AOT:
    jax.config.update("jax_platforms", "cpu")

from naf_tpu.utils.jaxenv import setup_jax

setup_jax()
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from naf_tpu.ops import emit_fused as E

_ROWS = E._ROWS
_LANES = 128
_TILE = _ROWS * _LANES

STAGES = ["classify", "scans", "dense", "full"]


def build(stage):
    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((8, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((E._CS_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    def fn(x):
        B = x.shape[0]
        g = B // _TILE
        x2 = x.reshape(g * _ROWS, _LANES)
        scalars = jnp.stack([jnp.int32(2), jnp.int32(1)])   # in-seq, prev EOL
        outs = pl.pallas_call(
            E._make_emit_kernel(0, stage),
            grid=(g,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
            out_shape=(
                jax.ShapeDtypeStruct((g * _ROWS, _LANES), jnp.uint8),
                jax.ShapeDtypeStruct((g * 8, _LANES), jnp.int32),
                jax.ShapeDtypeStruct((g * E._CS_ROWS, _LANES), jnp.int32),
                jax.ShapeDtypeStruct((g * E._CS_ROWS, _LANES), jnp.int32)),
            out_specs=(spec, cspec, sspec, sspec),
            scratch_shapes=[pltpu.VMEM((_ROWS, _LANES), jnp.uint8),
                            pltpu.VMEM((_ROWS, _LANES), jnp.uint8),
                            pltpu.SMEM((2,), jnp.int32),
                            pltpu.SMEM((E._NCARRY,), jnp.int32)],
        )(scalars, x2)
        return outs[0][:1, :1]

    return jax.jit(fn)


def main():
    n = 1 << 24
    if AOT:
        from jax.experimental import topologies
        from jax.sharding import NamedSharding, PartitionSpec as P

        topo = topologies.get_topology_desc(
            "v5e:1x1x1", "tpu", chips_per_host_bounds=(1, 1, 1))
        mesh = topologies.make_mesh(topo, (1,), ("x",))
        sh = NamedSharding(mesh, P())
        for st in STAGES:
            t0 = time.time()
            build(st).lower(jax.ShapeDtypeStruct((n,), jnp.uint8,
                                                 sharding=sh)).compile()
            print(f"  {st}: compiled {time.time() - t0:.1f}s")
        return
    import sys as _s

    _s.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import gen_fasta

    data = gen_fasta(16)
    x = jnp.asarray(np.frombuffer(data, np.uint8)[22:22 + n])
    for st in STAGES:
        f = build(st)
        np.asarray(f(x))
        ts = []
        for _ in range(4):
            t0 = time.time()
            np.asarray(f(x))
            ts.append(time.time() - t0)
        dt = min(ts)
        print(f"  {st}: {dt * 1e3:.1f} ms -> {n / dt / 1e9:.2f} GB/s")


if __name__ == "__main__":
    main()
