"""Mesh construction helpers for the block-parallel pipeline."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.jaxenv import setup_jax

setup_jax()   # persistent compile cache (remote TPU compiles are expensive)

BLOCK_AXIS = "blocks"


def block_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over devices; the single axis carries block data parallelism.

    Sequence parallelism (one giant sequence split across chips) rides the
    same axis: blocks are byte ranges, and the carry algebra (nibble parity,
    mask-run state, line-length max) stitches their boundaries, so a single
    record spanning many blocks works identically.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BLOCK_AXIS,))


def block_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BLOCK_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
