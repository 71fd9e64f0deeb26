"""4-bit nucleotide packing — the encoder's hottest per-byte transform.

Reference behavior: ennaf/src/encoders.c:30-69 — each sequence byte maps to a
4-bit IUPAC code via a LUT; two codes pack into one byte, low nibble first;
odd-length streams carry a parity nibble across calls.

TPU design: the byte stream is reshaped to 2-D tiles and processed on the VPU.
The ASCII->code mapping is computed *arithmetically* (a chain of 16 compares
on the case-folded byte) instead of a gather, which keeps the whole kernel in
vector registers — no VMEM-indexed loads.  A plain-XLA path provides the CPU
fallback and the correctness oracle.
"""

from __future__ import annotations

import numpy as np

from ..utils.lazy import LazyModule, lazy_jit

jax = LazyModule("jax")
jnp = LazyModule("jax.numpy")
pl = LazyModule("jax.experimental.pallas")
pltpu = LazyModule("jax.experimental.pallas.tpu")

from ..format import constants as C
from . import tables as T

# (char, code) pairs for the arithmetic LUT; case-folded with & 0xDF.
_PAIRS = tuple(
    (ch, code)
    for code, ch in enumerate(C.CODE_TO_NUC_DNA.tobytes().decode("ascii"))
    if ch != "-" and ch != "N"
) + ((chr(ord("U")), 1),)


def _nuc_code_arith(x: jnp.ndarray) -> jnp.ndarray:
    """ASCII bytes -> 4-bit codes without a gather (VPU-friendly).

    Compute happens in int32: the VPU's lanes are 32-bit, and Mosaic has no
    8-bit vector compare; u8 stays only at the memory boundary.
    """
    xi = x.astype(jnp.int32)
    y = xi & 0xDF  # fold case (letters only; non-letters can't collide w/ A-Z)
    code = jnp.full_like(xi, 15)
    for ch, cd in _PAIRS:
        code = jnp.where(y == ord(ch), cd, code)
    code = jnp.where(xi == ord("-"), 0, code)
    return code


def _pack_pairs(codes: jnp.ndarray) -> jnp.ndarray:
    """u8[..., 2*m] 4-bit codes -> u8[..., m]; low nibble first."""
    lo = codes[..., 0::2]
    hi = codes[..., 1::2]
    return lo | (hi << 4)


# ---------------------------------------------------------------------------
# XLA path (CPU fallback + oracle)
# ---------------------------------------------------------------------------

@lazy_jit
def pack_4bit_xla(seq: jnp.ndarray) -> jnp.ndarray:
    """seq: u8[N] ASCII (N even) -> u8[N/2] packed codes."""
    codes = jnp.take(T.NUC_CODE, seq.astype(jnp.int32))
    return _pack_pairs(codes)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

_LANES = 128
_SUBLANES = 32          # uint8 min tile is (32, 128)
_COLS = 2 * _LANES      # input cols per tile row


def _pack_kernel(even_ref, odd_ref, out_ref):
    lo = _nuc_code_arith(even_ref[:])    # (rows, 128) i32
    hi = _nuc_code_arith(odd_ref[:])
    out_ref[:] = (lo | (hi << 4)).astype(jnp.uint8)


@lazy_jit(static_argnames=("interpret",))
def pack_4bit_pallas(seq: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """seq: u8[N] ASCII with N % 256 == 0 -> u8[N/2].

    Caller pads to a multiple of 256 (pad bytes pack to garbage nibbles that
    the caller slices off).  The even/odd de-interleave is a LANE-strided
    slice on a (rows, 256) view — measured ~20x faster on v5e than either a
    1-D stride-2 slice or a (rows, 128, 2) bitcast view, both of which force
    a minor-dim relayout; the per-byte transform runs in the Pallas kernel.
    """
    n = seq.shape[0]
    assert n % _COLS == 0, n
    rows = n // _COLS
    x2 = seq.reshape(rows, _COLS)        # free: row-major compatible
    even = x2[:, 0::2]
    odd = x2[:, 1::2]
    block_rows = min(rows, 2048)
    grid = (pl.cdiv(rows, block_rows),)
    spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _pack_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.uint8),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(even, odd)
    return out.reshape(rows * _LANES)


# ---------------------------------------------------------------------------
# Public entry: pick the best available path
# ---------------------------------------------------------------------------

#: below this many bytes the host numpy path wins.  Default is high because
#: the current TPU attachment is a remote tunnel (~36 MB/s host<->device), so
#: host-resident streams pack faster in numpy; the device path is for data
#: already on device (sharded pipeline).  Override with NAF_TPU_DEVICE_THRESHOLD.
DEVICE_THRESHOLD = int(__import__("os").environ.get("NAF_TPU_DEVICE_THRESHOLD", 1 << 34))


def default_backend(n: int | None = None) -> str:
    if n is not None and n < DEVICE_THRESHOLD:
        return "numpy"
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def bucket_size(n: int, align: int) -> int:
    """Round n up to a power-of-two multiple of `align` (min one tile).

    Bounds the number of distinct jit shapes (and thus TPU compilations) to
    O(log n) across a run; callers slice the padded tail off.
    """
    m = align
    while m < n:
        m *= 2
    return m


def pack_4bit(seq_np: np.ndarray, parity_nibble: int | None = None,
              backend: str | None = None) -> tuple[np.ndarray, int | None]:
    """Host wrapper: pack an ASCII uint8 array into 4-bit codes.

    `parity_nibble` is the pending low nibble (a 4-bit code) carried from the
    previous block, or None.  Returns (packed bytes, new carry nibble or None).
    Parity semantics mirror ennaf/src/encoders.c:40-68.
    """
    seq_np = np.ascontiguousarray(seq_np, dtype=np.uint8)
    backend = backend or default_backend(seq_np.size)
    prefix = b""
    if parity_nibble is not None:
        if seq_np.size == 0:
            return np.frombuffer(b"", dtype=np.uint8), parity_nibble
        first_code = int(C.NUC_CODE[seq_np[0]])
        prefix = bytes((parity_nibble | (first_code << 4),))
        seq_np = seq_np[1:]

    n = seq_np.size
    carry: int | None = None
    if n % 2 == 1:
        carry = int(C.NUC_CODE[seq_np[-1]])
        seq_np = seq_np[:-1]
        n -= 1

    if n == 0:
        packed = np.frombuffer(prefix, dtype=np.uint8).copy()
        return packed, carry

    if backend == "pallas":
        padded = np.pad(seq_np, (0, bucket_size(n, _COLS) - n))
        out = np.asarray(pack_4bit_pallas(jnp.asarray(padded)))[: n // 2]
    elif backend == "numpy":
        codes = C.NUC_CODE[:256][seq_np]
        out = codes[0::2] | (codes[1::2] << 4)
    else:
        padded = np.pad(seq_np, (0, bucket_size(n, 2) - n))
        out = np.asarray(pack_4bit_xla(jnp.asarray(padded)))[: n // 2]
    if prefix:
        out = np.concatenate([np.frombuffer(prefix, dtype=np.uint8), out])
    return out, carry
