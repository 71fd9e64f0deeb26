"""Sequence-case mask: RLE extraction (encode) and expansion (decode).

Reference semantics (ennaf/src/encoders.c:98-146, unnaf/src/output.c:295-322):
  * a byte is "masked" iff its value >= 96 (lowercase ASCII range and above);
  * the mask section is a u8 run-length stream alternating unmasked/masked,
    starting unmasked (a leading masked region emits a 0-length first run);
  * runs >= 255 split into 255-prefixed units whose sum is the run length —
    crucially a 255 unit does NOT flip the state (decoder: output.c:315).

Encode-side run extraction is a segmented-scan problem; the per-byte
``is_masked`` test runs on device alongside packing, while run finalization
(tiny, control-plane) runs on host.  Decode-side expansion is a searchsorted
gather, provided in both numpy and jnp forms.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..utils.lazy import LazyModule, lazy_jit

jax = LazyModule("jax")
jnp = LazyModule("jax.numpy")

MASK_THRESHOLD = 96


@dataclass
class MaskEncoder:
    """Streaming RLE state across blocks (the carry algebra for SP stitching)."""
    mask_on: bool = False
    run_len: int = 0
    units: list = field(default_factory=list)  # list of np.uint8 arrays

    def update(self, seq_bytes: np.ndarray) -> None:
        if seq_bytes.size == 0:
            return
        lower = seq_bytes >= MASK_THRESHOLD
        # boundaries of state changes within the block
        change = np.flatnonzero(lower[1:] != lower[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [lower.size]])
        run_lengths = (ends - starts).astype(np.uint64)
        first_state = bool(lower[0])

        if first_state == self.mask_on:
            # first run continues the carried run
            self.run_len += int(run_lengths[0])
            if run_lengths.size == 1:
                return
            self._emit_run(self.run_len)
            run_lengths = run_lengths[1:]
        else:
            self._emit_run(self.run_len)
        # all but the last run are complete
        for rl in run_lengths[:-1].tolist():
            self._emit_run(int(rl))
        self.mask_on = bool(lower[-1])
        self.run_len = int(run_lengths[-1])

    def _emit_run(self, length: int) -> None:
        self.units.append(encode_run(length))

    def finish(self) -> np.ndarray:
        """Flush pending run (ennaf.c:511) and return the unit stream."""
        if self.run_len > 0:
            self._emit_run(self.run_len)
            self.run_len = 0
        if not self.units:
            return np.zeros(0, dtype=np.uint8)
        return np.concatenate(self.units)


def encode_run(length: int) -> np.ndarray:
    """One run length -> 255-continuation u8 units (encoders.c:107-117)."""
    n_full, rem = divmod(length, 255)
    out = np.full(n_full + 1, 255, dtype=np.uint8)
    out[-1] = rem
    return out


def mask_units_from_bytes(seq_bytes: np.ndarray) -> np.ndarray:
    """One-shot unit stream for a complete sequence stream."""
    enc = MaskEncoder()
    enc.update(np.ascontiguousarray(seq_bytes, dtype=np.uint8))
    return enc.finish()


# ---------------------------------------------------------------------------
# Decode side
# ---------------------------------------------------------------------------

def merge_units(units: np.ndarray) -> np.ndarray:
    """u8 unit stream -> array of actual run lengths (u64), 255s merged.

    A unit terminates its run iff it is != 255 (output.c:315).
    """
    units = np.ascontiguousarray(units, dtype=np.uint8)
    if units.size == 0:
        return np.zeros(0, dtype=np.uint64)
    u = units.astype(np.uint64)
    terminal = units != 255
    csum = np.concatenate([np.zeros(1, np.uint64), np.cumsum(u)])
    term_idx = np.flatnonzero(terminal)
    ends = csum[term_idx + 1]
    starts = np.concatenate([np.zeros(1, np.uint64), ends[:-1]])
    out = ends - starts
    # trailing 255s with no terminator form a final (malformed) run; the
    # reference would read past the buffer — we clamp instead.
    if term_idx.size == 0 or term_idx[-1] != units.size - 1:
        tail_start = ends[-1] if term_idx.size else 0
        out = np.concatenate([out, np.asarray([csum[-1] - tail_start], np.uint64)])
    return out


def expand_mask_np(run_lengths: np.ndarray, total: int) -> np.ndarray:
    """Run lengths (starting unmasked) -> bool[total] is-masked."""
    rl = np.asarray(run_lengths, dtype=np.int64)
    states = (np.arange(rl.size) % 2).astype(bool)
    expanded = np.repeat(states, rl)
    if expanded.size < total:
        pad_state = not states[-1] if rl.size else False
        # runs exhausted: reference keeps reading garbage; we extend last state
        expanded = np.concatenate(
            [expanded, np.full(total - expanded.size, expanded[-1] if expanded.size else False)]
        )
    return expanded[:total]


@lazy_jit(static_argnames=("total",))
def expand_mask_jnp(run_ends: jnp.ndarray, total: int) -> jnp.ndarray:
    """Device variant: run_ends = cumsum of run lengths; returns bool[total].

    Position p is masked iff searchsorted(run_ends, p, 'right') is odd.
    """
    pos = jnp.arange(total, dtype=run_ends.dtype)
    run_idx = jnp.searchsorted(run_ends, pos, side="right")
    return (run_idx % 2) == 1


def apply_mask_np(seq_upper: np.ndarray, is_masked: np.ndarray) -> np.ndarray:
    """Add 32 inside masked regions (output.c:309)."""
    return (seq_upper + np.where(is_masked, 32, 0).astype(np.uint8)).astype(np.uint8)


@lazy_jit
def apply_mask_jnp(seq_upper: jnp.ndarray, is_masked: jnp.ndarray) -> jnp.ndarray:
    return seq_upper + jnp.where(is_masked, jnp.uint8(32), jnp.uint8(0))


def runs_to_units(runs: np.ndarray) -> np.ndarray:
    """Vectorized run lengths -> u8 unit stream (255-continuation).

    Each run of length L emits floor(L/255) 255-units and one (L%255) unit
    (parity: ennaf/src/encoders.c:98-123).
    """
    runs = np.asarray(runs, dtype=np.int64)
    if runs.size == 0:
        return np.zeros(0, np.uint8)
    n255 = runs // 255
    total = int(n255.sum()) + runs.size
    out = np.full(total, 255, np.uint8)
    ends = np.cumsum(n255 + 1) - 1
    out[ends] = (runs % 255).astype(np.uint8)
    return out
