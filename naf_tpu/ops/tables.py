"""Device-resident lookup tables (jnp constants lifted from format.constants)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..format import constants as C

# 256-entry tables (device code never sees the EOF pseudo-byte).
NUC_CODE = jnp.asarray(C.NUC_CODE[:256], dtype=jnp.uint8)
CODE_TO_NUC_DNA = jnp.asarray(C.CODE_TO_NUC_DNA, dtype=jnp.uint8)
CODE_TO_NUC_RNA = jnp.asarray(C.CODE_TO_NUC_RNA, dtype=jnp.uint8)
TOUPPER = jnp.asarray(C.TOUPPER, dtype=jnp.uint8)

IS_EOL = jnp.asarray(C.IS_EOL[:256])
IS_SPACE = jnp.asarray(C.IS_SPACE[:256])

UNEXPECTED_BY_TYPE = {
    t: jnp.asarray(tab[:256]) for t, tab in C.UNEXPECTED_BY_TYPE.items()
}
IS_UNEXPECTED_COMMENT = jnp.asarray(C.IS_UNEXPECTED_COMMENT[:256])
IS_UNEXPECTED_TEXT = jnp.asarray(C.IS_UNEXPECTED_TEXT[:256])
IS_UNEXPECTED_QUAL = jnp.asarray(C.IS_UNEXPECTED_QUAL[:256])


def np_lut(lut: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Host-side LUT application (numpy), for the reference/CPU paths."""
    return lut[idx]
