"""Device lookup tables (lifted from format.constants).

These are plain numpy constants: jnp consumers (``jnp.take``, gathers inside
jit) embed them as compile-time constants, exactly as device-resident jnp
module constants would be — but importing this module never imports jax, and
a first touch from inside a jit trace cannot capture a tracer.
"""

from __future__ import annotations

import numpy as np

from ..format import constants as C

NUC_CODE = np.asarray(C.NUC_CODE[:256], dtype=np.uint8)
CODE_TO_NUC_DNA = np.asarray(C.CODE_TO_NUC_DNA, dtype=np.uint8)
CODE_TO_NUC_RNA = np.asarray(C.CODE_TO_NUC_RNA, dtype=np.uint8)
TOUPPER = np.asarray(C.TOUPPER, dtype=np.uint8)

IS_EOL = np.asarray(C.IS_EOL[:256])
IS_SPACE = np.asarray(C.IS_SPACE[:256])

UNEXPECTED_BY_TYPE = {
    t: np.asarray(tab[:256]) for t, tab in C.UNEXPECTED_BY_TYPE.items()
}
IS_UNEXPECTED_COMMENT = np.asarray(C.IS_UNEXPECTED_COMMENT[:256])
IS_UNEXPECTED_TEXT = np.asarray(C.IS_UNEXPECTED_TEXT[:256])
IS_UNEXPECTED_QUAL = np.asarray(C.IS_UNEXPECTED_QUAL[:256])


def np_lut(lut: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Host-side LUT application (numpy), for the reference/CPU paths."""
    return lut[idx]
