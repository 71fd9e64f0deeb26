"""Pallas stream-compaction kernel (ops/compact.py) — interpret-mode oracle.

The kernel is the TPU emit pass's compaction engine (parallel/block.py uses
it whenever the mesh is a TPU); on CPU CI it runs through the Pallas
interpreter against the numpy oracle.  Real-chip execution is covered by
tests/test_real_tpu.py and the bench's device_pipeline row.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module", autouse=True)
def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def _check(v, k):
    from naf_tpu.ops.compact import compact_u8_pallas

    out, cnt = compact_u8_pallas(v, k, interpret=True)
    want = v[k]
    got = np.asarray(out)
    assert int(cnt) == want.size
    assert np.array_equal(got[: want.size], want)
    assert not got[want.size:].any(), "garbage beyond count"


@pytest.mark.parametrize("n,p_keep", [
    (32768, 0.99),     # one full tile, dense (the DNA regime)
    (70000, 0.986),    # ragged multi-tile
    (131072, 0.5),
    (40000, 0.01),     # sparse (id/comment regime)
    (32768, 1.0),      # keep-all (flush every row; last-row OOB guard)
    (33000, 0.0),      # drop-all
    (1, 1.0),
    (130, 0.7),
])
def test_compact_cases(n, p_keep):
    rng = np.random.default_rng(hash((n, int(p_keep * 100))) % 2**31)
    v = rng.integers(0, 256, n, dtype=np.uint8)
    k = rng.random(n) < p_keep
    _check(v, k)


def test_compact_fuzz():
    rng = np.random.default_rng(7)
    for _ in range(10):
        n = int(rng.integers(1, 150000))
        p = float(rng.random())
        v = rng.integers(0, 256, n, dtype=np.uint8)
        k = rng.random(n) < p
        _check(v, k)


def test_compact_structured_masks():
    """Newline-grid masks (the actual seq-stream pattern) and block masks."""
    rng = np.random.default_rng(8)
    n = 100_000
    v = rng.integers(0, 256, n, dtype=np.uint8)
    k = np.ones(n, bool)
    k[70::71] = False              # 70-char FASTA lines
    _check(v, k)
    k2 = np.zeros(n, bool)
    k2[5_000:25_000] = True        # one dense kept span (header regime)
    _check(v, k2)


def test_compact_int32_values():
    """Position compaction (record bounds) uses i32 values."""
    from naf_tpu.ops.compact import compact_u8_pallas

    rng = np.random.default_rng(9)
    n = 50_000
    v = np.arange(n, dtype=np.int32) * 3
    k = rng.random(n) < 0.003      # sparse markers
    out, cnt = compact_u8_pallas(v, k, interpret=True)
    want = v[k]
    assert int(cnt) == want.size
    assert np.array_equal(np.asarray(out)[: want.size], want)


def test_compact_matches_scan_compact():
    """Same contract as ops.scan.compact (the sort formulation)."""
    from naf_tpu.ops import scan as S
    from naf_tpu.ops.compact import compact_u8_pallas

    rng = np.random.default_rng(10)
    n = 40_000
    v = rng.integers(0, 256, n, dtype=np.uint8)
    k = rng.random(n) < 0.9
    a_out, a_cnt = compact_u8_pallas(v, k, interpret=True)
    b_out, b_cnt = S.compact(k, v)
    assert int(a_cnt) == int(b_cnt)
    assert np.array_equal(np.asarray(a_out), np.asarray(b_out))


# ---------------------------------------------------------------------------
# Dense-path (candidate-merge) kernel
# ---------------------------------------------------------------------------

def test_dense_compact_matches_numpy():
    import jax.numpy as jnp

    from naf_tpu.ops.compact import compact_u8_dense

    rng = np.random.default_rng(3)
    for dens in (1.0, 0.99, 0.985, 0.9, 0.5, 0.05):
        n = int(rng.integers(100, 3 * 128 * 128))
        keep = rng.random(n) < dens
        vals = rng.integers(0, 256, n, dtype=np.uint8)
        out, cnt = compact_u8_dense(jnp.asarray(vals), jnp.asarray(keep),
                                    interpret=True)
        want = vals[keep]
        assert int(cnt) == want.size, dens
        assert np.array_equal(np.asarray(out)[:want.size], want), dens
        assert not np.any(np.asarray(out)[want.size:]), dens


def test_dense_compact_fasta_grid_and_hole_clusters():
    import jax.numpy as jnp

    from naf_tpu.ops.compact import compact_u8_dense

    rng = np.random.default_rng(4)
    pat = np.ones(71, bool)
    pat[70] = False                       # FASTA 70-char lines
    keep = np.tile(pat, 2000)
    # one dense hole cluster that trips the K-candidate window in its tile
    keep[40_000:41_000] = False
    vals = rng.integers(0, 256, keep.size, dtype=np.uint8)
    out, cnt = compact_u8_dense(jnp.asarray(vals), jnp.asarray(keep),
                                interpret=True)
    want = vals[keep]
    assert int(cnt) == want.size
    assert np.array_equal(np.asarray(out)[:want.size], want)
